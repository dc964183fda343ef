"""RNNLM CLI surface (parity: src/rnnlmbin + latbin
lattice-lmrescore-kaldi-rnnlm)."""

import numpy as np
import pytest

from kaldi_tpu.cli import get_tool
from kaldi_tpu.util.table import SequentialTableReader, TableWriter


@pytest.fixture(scope="module")
def rnnlm_env(tmp_path_factory):
    d = tmp_path_factory.mktemp("rnnlm")
    rng = np.random.default_rng(0)
    # a strongly patterned corpus: 3 always followed by 4
    with TableWriter("int-vector", f"ark:{d}/train.ark") as w:
        for i in range(60):
            sent = []
            for _ in range(4):
                sent += [3, 4] if rng.random() < 0.8 else \
                    [int(rng.integers(5, 8))]
            w.write(f"s{i}", np.asarray(sent, np.int32))
    rc = get_tool("rnnlm-train")([
        "rnnlm-train", "--num-epochs=8", "--embedding-dim=16",
        "--hidden-dim=32", f"ark:{d}/train.ark", f"{d}/lm.npz"])
    assert rc == 0
    return str(d)


def test_train_and_sentence_probs(rnnlm_env, capsys):
    d = rnnlm_env
    with TableWriter("int-vector", f"ark:{d}/test.ark") as w:
        w.write("good", np.asarray([3, 4, 3, 4], np.int32))
        w.write("bad", np.asarray([4, 3, 4, 3], np.int32))
    rc = get_tool("rnnlm-sentence-probs")([
        "rnnlm-sentence-probs", f"{d}/lm.npz", f"ark:{d}/test.ark"])
    assert rc == 0
    out = capsys.readouterr().out
    probs = {ln.split()[0]: float(ln.split()[1])
             for ln in out.splitlines() if ln.strip()}
    assert probs["good"] > probs["bad"]
    rc = get_tool("rnnlm-compute-prob")([
        "rnnlm-compute-prob", f"{d}/lm.npz", f"ark:{d}/test.ark"])
    assert rc == 0
    assert "perplexity" in capsys.readouterr().out


def test_sampling_lm(rnnlm_env):
    d = rnnlm_env
    rc = get_tool("rnnlm-get-sampling-lm")([
        "rnnlm-get-sampling-lm", f"ark:{d}/train.ark",
        f"{d}/sampling.npz"])
    assert rc == 0
    data = np.load(f"{d}/sampling.npz")
    uni = data["unigram"]
    assert uni.shape[0] >= 8 and abs(uni.sum() - 1.0) < 1e-6
    # strongly-above-unigram bigrams survive pruning as sparse
    # corrections (e.g. filler->3, which restarts the 3-4 pattern);
    # the deterministic 3->4 continuation carries its whole mass and
    # is represented through the history weight instead
    # rows: [hist (order-1 cols, -1 pad), word, prob]
    sparse = data["sparse"]
    H = int(data["order"]) - 1
    assert sparse.shape[1] == H + 2
    assert len(sparse) > 0
    assert any(int(r[H]) == 3 for r in sparse)
    uw = {tuple(int(x) for x in r[:H]): r[H] for r in data["uweight"]}
    assert all(0.0 <= w <= 1.0 for w in uw.values())


def test_lattice_rnnlm_rescore(rnnlm_env):
    d = rnnlm_env
    from kaldi_tpu.fstext.fst import Arc, LatticeWeight, VectorFst
    from kaldi_tpu.lat.functions import lattice_best_path
    from kaldi_tpu.lat.kaldi_lattice import LatticeHolder

    # two equal-cost paths: [3,4] (in-domain) vs [4,3] (anti-pattern)
    lat = VectorFst(LatticeWeight)
    s0 = lat.add_state()
    lat.set_start(s0)
    a1, a2 = lat.add_state(), lat.add_state()
    b1, b2 = lat.add_state(), lat.add_state()
    lat.add_arc(s0, Arc(1, 3, (0.0, 0.0), a1))
    lat.add_arc(a1, Arc(2, 4, (0.0, 0.0), a2))
    lat.set_final(a2, (0.0, 0.0))
    lat.add_arc(s0, Arc(1, 4, (0.0, 0.0), b1))
    lat.add_arc(b1, Arc(2, 3, (0.0, 0.0), b2))
    lat.set_final(b2, (0.0, 0.0))
    with TableWriter(LatticeHolder(), f"ark:{d}/lat.ark") as w:
        w.write("u1", lat)
    rc = get_tool("lattice-lmrescore-kaldi-rnnlm")([
        "lattice-lmrescore-kaldi-rnnlm", "--lm-scale=1.0",
        f"{d}/lm.npz", f"ark:{d}/lat.ark", f"ark:{d}/out.ark"])
    assert rc == 0
    out = dict(SequentialTableReader(LatticeHolder(),
                                     f"ark:{d}/out.ark"))["u1"]
    _ali, words, cost = lattice_best_path(out)
    assert words == [3, 4]
    assert np.isfinite(cost) and cost > 0
