"""Round-3 CLI tail batch 11: nnet3 model management
(am-init/adjust-priors/show-progress), chain posteriors via autodiff,
RNNLM embedding dump."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from kaldi_tpu.base import io_funcs as iof
from kaldi_tpu.cli import get_tool
from kaldi_tpu.util import kaldi_io
from kaldi_tpu.util.table import SequentialTableReader, TableWriter

RAW = """<Nnet3>
input-node name=input dim=4
component-node name=aff component=aff input=input
output-node name=output input=aff objective=linear

<NumComponents> 1
<ComponentName> aff <NaturalGradientAffineComponent> <LearningRate> 0.001 <LinearParams>  [
  1 0 0 0
  0 1 0 0
  0 0 1 0 ]
<BiasParams>  [ 0 0 0 ]
<RankIn> 20 <RankOut> 80 <UpdatePeriod> 4 <NumSamplesHistory> 2000 <Alpha> 4 </NaturalGradientAffineComponent>
</Nnet3>
"""


@pytest.fixture()
def tm3(tmp_path):
    from test_hmm_gmm import mono_system
    topo, tree, tm = mono_system()
    kaldi_io.write_kaldi_object(tm.write, f"{tmp_path}/trans.mdl")
    return tm


def test_am_init_and_adjust_priors(tmp_path, tm3):
    raw = tmp_path / "a.raw"
    raw.write_text(RAW.replace("dim=4", "dim=4").replace(
        "<BiasParams>  [ 0 0 0 ]",
        "<BiasParams>  [ " + " ".join(["0"] * tm3.num_pdfs) + " ]")
        .replace("  1 0 0 0\n  0 1 0 0\n  0 0 1 0 ]",
                 "\n".join("  " + " ".join(
                     "1" if j == i % 4 else "0" for j in range(4))
                     for i in range(tm3.num_pdfs)) + " ]"))
    rc = get_tool("nnet3-am-init")([
        "nnet3-am-init", f"{tmp_path}/trans.mdl", str(raw),
        f"{tmp_path}/am.mdl"])
    assert rc == 0
    from kaldi_tpu.nnet3.mdl_io import read_nnet3_am
    tm, graph, info = read_nnet3_am(f"{tmp_path}/am.mdl")
    assert tm.num_pdfs == tm3.num_pdfs
    counts = np.arange(1, tm3.num_pdfs + 1, dtype=np.float64)
    kaldi_io.write_kaldi_object(
        lambda s, b: iof.write_vector(s, b, counts),
        f"{tmp_path}/counts")
    rc = get_tool("nnet3-am-adjust-priors")([
        "nnet3-am-adjust-priors", f"{tmp_path}/am.mdl",
        f"{tmp_path}/counts", f"{tmp_path}/am2.mdl"])
    assert rc == 0
    _tm, _g, info2 = read_nnet3_am(f"{tmp_path}/am2.mdl")
    pri = np.asarray(info2["priors"])
    np.testing.assert_allclose(pri, counts / counts.sum(), atol=1e-6)


def test_show_progress(tmp_path, capsys):
    a = tmp_path / "a.raw"
    a.write_text(RAW)
    b = tmp_path / "b.raw"
    b.write_text(RAW.replace("  1 0 0 0", "  1.5 0 0 0", 1))
    rc = get_tool("nnet3-show-progress")([
        "nnet3-show-progress", str(a), str(b)])
    assert rc == 0
    out = capsys.readouterr().out
    assert "component aff: parameter-change 0.5" in out
    assert "total parameter-change: 0.5" in out


def test_chain_compute_post(tmp_path):
    """Posteriors from the den-graph FB gradient: rows ~ sum to 1."""
    from test_mono_e2e import make_corpus
    from kaldi_tpu.decoder.graph import Lang
    from kaldi_tpu.recipes.chain import make_chain_system
    from kaldi_tpu.recipes.mono import TrainMonoOptions, train_mono
    from kaldi_tpu.feat.frontend import MfccOptions, OfflineFeature
    from kaldi_tpu.feat.window import FrameExtractionOptions
    from test_mono_e2e import FS
    train_txt, train_wav, _, _ = make_corpus(num_train=4, num_test=1)
    comp = OfflineFeature(MfccOptions(
        frame_opts=FrameExtractionOptions(samp_freq=FS, dither=0.0)))
    tf = dict(zip(train_wav, comp.compute_batch(list(train_wav.values()))))
    lang = Lang({"YES": [["Y"]], "NO": [["N"]]}, sil_phone="SIL",
                sil_prob=0.5)
    lang.make_topology()
    sys_ = train_mono(lang, tf, train_txt,
                      TrainMonoOptions(num_iters=2, totgauss=12,
                                       realign_iters=(1,)))
    chain_tm, chain_tree = make_chain_system(lang, sys_.tm)
    kaldi_io.write_kaldi_object(chain_tree.write, f"{tmp_path}/tree")
    kaldi_io.write_kaldi_object(chain_tm.write, f"{tmp_path}/0.mdl")
    # phone LM + den fst via the CLI ladder
    with TableWriter("int-vector", f"ark:{tmp_path}/phones.ark") as w:
        for i, u in enumerate(sorted(tf)):
            # phone sequences straight from the lexicon
            seq = []
            for word in train_txt[u]:
                seq.extend(lang.phones[p]
                           for p in lang.lexicon[word][0])
            w.write(u, np.asarray(seq, np.int32))
    rc = get_tool("chain-est-phone-lm")([
        "chain-est-phone-lm", f"ark:{tmp_path}/phones.ark",
        f"{tmp_path}/phone_lm.fst"])
    assert rc == 0
    rc = get_tool("chain-make-den-fst")([
        "chain-make-den-fst", f"{tmp_path}/tree", f"{tmp_path}/0.mdl",
        f"{tmp_path}/phone_lm.fst", f"{tmp_path}/den.fst",
        f"{tmp_path}/norm.fst"])
    assert rc == 0
    # xconfig model with output dim = num pdfs
    (tmp_path / "net.xconfig").write_text(
        "input name=input dim=13\n"
        f"output-layer name=output dim={chain_tm.num_pdfs} "
        "include-log-softmax=false\n")
    rc = get_tool("nnet3-init")([
        "nnet3-init", f"{tmp_path}/net.xconfig", f"{tmp_path}/mdl0"])
    assert rc == 0
    with TableWriter("matrix", f"ark:{tmp_path}/feats.ark") as w:
        u = sorted(tf)[0]
        w.write(u, tf[u][:30])
    rc = get_tool("nnet3-chain-compute-post")([
        "nnet3-chain-compute-post", f"{tmp_path}/mdl0",
        f"{tmp_path}/den.fst", f"ark:{tmp_path}/feats.ark",
        f"ark:{tmp_path}/post.ark"])
    assert rc == 0
    post = dict(SequentialTableReader("matrix",
                                      f"ark:{tmp_path}/post.ark"))
    p = next(iter(post.values()))
    assert p.shape[1] == chain_tm.num_pdfs
    assert (p >= -1e-5).all()
    np.testing.assert_allclose(p.sum(axis=1), 1.0, atol=0.05)


def test_rnnlm_get_word_embedding(tmp_path):
    with TableWriter("int-vector", f"ark:{tmp_path}/s.ark") as w:
        rng = np.random.default_rng(0)
        for i in range(20):
            w.write(f"s{i}", rng.integers(3, 8, 6).astype(np.int32))
    rc = get_tool("rnnlm-train")([
        "rnnlm-train", "--num-epochs=1", "--embedding-dim=8",
        "--hidden-dim=16", f"ark:{tmp_path}/s.ark",
        f"{tmp_path}/lm.npz"])
    assert rc == 0
    rc = get_tool("rnnlm-get-word-embedding")([
        "rnnlm-get-word-embedding", f"{tmp_path}/lm.npz",
        f"{tmp_path}/emb"])
    assert rc == 0
    emb = np.asarray(kaldi_io.read_kaldi_object(iof.read_matrix,
                                                f"{tmp_path}/emb"))
    assert emb.shape == (8, 8)    # vocab 8 x dim 8
