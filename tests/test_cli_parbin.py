"""Parallel (-parallel) decode/determinize CLI variants: outputs must
match the single-threaded base tools exactly, in input order; plus
phone-pruned determinization semantics."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from kaldi_tpu.cli import get_tool
from kaldi_tpu.lat.kaldi_lattice import LatticeHolder
from kaldi_tpu.util import kaldi_io
from kaldi_tpu.util.table import SequentialTableReader, TableWriter


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    from test_mono_e2e import FS, make_corpus, unigram_g
    from kaldi_tpu.cli.gmm_tools import write_am_gmm
    from kaldi_tpu.feat.frontend import MfccOptions, OfflineFeature
    from kaldi_tpu.feat.window import FrameExtractionOptions
    from kaldi_tpu.fstext.openfst_io import write_fst
    from kaldi_tpu.recipes.mono import (TrainMonoOptions, make_hclg,
                                        train_mono)
    d = tmp_path_factory.mktemp("parbin")
    train_txt, train_wav, test_txt, test_wav = make_corpus(
        num_train=8, num_test=4)
    comp = OfflineFeature(MfccOptions(
        frame_opts=FrameExtractionOptions(samp_freq=FS, dither=0.0)))
    tf = dict(zip(train_wav, comp.compute_batch(list(train_wav.values()))))
    sf = dict(zip(test_wav, comp.compute_batch(list(test_wav.values()))))
    from kaldi_tpu.decoder.graph import Lang
    lang = Lang({"YES": [["Y"]], "NO": [["N"]]}, sil_phone="SIL",
                sil_prob=0.5)
    lang.make_topology()
    sys_ = train_mono(lang, tf, train_txt,
                      TrainMonoOptions(num_iters=4, totgauss=24,
                                       realign_iters=(1, 2, 3)))
    write_am_gmm(f"{d}/final.mdl", sys_.tm, sys_.am)
    with open(f"{d}/HCLG.fst", "wb") as f:
        write_fst(f, make_hclg(sys_, unigram_g(lang)))
    with TableWriter("matrix", f"ark:{d}/test_feats.ark") as w:
        for u in sorted(sf):
            w.write(u, sf[u])
    return dict(d=str(d), sys=sys_, sf=sf, lang=lang,
                test_txt=test_txt)


def _read_lats(path):
    return dict(SequentialTableReader(LatticeHolder(), f"ark:{path}"))


def _lat_fingerprint(lat):
    """Order-insensitive structural fingerprint of a lattice."""
    arcs = sorted((s, a.ilabel, a.olabel, round(a.weight[0], 4),
                   round(a.weight[1], 4), a.nextstate)
                  for s in range(lat.num_states) for a in lat.arcs[s])
    finals = sorted((s, round(w[0], 4)) for s, w in
                    enumerate(lat.finals) if w != lat.semiring.zero)
    return (lat.start, tuple(arcs), tuple(finals))


def test_gmm_latgen_parallel_matches_serial(env, tmp_path):
    d = env["d"]
    base = ["--acoustic-scale=0.1", "--beam=16", f"{d}/final.mdl",
            f"{d}/HCLG.fst", f"ark:{d}/test_feats.ark"]
    assert get_tool("gmm-latgen-faster")(
        ["gmm-latgen-faster"] + base +
        [f"ark:{tmp_path}/ser.lat", f"ark:{tmp_path}/ser.words"]) == 0
    assert get_tool("gmm-latgen-faster-parallel")(
        ["gmm-latgen-faster-parallel", "--num-threads=3"] + base +
        [f"ark:{tmp_path}/par.lat", f"ark:{tmp_path}/par.words"]) == 0
    ser, par = _read_lats(f"{tmp_path}/ser.lat"), \
        _read_lats(f"{tmp_path}/par.lat")
    assert list(ser) == list(par)  # same keys, same (input) order
    for k in ser:
        assert _lat_fingerprint(ser[k]) == _lat_fingerprint(par[k])
    sw = dict(SequentialTableReader("int-vector",
                                    f"ark:{tmp_path}/ser.words"))
    pw = dict(SequentialTableReader("int-vector",
                                    f"ark:{tmp_path}/par.words"))
    for k in sw:
        np.testing.assert_array_equal(sw[k], pw[k])


def test_latgen_mapped_parallel(env, tmp_path):
    d = env["d"]
    sys_ = env["sys"]
    with TableWriter("matrix", f"ark:{tmp_path}/ll.ark") as w:
        for u, feats in env["sf"].items():
            w.write(u, sys_.am.log_likes_batch(feats).astype(np.float32))
    assert get_tool("latgen-faster-mapped-parallel")([
        "latgen-faster-mapped-parallel", "--num-threads=2",
        "--acoustic-scale=0.1", "--beam=16", f"{d}/final.mdl",
        f"{d}/HCLG.fst", f"ark:{tmp_path}/ll.ark",
        f"ark:{tmp_path}/lat.ark", f"ark:{tmp_path}/words.ark"]) == 0
    words = dict(SequentialTableReader("int-vector",
                                       f"ark:{tmp_path}/words.ark"))
    lang = env["lang"]
    for u, ref in env["test_txt"].items():
        hyp = [lang.word_names[w] for w in words.get(u, [])]
        assert hyp == list(ref), (u, hyp, ref)


def test_determinize_pruned_parallel_matches_serial(env, tmp_path):
    d = env["d"]
    assert get_tool("gmm-latgen-faster")([
        "gmm-latgen-faster", "--acoustic-scale=0.1", "--beam=16",
        "--determinize-lattice=false", f"{d}/final.mdl",
        f"{d}/HCLG.fst", f"ark:{d}/test_feats.ark",
        f"ark:{tmp_path}/raw.lat"]) == 0
    args = ["--acoustic-scale=0.1", "--beam=8",
            f"ark:{tmp_path}/raw.lat"]
    assert get_tool("lattice-determinize-pruned")(
        ["lattice-determinize-pruned"] + args +
        [f"ark:{tmp_path}/ser.lat"]) == 0
    assert get_tool("lattice-determinize-pruned-parallel")(
        ["lattice-determinize-pruned-parallel", "--num-threads=3"]
        + args + [f"ark:{tmp_path}/par.lat"]) == 0
    ser, par = _read_lats(f"{tmp_path}/ser.lat"), \
        _read_lats(f"{tmp_path}/par.lat")
    assert list(ser) == list(par)
    for k in ser:
        assert _lat_fingerprint(ser[k]) == _lat_fingerprint(par[k])


def test_determinize_phone_pruned(env, tmp_path):
    d = env["d"]
    assert get_tool("gmm-latgen-faster")([
        "gmm-latgen-faster", "--acoustic-scale=0.1", "--beam=16",
        "--determinize-lattice=false", f"{d}/final.mdl",
        f"{d}/HCLG.fst", f"ark:{d}/test_feats.ark",
        f"ark:{tmp_path}/raw.lat"]) == 0
    assert get_tool("lattice-determinize-phone-pruned")([
        "lattice-determinize-phone-pruned", "--acoustic-scale=0.1",
        "--beam=8", f"{d}/final.mdl", f"ark:{tmp_path}/raw.lat",
        f"ark:{tmp_path}/pp.lat"]) == 0
    assert get_tool("lattice-determinize-pruned")([
        "lattice-determinize-pruned", "--acoustic-scale=0.1",
        "--beam=8", f"ark:{tmp_path}/raw.lat",
        f"ark:{tmp_path}/word.lat"]) == 0
    from kaldi_tpu.lat.functions import lattice_best_path
    pp, word = _read_lats(f"{tmp_path}/pp.lat"), \
        _read_lats(f"{tmp_path}/word.lat")
    assert set(pp) == set(word) and pp
    for k in pp:
        # phone-pass + word-pass must agree with plain word
        # determinization on the best path (same cost, same words)
        a1, w1, c1 = lattice_best_path(pp[k])
        a2, w2, c2 = lattice_best_path(word[k])
        assert w1 == w2
        assert c1 == pytest.approx(c2, abs=1e-3)
        # no phone labels survive on the word side
        max_word = max(env["lang"].words.values())
        for s in range(pp[k].num_states):
            for arc in pp[k].arcs[s]:
                assert arc.olabel <= max_word
    # parallel variant matches
    assert get_tool("lattice-determinize-phone-pruned-parallel")([
        "lattice-determinize-phone-pruned-parallel",
        "--num-threads=2", "--acoustic-scale=0.1", "--beam=8",
        f"{d}/final.mdl", f"ark:{tmp_path}/raw.lat",
        f"ark:{tmp_path}/ppp.lat"]) == 0
    ppp = _read_lats(f"{tmp_path}/ppp.lat")
    assert list(ppp) == list(pp)
    for k in pp:
        assert _lat_fingerprint(ppp[k]) == _lat_fingerprint(pp[k])
    # phone-pass only: output need not be word-deterministic but must
    # preserve best path
    assert get_tool("lattice-determinize-phone-pruned")([
        "lattice-determinize-phone-pruned", "--acoustic-scale=0.1",
        "--beam=8", "--word-determinize=false", f"{d}/final.mdl",
        f"ark:{tmp_path}/raw.lat", f"ark:{tmp_path}/p1.lat"]) == 0
    p1 = _read_lats(f"{tmp_path}/p1.lat")
    for k in p1:
        _, w1, c1 = lattice_best_path(p1[k])
        _, w2, c2 = lattice_best_path(word[k])
        assert w1 == w2 and c1 == pytest.approx(c2, abs=1e-3)
