"""Decoder-variant CLI: simple decode/latgen, on-the-fly biglm
composition, per-speaker MAP-model latgen, incremental mapped."""

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
    from kaldi_tpu.decoder.graph import Lang
    from kaldi_tpu.feat.frontend import MfccOptions, OfflineFeature
    from kaldi_tpu.feat.window import FrameExtractionOptions
    from kaldi_tpu.fstext.openfst_io import write_fst
    from kaldi_tpu.recipes.mono import (TrainMonoOptions, make_hclg,
                                        train_mono)
    d = tmp_path_factory.mktemp("decoders2")
    train_txt, train_wav, test_txt, test_wav = make_corpus(
        num_train=8, num_test=3)
    comp = OfflineFeature(MfccOptions(
        frame_opts=FrameExtractionOptions(samp_freq=FS, dither=0.0)))
    tf = dict(zip(train_wav, comp.compute_batch(list(train_wav.values()))))
    sf = dict(zip(test_wav, comp.compute_batch(list(test_wav.values()))))
    lang = Lang({"YES": [["Y"]], "NO": [["N"]]}, sil_phone="SIL",
                sil_prob=0.5)
    lang.make_topology()
    sys_ = train_mono(lang, tf, train_txt,
                      TrainMonoOptions(num_iters=4, totgauss=24,
                                       realign_iters=(1, 2, 3)))
    write_am_gmm(f"{d}/final.mdl", sys_.tm, sys_.am)
    g = unigram_g(lang)
    with open(f"{d}/G.fst", "wb") as f:
        write_fst(f, g)
    with open(f"{d}/HCLG.fst", "wb") as f:
        write_fst(f, make_hclg(sys_, g))
    with TableWriter("matrix", f"ark:{d}/test_feats.ark") as w:
        for u in sorted(sf):
            w.write(u, sf[u])
    return dict(d=str(d), sys=sys_, sf=sf, lang=lang,
                test_txt=test_txt, g=g)


def test_decode_simple_and_latgen_simple(env, tmp_path):
    d = env["d"]
    lang = env["lang"]
    assert get_tool("gmm-decode-simple")([
        "gmm-decode-simple", "--acoustic-scale=0.1", f"{d}/final.mdl",
        f"{d}/HCLG.fst", f"ark:{d}/test_feats.ark",
        f"ark:{tmp_path}/words.ark", f"ark:{tmp_path}/ali.ark",
        f"ark:{tmp_path}/lat.ark"]) == 0
    words = dict(SequentialTableReader("int-vector",
                                       f"ark:{tmp_path}/words.ark"))
    for u, ref in env["test_txt"].items():
        hyp = [lang.word_names[w] for w in words.get(u, [])]
        assert hyp == list(ref), (u, hyp, ref)
    # the exact decode matches gmm-decode-faster at a wide beam
    assert get_tool("gmm-decode-faster")([
        "gmm-decode-faster", "--acoustic-scale=0.1", "--beam=1000",
        f"{d}/final.mdl", f"{d}/HCLG.fst",
        f"ark:{d}/test_feats.ark", f"ark:{tmp_path}/words2.ark"]) == 0
    w2 = dict(SequentialTableReader("int-vector",
                                    f"ark:{tmp_path}/words2.ark"))
    for u in words:
        np.testing.assert_array_equal(words[u], w2[u])
    # linear lattices exist with the alignment's frame count
    lats = dict(SequentialTableReader(LatticeHolder(),
                                      f"ark:{tmp_path}/lat.ark"))
    ali = dict(SequentialTableReader("int-vector",
                                     f"ark:{tmp_path}/ali.ark"))
    for u, lat in lats.items():
        n_arcs = sum(len(a) for a in lat.arcs)
        assert n_arcs == len(ali[u])
    # latgen-simple agrees on the best path
    assert get_tool("gmm-latgen-simple")([
        "gmm-latgen-simple", "--acoustic-scale=0.1",
        f"{d}/final.mdl", f"{d}/HCLG.fst",
        f"ark:{d}/test_feats.ark", f"ark:{tmp_path}/slat.ark",
        f"ark:{tmp_path}/swords.ark"]) == 0
    sw = dict(SequentialTableReader("int-vector",
                                    f"ark:{tmp_path}/swords.ark"))
    for u in words:
        np.testing.assert_array_equal(sw[u], words[u])


def test_biglm_faster(env, tmp_path):
    d = env["d"]
    lang = env["lang"]
    # new LM == old LM: identical results to the plain decoder
    assert get_tool("gmm-decode-biglm-faster")([
        "gmm-decode-biglm-faster", "--acoustic-scale=0.1",
        "--beam=16", f"{d}/final.mdl", f"{d}/HCLG.fst", f"{d}/G.fst",
        f"{d}/G.fst", f"ark:{d}/test_feats.ark",
        f"ark:{tmp_path}/words.ark"]) == 0
    assert get_tool("gmm-decode-faster")([
        "gmm-decode-faster", "--acoustic-scale=0.1", "--beam=16",
        f"{d}/final.mdl", f"{d}/HCLG.fst",
        f"ark:{d}/test_feats.ark", f"ark:{tmp_path}/base.ark"]) == 0
    w1 = dict(SequentialTableReader("int-vector",
                                    f"ark:{tmp_path}/words.ark"))
    w0 = dict(SequentialTableReader("int-vector",
                                    f"ark:{tmp_path}/base.ark"))
    assert set(w1) == set(w0)
    for u in w0:
        np.testing.assert_array_equal(w1[u], w0[u])
    # scaled-up new LM still decodes the transcripts (weights shift
    # but acoustics dominate on this corpus)
    from kaldi_tpu.fstext.fst import Arc, TropicalWeight, VectorFst
    from kaldi_tpu.fstext.openfst_io import write_fst
    g2 = VectorFst(TropicalWeight)
    g2.add_states(env["g"].num_states)
    g2.start = env["g"].start
    for s in range(env["g"].num_states):
        g2.finals[s] = env["g"].finals[s]
        for a in env["g"].arcs[s]:
            g2.add_arc(s, Arc(a.ilabel, a.olabel,
                              float(a.weight) * 2.0, a.nextstate))
    with open(f"{tmp_path}/G2.fst", "wb") as f:
        write_fst(f, g2)
    assert get_tool("gmm-latgen-biglm-faster")([
        "gmm-latgen-biglm-faster", "--acoustic-scale=0.1",
        "--beam=16", f"{d}/final.mdl", f"{d}/HCLG.fst", f"{d}/G.fst",
        f"{tmp_path}/G2.fst", f"ark:{d}/test_feats.ark",
        f"ark:{tmp_path}/lat.ark", f"ark:{tmp_path}/words2.ark"]) == 0
    w2 = dict(SequentialTableReader("int-vector",
                                    f"ark:{tmp_path}/words2.ark"))
    for u, ref in env["test_txt"].items():
        hyp = [lang.word_names[w] for w in w2.get(u, [])]
        assert hyp == list(ref), (u, hyp, ref)
    # lattice costs reflect the rescored LM: best path total differs
    # from the base HCLG decode by the LM-weight delta
    from kaldi_tpu.lat.functions import lattice_best_path
    lats = dict(SequentialTableReader(LatticeHolder(),
                                      f"ark:{tmp_path}/lat.ark"))
    assert lats


def test_latgen_map(env, tmp_path):
    d = env["d"]
    sys_ = env["sys"]
    from kaldi_tpu.gmm.am_diag_gmm import AmDiagGmm
    with TableWriter(AmDiagGmm, f"ark:{tmp_path}/gmms.ark") as w:
        w.write("spk", sys_.am)
    with open(f"{tmp_path}/utt2spk", "w") as f:
        for u in sorted(env["sf"]):
            f.write(f"{u} spk\n")
    assert get_tool("gmm-latgen-map")([
        "gmm-latgen-map", "--acoustic-scale=0.1", "--beam=16",
        f"--utt2spk=ark,t:{tmp_path}/utt2spk", f"{d}/final.mdl",
        f"ark:{tmp_path}/gmms.ark", f"{d}/HCLG.fst",
        f"ark:{d}/test_feats.ark", f"ark:{tmp_path}/lat.ark",
        f"ark:{tmp_path}/words.ark"]) == 0
    words = dict(SequentialTableReader("int-vector",
                                       f"ark:{tmp_path}/words.ark"))
    lang = env["lang"]
    for u, ref in env["test_txt"].items():
        hyp = [lang.word_names[w] for w in words.get(u, [])]
        assert hyp == list(ref), (u, hyp, ref)


def test_latgen_incremental_mapped(env, tmp_path):
    d = env["d"]
    sys_ = env["sys"]
    with TableWriter("matrix", f"ark:{tmp_path}/ll.ark") as w:
        for u, feats in env["sf"].items():
            w.write(u, sys_.am.log_likes_batch(feats).astype(np.float32))
    assert get_tool("latgen-incremental-mapped")([
        "latgen-incremental-mapped", "--acoustic-scale=0.1",
        "--beam=16", "--determinize-period=25", f"{d}/final.mdl",
        f"{d}/HCLG.fst", f"ark:{tmp_path}/ll.ark",
        f"ark:{tmp_path}/lat.ark", f"ark:{tmp_path}/words.ark"]) == 0
    words = dict(SequentialTableReader("int-vector",
                                       f"ark:{tmp_path}/words.ark"))
    lang = env["lang"]
    for u, ref in env["test_txt"].items():
        hyp = [lang.word_names[w] for w in words.get(u, [])]
        assert hyp == list(ref), (u, hyp, ref)
