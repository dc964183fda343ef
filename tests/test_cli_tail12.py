"""Round-3 CLI tail batch 10: flat init, on-the-fly equal alignment,
FST-transcript graphs, gselect-to-post family, posterior UBM stats,
ivector utilities."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from kaldi_tpu.cli import get_tool
from kaldi_tpu.util import kaldi_io
from kaldi_tpu.util.table import SequentialTableReader, TableWriter


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    from test_mono_e2e import FS, make_corpus
    from kaldi_tpu.cli.gmm_tools import write_am_gmm
    from kaldi_tpu.decoder.graph import Lang, make_lexicon_fst
    from kaldi_tpu.feat.frontend import MfccOptions, OfflineFeature
    from kaldi_tpu.feat.window import FrameExtractionOptions
    from kaldi_tpu.fstext.openfst_io import write_fst
    from kaldi_tpu.recipes.mono import TrainMonoOptions, train_mono
    d = tmp_path_factory.mktemp("tail12")
    train_txt, train_wav, _, _ = make_corpus(num_train=6, num_test=1)
    comp = OfflineFeature(MfccOptions(
        frame_opts=FrameExtractionOptions(samp_freq=FS, dither=0.0)))
    tf = dict(zip(train_wav, comp.compute_batch(list(train_wav.values()))))
    lang = Lang({"YES": [["Y"]], "NO": [["N"]]}, sil_phone="SIL",
                sil_prob=0.5)
    lang.make_topology()
    sys_ = train_mono(lang, tf, train_txt,
                      TrainMonoOptions(num_iters=2, totgauss=12,
                                       realign_iters=(1,)))
    write_am_gmm(f"{d}/final.mdl", sys_.tm, sys_.am)
    kaldi_io.write_kaldi_object(sys_.tree.write, f"{d}/tree")
    kaldi_io.write_kaldi_object(sys_.tm.topo.write, f"{d}/topo")
    with open(f"{d}/L.fst", "wb") as f:
        write_fst(f, make_lexicon_fst(lang, with_disambig=True))
    with TableWriter("matrix", f"ark:{d}/feats.ark") as w:
        for u in sorted(tf):
            w.write(u, tf[u])
    with TableWriter("int-vector", f"ark:{d}/trans.ark") as w:
        for u in sorted(tf):
            w.write(u, np.asarray([lang.words[w_] for w_ in
                                   train_txt[u]], np.int32))
    return dict(d=str(d), sys=sys_, tf=tf, lang=lang,
                train_txt=train_txt)


def test_gmm_init_model_flat(env, tmp_path):
    d = env["d"]
    rc = get_tool("gmm-init-model-flat")([
        "gmm-init-model-flat", f"{d}/tree", f"{d}/topo",
        f"{tmp_path}/flat.mdl", f"ark:{d}/feats.ark"])
    assert rc == 0
    from kaldi_tpu.cli.gmm_tools import read_am_gmm
    tm, am = read_am_gmm(f"{tmp_path}/flat.mdl")
    assert am.num_pdfs == env["sys"].am.num_pdfs
    allx = np.concatenate(list(env["tf"].values()))
    np.testing.assert_allclose(am.get_pdf(0).get_means()[0],
                               allx.mean(axis=0), rtol=1e-4,
                               atol=1e-3)


def test_align_equal_on_the_fly(env, tmp_path):
    d = env["d"]
    rc = get_tool("align-equal")([
        "align-equal", f"{d}/tree", f"{d}/final.mdl", f"{d}/L.fst",
        f"ark:{d}/feats.ark", f"ark:{d}/trans.ark",
        f"ark:{tmp_path}/ali.ark"])
    assert rc == 0
    ali = dict(SequentialTableReader("int-vector",
                                     f"ark:{tmp_path}/ali.ark"))
    sys_ = env["sys"]
    for u, a in ali.items():
        assert len(a) == env["tf"][u].shape[0]
        assert all(1 <= int(t) <= sys_.tm.num_transition_ids
                   for t in a)


def test_compile_train_graphs_fsts(env, tmp_path):
    d = env["d"]
    lang = env["lang"]
    # per-utterance word FST: the true transcript OR the other word
    # in first position (uncertain transcript)
    from kaldi_tpu.fstext.fst import Arc, TropicalWeight, VectorFst
    u0 = sorted(env["tf"])[0]
    words = [lang.words[w] for w in env["train_txt"][u0]]
    g = VectorFst(TropicalWeight)
    s0 = g.add_state()
    g.set_start(s0)
    s1 = g.add_state()
    for w in set(lang.words.values()):
        g.add_arc(s0, Arc(w, w, TropicalWeight.one, s1))
    cur = s1
    for w in words[1:]:
        ns = g.add_state()
        g.add_arc(cur, Arc(w, w, TropicalWeight.one, ns))
        cur = ns
    g.set_final(cur, TropicalWeight.one)
    with TableWriter("fst", f"ark:{tmp_path}/g.ark") as w:
        w.write(u0, g)
    rc = get_tool("compile-train-graphs-fsts")([
        "compile-train-graphs-fsts", f"{d}/tree", f"{d}/final.mdl",
        f"{d}/L.fst", f"ark:{tmp_path}/g.ark",
        f"ark:{tmp_path}/graphs.ark"])
    assert rc == 0
    from kaldi_tpu.decoder.viterbi import FasterDecoder, \
        FasterDecoderOptions
    graphs = dict(SequentialTableReader(VectorFst,
                                        f"ark:{tmp_path}/graphs.ark"))
    sys_ = env["sys"]
    ll = sys_.am.log_likes_batch(env["tf"][u0])
    res = FasterDecoder(graphs[u0], FasterDecoderOptions(beam=16.0)) \
        .decode(np.asarray(ll), sys_.tm.id2pdf_id, 0.1)
    assert res is not None
    # acoustics pick the true first word among the alternatives
    assert res[1] == words


def test_gselect_to_post_and_ubm_stats(env, tmp_path):
    d = env["d"]
    from kaldi_tpu.gmm.diag_gmm import DiagGmm
    rng = np.random.default_rng(0)
    allx = np.concatenate(list(env["tf"].values()))
    g = DiagGmm(6, allx.shape[1])
    sel = allx[rng.choice(len(allx), 6, replace=False)]
    g.set_from_means_and_vars(np.ones(6) / 6, sel,
                              np.var(allx, 0)[None].repeat(6, 0))
    kaldi_io.write_kaldi_object(g.write, f"{tmp_path}/dubm")
    rc = get_tool("gmm-gselect")([
        "gmm-gselect", "--n=3", f"{tmp_path}/dubm",
        f"ark:{d}/feats.ark", f"ark:{tmp_path}/gsel.ark"])
    assert rc == 0
    rc = get_tool("gmm-global-gselect-to-post")([
        "gmm-global-gselect-to-post", f"{tmp_path}/dubm",
        f"ark:{d}/feats.ark", f"ark:{tmp_path}/gsel.ark",
        f"ark:{tmp_path}/post.ark"])
    assert rc == 0
    post = dict(SequentialTableReader("posterior",
                                      f"ark:{tmp_path}/post.ark"))
    u = sorted(env["tf"])[0]
    for frame in post[u]:
        assert len(frame) <= 3
        assert abs(sum(w for _i, w in frame) - 1.0) < 1e-4
    # UBM stats from those posteriors
    rc = get_tool("gmm-global-to-fgmm")([
        "gmm-global-to-fgmm", f"{tmp_path}/dubm", f"{tmp_path}/fubm"])
    assert rc == 0
    rc = get_tool("fgmm-global-acc-stats-post")([
        "fgmm-global-acc-stats-post", f"{tmp_path}/fubm",
        f"ark:{tmp_path}/post.ark", f"ark:{d}/feats.ark",
        f"{tmp_path}/post.facc"])
    assert rc == 0
    with kaldi_io.input_stream(f"{tmp_path}/post.facc") as f:
        acc = dict(np.load(f))
    T = sum(f_.shape[0] for f_ in env["tf"].values())
    assert acc["occupancy"].sum() == pytest.approx(T, rel=1e-4)


def test_ivector_copy_and_randomize(tmp_path):
    from kaldi_tpu.gmm.diag_gmm import DiagGmm
    from kaldi_tpu.ivector.extractor import IvectorExtractor
    rng = np.random.default_rng(0)
    ubm = DiagGmm(3, 4)
    ubm.set_from_means_and_vars(np.ones(3) / 3,
                                rng.normal(size=(3, 4)),
                                np.ones((3, 4)))
    ex = IvectorExtractor(ubm, 3)
    kaldi_io.write_kaldi_object(ex.write, f"{tmp_path}/ie")
    rc = get_tool("ivector-extractor-copy")([
        "ivector-extractor-copy", "--binary=false", f"{tmp_path}/ie",
        f"{tmp_path}/ie2"])
    assert rc == 0
    ex2 = kaldi_io.read_kaldi_object(IvectorExtractor.read,
                                     f"{tmp_path}/ie2")
    np.testing.assert_allclose(ex2.M, ex.M, atol=1e-5)
    m = np.arange(20, dtype=np.float32).reshape(10, 2)
    with TableWriter("matrix", f"ark:{tmp_path}/iv.ark") as w:
        w.write("u1", m)
    rc = get_tool("ivector-randomize")([
        "ivector-randomize", "--randomize-prob=1.0", "--srand=3",
        f"ark:{tmp_path}/iv.ark", f"ark:{tmp_path}/o.ark"])
    assert rc == 0
    out = np.asarray(dict(SequentialTableReader(
        "matrix", f"ark:{tmp_path}/o.ark"))["u1"])
    # every row still comes from the input, replacements are LATER rows
    for t in range(10):
        src = int(out[t, 0]) // 2
        assert src >= t and np.allclose(out[t], m[src])
    assert not np.allclose(out, m)       # something actually moved
