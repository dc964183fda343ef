"""sgmm2bin CLI ladder (parity: src/sgmm2bin + egs sgmm2 recipes):
init -> acc/est EM -> speaker vectors -> adapted acc/est -> decode."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from kaldi_tpu.cli import get_tool
from kaldi_tpu.cli.sgmm2_tools import read_am_sgmm2
from kaldi_tpu.fstext.openfst_io import write_fst
from kaldi_tpu.gmm.full_gmm import FullGmm
from kaldi_tpu.util import kaldi_io
from kaldi_tpu.util.table import SequentialTableReader, TableWriter


@pytest.fixture(scope="module")
def sgmm2_env(tmp_path_factory):
    """Mono bootstrap on the synthetic corpus; all inputs as files."""
    from test_mono_e2e import FS, make_corpus, unigram_g
    from kaldi_tpu.decoder.graph import Lang, TrainingGraphCompiler
    from kaldi_tpu.feat.frontend import MfccOptions, OfflineFeature
    from kaldi_tpu.feat.window import FrameExtractionOptions
    from kaldi_tpu.recipes.mono import (TrainMonoOptions, _align_all,
                                        make_hclg, train_mono)

    d = tmp_path_factory.mktemp("sgmm2")
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
                      TrainMonoOptions(num_iters=5, totgauss=30,
                                       realign_iters=(1, 2, 3, 4)))
    compiler = TrainingGraphCompiler(sys_.tm, sys_.tree, lang)
    graphs = {u: compiler.compile(train_txt[u]) for u in tf}
    ali = _align_all(sys_, graphs, tf, 10.0, 0.1, 1.0)

    kaldi_io.write_kaldi_object(sys_.tm.topo.write, f"{d}/topo")
    kaldi_io.write_kaldi_object(sys_.tree.write, f"{d}/tree")
    allx = np.concatenate(list(tf.values())).astype(np.float64)
    rng = np.random.default_rng(0)
    ubm = FullGmm(8, allx.shape[1])
    sel = allx[rng.choice(len(allx), 8, replace=False)]
    ubm.set_from_means_and_covars(
        np.ones(8) / 8, sel,
        np.stack([np.cov(allx.T) + 1e-2 * np.eye(allx.shape[1])] * 8))
    kaldi_io.write_kaldi_object(ubm.write, f"{d}/ubm")
    with TableWriter("matrix", f"ark:{d}/feats.ark") as w:
        for u in sorted(tf):
            w.write(u, tf[u])
    with TableWriter("matrix", f"ark:{d}/test_feats.ark") as w:
        for u in sorted(sf):
            w.write(u, sf[u])
    with TableWriter("int-vector", f"ark:{d}/ali.ark") as w:
        for u in sorted(ali):
            w.write(u, np.asarray(ali[u], np.int32))
    # two synthetic speakers: even/odd utterances
    utts = sorted(tf)
    with open(f"{d}/utt2spk", "w") as f:
        for i, u in enumerate(utts):
            f.write(f"{u} spk{i % 2}\n")
    with open(f"{d}/spk2utt", "w") as f:
        for s in (0, 1):
            members = " ".join(u for i, u in enumerate(utts)
                               if i % 2 == s)
            f.write(f"spk{s} {members}\n")
    hclg = make_hclg(sys_, unigram_g(lang))
    with open(f"{d}/HCLG.fst", "wb") as f:
        write_fst(f, hclg)
    from kaldi_tpu.decoder.graph import make_lexicon_fst
    with open(f"{d}/L.fst", "wb") as f:
        write_fst(f, make_lexicon_fst(lang, with_disambig=True))
    with TableWriter("int-vector", f"ark:{d}/trans.ark") as w:
        for u in utts:
            w.write(u, np.asarray([lang.words[w_] for w_ in
                                   train_txt[u]], np.int32))
    return dict(d=str(d), test_txt=test_txt, lang=lang)


def test_sgmm2_cli_ladder(sgmm2_env):
    d = sgmm2_env["d"]
    rc = get_tool("sgmm2-init")([
        "sgmm2-init", "--spk-space-dim=2", f"{d}/topo", f"{d}/tree",
        f"{d}/ubm", f"{d}/0.mdl"])
    assert rc == 0
    mdl = f"{d}/0.mdl"
    for it in range(4):
        rc = get_tool("sgmm2-acc-stats-ali")([
            "sgmm2-acc-stats-ali", mdl, f"ark:{d}/feats.ark",
            f"ark:{d}/ali.ark", f"{d}/{it}.acc"])
        assert rc == 0
        rc = get_tool("sgmm2-est")([
            "sgmm2-est", mdl, f"{d}/{it}.acc", f"{d}/{it + 1}.mdl"])
        assert rc == 0
        mdl = f"{d}/{it + 1}.mdl"
    # sum-accs: doubling the stats must be accepted
    rc = get_tool("sgmm2-sum-accs")([
        "sgmm2-sum-accs", f"{d}/sum.acc", f"{d}/3.acc", f"{d}/3.acc"])
    assert rc == 0
    # speaker vectors per spk2utt
    rc = get_tool("sgmm2-est-spkvecs")([
        "sgmm2-est-spkvecs", f"--spk2utt=ark,t:{d}/spk2utt", mdl,
        f"ark:{d}/feats.ark", f"ark:{d}/ali.ark",
        f"ark:{d}/vecs.ark"])
    assert rc == 0
    vecs = dict(SequentialTableReader("vector", f"ark:{d}/vecs.ark"))
    assert set(vecs) == {"spk0", "spk1"}
    # speaker-adapted accumulation round
    rc = get_tool("sgmm2-acc-stats-ali")([
        "sgmm2-acc-stats-ali", f"--spk-vecs=ark:{d}/vecs.ark",
        f"--utt2spk=ark,t:{d}/utt2spk", mdl, f"ark:{d}/feats.ark",
        f"ark:{d}/ali.ark", f"{d}/adapt.acc"])
    assert rc == 0
    rc = get_tool("sgmm2-est")([
        "sgmm2-est", mdl, f"{d}/adapt.acc", f"{d}/final.mdl"])
    assert rc == 0
    tm, am = read_am_sgmm2(f"{d}/final.mdl")
    assert am.spk_dim == 2 and am.u is not None
    # decode the test set
    rc = get_tool("sgmm2-latgen-faster")([
        "sgmm2-latgen-faster", "--acoustic-scale=0.1", "--beam=16",
        f"{d}/final.mdl", f"{d}/HCLG.fst", f"ark:{d}/test_feats.ark",
        f"ark:{d}/lat.ark", f"ark:{d}/words.ark"])
    assert rc == 0
    lang = sgmm2_env["lang"]
    errs = tot = 0
    hyps = dict(SequentialTableReader("int-vector",
                                      f"ark:{d}/words.ark"))
    for u, ref in sgmm2_env["test_txt"].items():
        hyp = [lang.word_names[w] for w in hyps.get(u, [])]
        tot += len(ref)
        if hyp != list(ref):
            errs += 1
    assert tot > 0 and errs <= 1, (errs, tot)


def _ensure_final_model(d):
    """Build final.mdl + lat.ark when this test runs standalone
    (the ladder test produces them in full-module runs)."""
    import os
    if os.path.exists(f"{d}/final.mdl"):
        return
    rc = get_tool("sgmm2-init")([
        "sgmm2-init", "--spk-space-dim=2", f"{d}/topo", f"{d}/tree",
        f"{d}/ubm", f"{d}/final.mdl"])
    assert rc == 0
    for it in range(2):
        assert get_tool("sgmm2-acc-stats-ali")([
            "sgmm2-acc-stats-ali", f"{d}/final.mdl",
            f"ark:{d}/feats.ark", f"ark:{d}/ali.ark",
            f"{d}/tmp.acc"]) == 0
        assert get_tool("sgmm2-est")([
            "sgmm2-est", f"{d}/final.mdl", f"{d}/tmp.acc",
            f"{d}/final.mdl"]) == 0
    assert get_tool("sgmm2-latgen-faster")([
        "sgmm2-latgen-faster", "--acoustic-scale=0.1", "--beam=16",
        f"{d}/final.mdl", f"{d}/HCLG.fst",
        f"ark:{d}/test_feats.ark", f"ark:{d}/lat.ark"]) == 0


def test_sgmm2_decode_surface(sgmm2_env, tmp_path):
    """gselect, align-compiled, rescore-lattice over the trained
    ladder's model."""
    d = sgmm2_env["d"]
    _ensure_final_model(d)
    rc = get_tool("sgmm2-gselect")([
        "sgmm2-gselect", "--full-gmm-nbest=3", f"{d}/final.mdl",
        f"ark:{d}/feats.ark", f"ark:{tmp_path}/gsel.ark"])
    assert rc == 0
    gsel = dict(SequentialTableReader("int-vector-vector",
                                      f"ark:{tmp_path}/gsel.ark"))
    assert all(len(r) == 3 for v in gsel.values() for r in v)
    # align against the training graphs compiled from the same system
    import os
    import sys as _s
    _s.path.insert(0, os.path.dirname(__file__))
    rc = get_tool("compile-train-graphs")([
        "compile-train-graphs", f"{d}/tree", f"{d}/final.mdl",
        f"{d}/L.fst", f"ark:{d}/trans.ark", f"ark:{tmp_path}/g.ark"])
    assert rc == 0
    rc = get_tool("sgmm2-align-compiled")([
        "sgmm2-align-compiled", "--acoustic-scale=0.1",
        f"{d}/final.mdl", f"ark:{tmp_path}/g.ark",
        f"ark:{d}/feats.ark", f"ark:{tmp_path}/ali.ark"])
    assert rc == 0
    ali = dict(SequentialTableReader("int-vector",
                                     f"ark:{tmp_path}/ali.ark"))
    assert len(ali) > 0
    # rescore the ladder's decode lattices with the final model
    rc = get_tool("sgmm2-rescore-lattice")([
        "sgmm2-rescore-lattice", f"{d}/final.mdl", f"ark:{d}/lat.ark",
        f"ark:{d}/test_feats.ark", f"ark:{tmp_path}/rlat.ark"])
    assert rc == 0
    from kaldi_tpu.lat.functions import lattice_best_path
    from kaldi_tpu.lat.kaldi_lattice import LatticeHolder
    lats = dict(SequentialTableReader(LatticeHolder(),
                                      f"ark:{tmp_path}/rlat.ark"))
    assert lats
    for lat in lats.values():
        _a, _w, cost = lattice_best_path(lat)
        assert np.isfinite(cost)


def test_sgmm2_latgen_parallel(sgmm2_env, tmp_path):
    """sgmm2-latgen-faster-parallel matches the serial tool's words."""
    d = sgmm2_env["d"]
    _ensure_final_model(d)
    args = ["--acoustic-scale=0.1", "--beam=16", f"{d}/final.mdl",
            f"{d}/HCLG.fst", f"ark:{d}/test_feats.ark"]
    assert get_tool("sgmm2-latgen-faster")(
        ["sgmm2-latgen-faster"] + args +
        [f"ark:{tmp_path}/ser.lat", f"ark:{tmp_path}/ser.words"]) == 0
    assert get_tool("sgmm2-latgen-faster-parallel")(
        ["sgmm2-latgen-faster-parallel", "--num-threads=2"] + args +
        [f"ark:{tmp_path}/par.lat", f"ark:{tmp_path}/par.words"]) == 0
    sw = dict(SequentialTableReader("int-vector",
                                    f"ark:{tmp_path}/ser.words"))
    pw = dict(SequentialTableReader("int-vector",
                                    f"ark:{tmp_path}/par.words"))
    assert list(sw) == list(pw)
    for k in sw:
        np.testing.assert_array_equal(sw[k], pw[k])


def test_sgmm2_acc_stats_posteriors(sgmm2_env, tmp_path):
    """sgmm2-acc-stats on unit-weight posteriors (ali-to-post) must
    match sgmm2-acc-stats-ali exactly; scaled posteriors scale the
    occupancies (soft-count path, sgmm2-acc-stats.cc)."""
    d = sgmm2_env["d"]
    _ensure_final_model(d)
    assert get_tool("ali-to-post")([
        "ali-to-post", f"ark:{d}/ali.ark", f"ark:{tmp_path}/post.ark"
    ]) == 0
    assert get_tool("sgmm2-acc-stats")([
        "sgmm2-acc-stats", f"{d}/final.mdl", f"ark:{d}/feats.ark",
        f"ark:{tmp_path}/post.ark", f"{tmp_path}/post.acc"]) == 0
    assert get_tool("sgmm2-acc-stats-ali")([
        "sgmm2-acc-stats-ali", f"{d}/final.mdl", f"ark:{d}/feats.ark",
        f"ark:{d}/ali.ark", f"{tmp_path}/ali.acc"]) == 0
    from kaldi_tpu.sgmm2.am_sgmm2 import MleAmSgmm2Accs
    a = kaldi_io.read_kaldi_object(MleAmSgmm2Accs.read,
                                   f"{tmp_path}/post.acc")
    b = kaldi_io.read_kaldi_object(MleAmSgmm2Accs.read,
                                   f"{tmp_path}/ali.acc")
    np.testing.assert_allclose(a.gamma, b.gamma, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(a.y, b.y, rtol=1e-6, atol=1e-6)
    assert abs(a.total_frames - b.total_frames) < 1e-6
    # half-weight posteriors -> half the occupancy mass
    assert get_tool("scale-post")([
        "scale-post", f"ark:{tmp_path}/post.ark", "0.5",
        f"ark:{tmp_path}/half.ark"]) == 0
    assert get_tool("sgmm2-acc-stats")([
        "sgmm2-acc-stats", f"{d}/final.mdl", f"ark:{d}/feats.ark",
        f"ark:{tmp_path}/half.ark", f"{tmp_path}/half.acc"]) == 0
    h = kaldi_io.read_kaldi_object(MleAmSgmm2Accs.read,
                                   f"{tmp_path}/half.acc")
    np.testing.assert_allclose(h.gamma, 0.5 * b.gamma,
                               rtol=1e-6, atol=1e-8)


def test_sgmm2_info_and_copy(sgmm2_env, capsys):
    d = sgmm2_env["d"]
    _ensure_final_model(d)
    rc = get_tool("sgmm2-copy")([
        "sgmm2-copy", "--binary=false", f"{d}/final.mdl",
        f"{d}/final_txt.mdl"])
    assert rc == 0
    tm1, am1 = read_am_sgmm2(f"{d}/final.mdl")
    tm2, am2 = read_am_sgmm2(f"{d}/final_txt.mdl")
    x = np.random.default_rng(0).normal(size=(5, am1.dim))
    np.testing.assert_allclose(am2.log_likes(x), am1.log_likes(x),
                               rtol=1e-4, atol=1e-3)
    rc = get_tool("sgmm2-info")(["sgmm2-info", f"{d}/final.mdl"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "spk-space dimension 2" in out
    assert "speaker-dependent weights yes" in out
