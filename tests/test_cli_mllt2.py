"""MLLT-global / get-full-lda-mat / gmm-est-rescale / init-ubm CLI."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from kaldi_tpu.base import io_funcs as iof
from kaldi_tpu.cli import get_tool
from kaldi_tpu.util import kaldi_io
from kaldi_tpu.util.table import SequentialTableReader, TableWriter


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    from test_mono_e2e import FS, make_corpus
    from kaldi_tpu.cli.gmm_tools import write_am_gmm
    from kaldi_tpu.decoder.graph import Lang
    from kaldi_tpu.feat.frontend import MfccOptions, OfflineFeature
    from kaldi_tpu.feat.window import FrameExtractionOptions
    from kaldi_tpu.recipes.mono import TrainMonoOptions, train_mono
    d = tmp_path_factory.mktemp("mllt2")
    train_txt, train_wav, _t, _w = make_corpus(num_train=8, num_test=1)
    comp = OfflineFeature(MfccOptions(
        frame_opts=FrameExtractionOptions(samp_freq=FS, dither=0.0)))
    tf = dict(zip(train_wav, comp.compute_batch(list(train_wav.values()))))
    lang = Lang({"YES": [["Y"]], "NO": [["N"]]}, sil_phone="SIL",
                sil_prob=0.5)
    lang.make_topology()
    sys_ = train_mono(lang, tf, train_txt,
                      TrainMonoOptions(num_iters=4, totgauss=24,
                                       realign_iters=(1, 2, 3)))
    write_am_gmm(f"{d}/final.mdl", sys_.tm, sys_.am)
    with TableWriter("matrix", f"ark:{d}/feats.ark") as w:
        for u in sorted(tf):
            w.write(u, tf[u])
    # a small global GMM over the pooled features
    allx = np.concatenate(list(tf.values()))
    from kaldi_tpu.gmm.diag_gmm import DiagGmm
    rng = np.random.default_rng(0)
    ubm = DiagGmm(4, allx.shape[1])
    ubm.set_from_means_and_vars(
        np.ones(4) / 4, allx[rng.choice(len(allx), 4, replace=False)],
        np.tile(allx.var(axis=0) + 1e-3, (4, 1)))
    ubm.compute_gconsts()
    kaldi_io.write_kaldi_object(ubm.write, f"{d}/ubm")
    return dict(d=str(d), sys=sys_, tf=tf)


def test_acc_mllt_global_and_sum(env, tmp_path):
    d = env["d"]
    assert get_tool("gmm-acc-mllt-global")([
        "gmm-acc-mllt-global", "--rand-prune=0", f"{d}/ubm",
        f"ark:{d}/feats.ark", f"{tmp_path}/m.acc"]) == 0
    from kaldi_tpu.transform.mllt import MlltAccs
    a = kaldi_io.read_kaldi_object(MlltAccs.read, f"{tmp_path}/m.acc")
    total_frames = sum(f.shape[0] for f in env["tf"].values())
    assert a.beta == pytest.approx(total_frames, rel=1e-6)
    # summing the stats twice doubles beta and G
    assert get_tool("sum-mllt-accs")([
        "sum-mllt-accs", f"{tmp_path}/sum.acc", f"{tmp_path}/m.acc",
        f"{tmp_path}/m.acc"]) == 0
    s = kaldi_io.read_kaldi_object(MlltAccs.read, f"{tmp_path}/sum.acc")
    assert s.beta == pytest.approx(2 * a.beta, rel=1e-6)
    np.testing.assert_allclose(s.G, 2 * a.G, rtol=1e-6)
    # the accumulated stats give a usable MLLT update
    M, impr = s.update()
    assert np.isfinite(M).all() and impr >= -1e-6


def test_get_full_lda_mat(tmp_path):
    rng = np.random.default_rng(1)
    full = rng.normal(size=(6, 6))
    lda_mllt = rng.normal(size=(3, 6))
    kaldi_io.write_kaldi_object(
        lambda s, b: iof.write_matrix(s, b, lda_mllt),
        f"{tmp_path}/final.mat")
    kaldi_io.write_kaldi_object(
        lambda s, b: iof.write_matrix(s, b, full),
        f"{tmp_path}/full.mat")
    assert get_tool("get-full-lda-mat")([
        "get-full-lda-mat", f"{tmp_path}/final.mat",
        f"{tmp_path}/full.mat", f"{tmp_path}/out.mat",
        f"{tmp_path}/out_inv.mat"]) == 0
    out = kaldi_io.read_kaldi_object(iof.read_matrix,
                                     f"{tmp_path}/out.mat")
    np.testing.assert_allclose(out[:3], lda_mllt, rtol=1e-5)
    np.testing.assert_allclose(out[3:], full[3:], rtol=1e-5)
    inv = kaldi_io.read_kaldi_object(iof.read_matrix,
                                     f"{tmp_path}/out_inv.mat")
    np.testing.assert_allclose(np.asarray(out, np.float64)
                               @ np.asarray(inv, np.float64),
                               np.eye(6), atol=1e-4)


def test_gmm_est_rescale(env, tmp_path):
    d = env["d"]
    # old stats: from the real features; new stats: features + shift
    assert get_tool("gmm-align")  # sanity tool presence
    from kaldi_tpu.gmm.mle import AccumAmDiagGmm
    sys_ = env["sys"]
    shift = 2.5
    old = AccumAmDiagGmm(sys_.am,
                         num_transition_ids=sys_.tm.num_transition_ids)
    new = AccumAmDiagGmm(sys_.am,
                         num_transition_ids=sys_.tm.num_transition_ids)
    from kaldi_tpu.decoder.graph import TrainingGraphCompiler
    # accumulate against every pdf with uniform soft counts so every
    # gaussian clears the occupancy floor
    # use the SAME posterior assignment for old and new data so the
    # ML-mean shift is exactly +shift per gaussian
    for u, feats in env["tf"].items():
        feats = np.asarray(feats, np.float64)
        for pdf in range(sys_.am.num_pdfs):
            g = sys_.am.get_pdf(pdf)
            post = g.component_posteriors(feats.astype(np.float32))
            old.accs[pdf].accumulate(feats, post)
            new.accs[pdf].accumulate(feats + shift, post)
    def write_stats(path, accs):
        kaldi_io.write_kaldi_object(accs.write, path)
    write_stats(f"{tmp_path}/old.acc", old)
    write_stats(f"{tmp_path}/new.acc", new)
    assert get_tool("gmm-est-rescale")([
        "gmm-est-rescale", f"{d}/final.mdl", f"{tmp_path}/old.acc",
        f"{tmp_path}/new.acc", f"{tmp_path}/rescaled.mdl"]) == 0
    from kaldi_tpu.cli.gmm_tools import read_am_gmm
    _tm, am0 = read_am_gmm(f"{d}/final.mdl")
    _tm2, am1 = read_am_gmm(f"{tmp_path}/rescaled.mdl")
    # uniform +shift in the data moves every updated mean by +shift
    # and leaves variances alone (ratio of ML variances == 1)
    for pdf in range(am0.num_pdfs):
        g0, g1 = am0.get_pdf(pdf), am1.get_pdf(pdf)
        np.testing.assert_allclose(g1.get_means(),
                                   g0.get_means() + shift,
                                   rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(1.0 / g1.inv_vars,
                                   1.0 / g0.inv_vars,
                                   rtol=1e-3)
        np.testing.assert_allclose(g1.weights, g0.weights, rtol=1e-6)


def test_init_ubm(env, tmp_path):
    d = env["d"]
    sys_ = env["sys"]
    occs = np.linspace(10, 50, sys_.am.num_pdfs)
    kaldi_io.write_kaldi_object(
        lambda s, b: iof.write_vector(s, b, occs),
        f"{tmp_path}/occs.vec")
    assert get_tool("init-ubm")([
        "init-ubm", "--ubm-num-gauss=8", "--fullcov-ubm=true",
        f"{d}/final.mdl", f"{tmp_path}/occs.vec",
        f"{tmp_path}/ubm.full"]) == 0
    from kaldi_tpu.gmm.full_gmm import FullGmm
    ubm = kaldi_io.read_kaldi_object(FullGmm.read, f"{tmp_path}/ubm.full")
    assert 1 <= ubm.num_gauss <= 8
    assert ubm.weights.sum() == pytest.approx(1.0, abs=1e-6)
    # diagonal variant round-trips as DiagGmm
    assert get_tool("init-ubm")([
        "init-ubm", "--ubm-num-gauss=8", "--fullcov-ubm=false",
        f"{d}/final.mdl", f"{tmp_path}/occs.vec",
        f"{tmp_path}/ubm.diag"]) == 0
    from kaldi_tpu.gmm.diag_gmm import DiagGmm
    dubm = kaldi_io.read_kaldi_object(DiagGmm.read,
                                      f"{tmp_path}/ubm.diag")
    assert 1 <= dubm.num_gauss <= 8
    # the UBM models the training data better than a single gaussian
    allx = np.concatenate(list(env["tf"].values())).astype(np.float32)
    single = DiagGmm(1, allx.shape[1])
    single.set_from_means_and_vars(
        np.ones(1), allx.mean(0, keepdims=True),
        allx.var(0, keepdims=True) + 1e-3)
    single.compute_gconsts()
    assert dubm.log_likelihood(allx).mean() > \
        single.log_likelihood(allx).mean() - 0.5


def test_diag_gmm_merge():
    """DiagGmm.merge: two identical components collapse losslessly;
    merging preserves total first/second moments."""
    from kaldi_tpu.gmm.diag_gmm import DiagGmm
    g = DiagGmm(3, 2)
    means = np.array([[0.0, 0.0], [0.0, 0.0], [5.0, 5.0]])
    var = np.ones((3, 2))
    g.set_from_means_and_vars(np.array([0.25, 0.25, 0.5]), means, var)
    g.compute_gconsts()
    g.merge(2)
    assert g.num_gauss == 2
    got = sorted((float(w), tuple(np.round(m, 6)))
                 for w, m in zip(g.weights, g.get_means()))
    assert got[0][0] == pytest.approx(0.5)
    assert got[0][1] == (0.0, 0.0) or got[1][1] == (0.0, 0.0)
    assert any(m == (5.0, 5.0) for _w, m in got)
