"""fMPE stats split, stats-derivative, twofeats accumulation, fgmm
merge/init-from-accs, global LVTLN, fstrand, accelerator probes."""

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
    from kaldi_tpu.decoder.graph import Lang, TrainingGraphCompiler
    from kaldi_tpu.feat.frontend import MfccOptions, OfflineFeature
    from kaldi_tpu.feat.window import FrameExtractionOptions
    from kaldi_tpu.recipes.mono import (TrainMonoOptions, _align_all,
                                        train_mono)
    d = tmp_path_factory.mktemp("fmpe2")
    train_txt, train_wav, _t, _w = make_corpus(num_train=6, num_test=1)
    comp = OfflineFeature(MfccOptions(
        frame_opts=FrameExtractionOptions(samp_freq=FS, dither=0.0)))
    tf = dict(zip(train_wav, comp.compute_batch(list(train_wav.values()))))
    lang = Lang({"YES": [["Y"]], "NO": [["N"]]}, sil_phone="SIL",
                sil_prob=0.5)
    lang.make_topology()
    sys_ = train_mono(lang, tf, train_txt,
                      TrainMonoOptions(num_iters=3, totgauss=18,
                                       realign_iters=(1, 2)))
    compiler = TrainingGraphCompiler(sys_.tm, sys_.tree, lang)
    graphs = {u: compiler.compile(train_txt[u]) for u in tf}
    ali = _align_all(sys_, graphs, tf, 10.0, 0.1, 1.0)
    write_am_gmm(f"{d}/final.mdl", sys_.tm, sys_.am)
    with TableWriter("matrix", f"ark:{d}/feats.ark") as w:
        for u in sorted(tf):
            w.write(u, tf[u])
    with TableWriter("int-vector", f"ark:{d}/ali.ark") as w:
        for u in sorted(ali):
            w.write(u, np.asarray(ali[u], np.int32))
    assert get_tool("ali-to-post")([
        "ali-to-post", f"ark:{d}/ali.ark", f"ark:{d}/post.ark"]) == 0
    allx = np.concatenate(list(tf.values()))
    from kaldi_tpu.gmm.diag_gmm import DiagGmm
    rng = np.random.default_rng(9)
    fgmm = DiagGmm(4, allx.shape[1])
    fgmm.set_from_means_and_vars(
        np.ones(4) / 4, allx[rng.choice(len(allx), 4, replace=False)],
        np.tile(allx.var(0) + 1e-3, (4, 1)))
    fgmm.compute_gconsts()
    kaldi_io.write_kaldi_object(fgmm.write, f"{d}/fmpe_ubm")
    assert get_tool("fmpe-init")([
        "fmpe-init", f"{d}/fmpe_ubm", f"{d}/0.fmpe"]) == 0
    return dict(d=str(d), sys=sys_, tf=tf, ali=ali)


def test_fmpe_stats_split(env, tmp_path):
    d = env["d"]
    # unused gselect arg: pass the posts archive path (ignored)
    assert get_tool("gmm-fmpe-acc-stats")([
        "gmm-fmpe-acc-stats", f"{d}/final.mdl", f"{d}/0.fmpe",
        f"ark:{d}/feats.ark", f"ark:{d}/post.ark",
        f"ark:{d}/post.ark", f"{tmp_path}/1.stats"]) == 0
    from kaldi_tpu.transform.fmpe import FmpeStats
    s1 = kaldi_io.read_kaldi_object(FmpeStats.read,
                                    f"{tmp_path}/1.stats")
    assert s1.tot_frames > 0 and np.abs(s1.grad).max() > 0
    # sum doubles
    assert get_tool("fmpe-sum-accs")([
        "fmpe-sum-accs", f"{tmp_path}/sum.stats", f"{tmp_path}/1.stats",
        f"{tmp_path}/1.stats"]) == 0
    s2 = kaldi_io.read_kaldi_object(FmpeStats.read,
                                    f"{tmp_path}/sum.stats")
    np.testing.assert_allclose(s2.grad, 2 * s1.grad, rtol=1e-6)
    # est (stats mode) moves M in the gradient direction
    assert get_tool("fmpe-est")([
        "fmpe-est", "--learning-rate=0.1", f"{d}/0.fmpe",
        f"{tmp_path}/1.stats", f"{tmp_path}/1.fmpe"]) == 0
    from kaldi_tpu.cli.tail8_tools import _read_fmpe
    from kaldi_tpu.base import io_funcs as iof
    with kaldi_io.input_stream(f"{tmp_path}/1.fmpe") as f:
        fm = _read_fmpe(f, iof.init_input_stream(f))
    step = fm.M - 0.0
    np.testing.assert_allclose(
        step, 0.1 * s1.grad / s1.tot_frames, rtol=1e-4, atol=1e-8)
    # fmpe-acc-stats from explicit derivatives: identity deriv sums
    # the descriptors
    with TableWriter("matrix", f"ark:{tmp_path}/deriv.ark") as w:
        for u, feats in env["tf"].items():
            w.write(u, np.ones_like(feats, np.float32))
    assert get_tool("fmpe-acc-stats")([
        "fmpe-acc-stats", f"{d}/0.fmpe", f"ark:{d}/feats.ark",
        f"ark:{tmp_path}/deriv.ark", f"{tmp_path}/d.stats"]) == 0
    sd = kaldi_io.read_kaldi_object(FmpeStats.read,
                                    f"{tmp_path}/d.stats")
    assert sd.tot_frames == sum(f.shape[0]
                                for f in env["tf"].values())


def test_gmm_get_stats_deriv(env, tmp_path):
    d = env["d"]
    # num stats from real posts, den stats from scaled posts
    assert get_tool("gmm-acc-stats")([
        "gmm-acc-stats", f"{d}/final.mdl", f"ark:{d}/feats.ark",
        f"ark:{d}/post.ark", f"{tmp_path}/num.acc"]) == 0
    assert get_tool("scale-post")([
        "scale-post", f"ark:{d}/post.ark", "0.5",
        f"ark:{tmp_path}/half.ark"]) == 0
    assert get_tool("gmm-acc-stats")([
        "gmm-acc-stats", f"{d}/final.mdl", f"ark:{d}/feats.ark",
        f"ark:{tmp_path}/half.ark", f"{tmp_path}/den.acc"]) == 0
    assert get_tool("gmm-get-stats-deriv")([
        "gmm-get-stats-deriv", f"{d}/final.mdl", f"{tmp_path}/num.acc",
        f"{tmp_path}/den.acc", f"{tmp_path}/num.acc",
        f"{tmp_path}/deriv.acc"]) == 0
    from kaldi_tpu.gmm.mle import AccumAmDiagGmm
    der = kaldi_io.read_kaldi_object(AccumAmDiagGmm.read,
                                     f"{tmp_path}/deriv.acc")
    assert any(np.abs(a.mean_accs).max() > 0 for a in der.accs)


def test_twofeats(env, tmp_path):
    d = env["d"]
    # second stream == first stream: stats match plain gmm-acc-stats
    assert get_tool("gmm-acc-stats-twofeats")([
        "gmm-acc-stats-twofeats", f"{d}/final.mdl",
        f"ark:{d}/feats.ark", f"ark:{d}/feats.ark",
        f"ark:{d}/post.ark", f"{tmp_path}/two.acc"]) == 0
    assert get_tool("gmm-acc-stats")([
        "gmm-acc-stats", f"{d}/final.mdl", f"ark:{d}/feats.ark",
        f"ark:{d}/post.ark", f"{tmp_path}/one.acc"]) == 0
    from kaldi_tpu.gmm.mle import AccumAmDiagGmm
    a = kaldi_io.read_kaldi_object(AccumAmDiagGmm.read,
                                   f"{tmp_path}/two.acc")
    b = kaldi_io.read_kaldi_object(AccumAmDiagGmm.read,
                                   f"{tmp_path}/one.acc")
    for pa, pb in zip(a.accs, b.accs):
        np.testing.assert_allclose(pa.occupancy, pb.occupancy,
                                   rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(pa.mean_accs, pb.mean_accs,
                                   rtol=1e-3, atol=1e-4)
    # global variant sanity
    allx = np.concatenate(list(env["tf"].values()))
    from kaldi_tpu.gmm.diag_gmm import DiagGmm
    rng = np.random.default_rng(0)
    ubm = DiagGmm(3, allx.shape[1])
    ubm.set_from_means_and_vars(
        np.ones(3) / 3, allx[rng.choice(len(allx), 3, replace=False)],
        np.tile(allx.var(0) + 1e-3, (3, 1)))
    ubm.compute_gconsts()
    kaldi_io.write_kaldi_object(ubm.write, f"{tmp_path}/ubm")
    assert get_tool("gmm-global-acc-stats-twofeats")([
        "gmm-global-acc-stats-twofeats", f"{tmp_path}/ubm",
        f"ark:{d}/feats.ark", f"ark:{d}/feats.ark",
        f"{tmp_path}/g.acc"]) == 0
    from kaldi_tpu.gmm.mle import AccumDiagGmm
    g = kaldi_io.read_kaldi_object(AccumDiagGmm.read,
                                   f"{tmp_path}/g.acc")
    assert g.occupancy.sum() == pytest.approx(allx.shape[0], rel=1e-5)


def test_fgmm_merge_and_init_from_accs(env, tmp_path):
    d = env["d"]
    allx = np.concatenate(list(env["tf"].values())).astype(np.float64)
    from kaldi_tpu.gmm.full_gmm import FullGmm
    rng = np.random.default_rng(1)
    gmms = []
    for k in (2, 3):
        g = FullGmm(k, allx.shape[1])
        sel = allx[rng.choice(len(allx), k, replace=False)]
        g.set_from_means_and_covars(
            np.ones(k) / k, sel,
            np.stack([np.cov(allx.T) + 1e-2 * np.eye(allx.shape[1])] * k))
        g.compute_gconsts()
        path = f"{tmp_path}/g{k}.ubm"
        kaldi_io.write_kaldi_object(g.write, path)
        gmms.append((k, path, g))
    assert get_tool("fgmm-global-merge")([
        "fgmm-global-merge", f"{tmp_path}/merged.ubm",
        f"{tmp_path}/sizes.txt", gmms[0][1], gmms[1][1]]) == 0
    merged = kaldi_io.read_kaldi_object(FullGmm.read,
                                        f"{tmp_path}/merged.ubm")
    assert merged.num_gauss == 5
    assert open(f"{tmp_path}/sizes.txt").read().split() == ["2", "3"]
    assert merged.weights.sum() == pytest.approx(1.0, abs=1e-5)
    # init-from-accs: accumulate against merged, re-init, moments match
    assert get_tool("fgmm-global-acc-stats")([
        "fgmm-global-acc-stats", f"{tmp_path}/merged.ubm",
        f"ark:{d}/feats.ark", f"{tmp_path}/f.acc"]) == 0
    assert get_tool("fgmm-global-init-from-accs")([
        "fgmm-global-init-from-accs", f"{tmp_path}/f.acc", "5",
        f"{tmp_path}/init.ubm"]) == 0
    init = kaldi_io.read_kaldi_object(FullGmm.read,
                                      f"{tmp_path}/init.ubm")
    assert 1 <= init.num_gauss <= 5
    assert np.isfinite(init.log_likelihood(
        allx[:50].astype(np.float32))).all()


def test_global_lvtln_and_probes(env, tmp_path):
    d = env["d"]
    allx = np.concatenate(list(env["tf"].values()))
    from kaldi_tpu.gmm.diag_gmm import DiagGmm
    rng = np.random.default_rng(2)
    ubm = DiagGmm(4, allx.shape[1])
    ubm.set_from_means_and_vars(
        np.ones(4) / 4, allx[rng.choice(len(allx), 4, replace=False)],
        np.tile(allx.var(0) + 1e-3, (4, 1)))
    ubm.compute_gconsts()
    kaldi_io.write_kaldi_object(ubm.write, f"{tmp_path}/ubm")
    assert get_tool("gmm-init-lvtln")([
        "gmm-init-lvtln", f"--dim={allx.shape[1]}", "--num-classes=3",
        "--default-class=1", f"{tmp_path}/lvtln"]) == 0
    assert get_tool("gmm-global-est-lvtln-trans")([
        "gmm-global-est-lvtln-trans", f"{tmp_path}/ubm",
        f"{tmp_path}/lvtln", f"ark:{d}/feats.ark",
        f"ark:{tmp_path}/trans.ark", f"ark:{tmp_path}/warp.ark"]) == 0
    trans = dict(SequentialTableReader("matrix",
                                       f"ark:{tmp_path}/trans.ark"))
    assert len(trans) == len(env["tf"])
    # fstrand emits a readable FST
    assert get_tool("fstrand")([
        "fstrand", "--seed=7", f"{tmp_path}/r.fst"]) == 0
    from kaldi_tpu.fstext.openfst_io import read_fst_file
    fst = read_fst_file(f"{tmp_path}/r.fst")
    assert fst.num_states >= 2
    # accelerator probes run (result depends on environment)
    assert get_tool("cuda-compiled")(["cuda-compiled"]) == 0
    rc = get_tool("cuda-gpu-available")(["cuda-gpu-available"])
    assert rc in (0, 1)
    # pfile rows
    assert get_tool("build-pfile-from-ali")([
        "build-pfile-from-ali", f"{d}/final.mdl", f"ark:{d}/ali.ark",
        f"ark:{d}/feats.ark", f"{tmp_path}/p.pfile"]) == 0
    lines = open(f"{tmp_path}/p.pfile").read().splitlines()
    assert lines and len(lines[0].split()) == 2 + allx.shape[1] + 1
