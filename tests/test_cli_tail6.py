"""Round-3 CLI tail batch 4: gmm-init-model, mixup, gselect family,
convert-ali, MLLT CLI ladder, est-pca (parity: src/gmmbin, src/bin)."""

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
def mono_env(tmp_path_factory):
    """Mono system + a delta/triphone-ready environment on disk."""
    from test_mono_e2e import FS, make_corpus
    from kaldi_tpu.cli.gmm_tools import write_am_gmm
    from kaldi_tpu.decoder.graph import Lang, TrainingGraphCompiler
    from kaldi_tpu.feat.frontend import MfccOptions, OfflineFeature
    from kaldi_tpu.feat.window import FrameExtractionOptions
    from kaldi_tpu.recipes.mono import (TrainMonoOptions, _align_all,
                                        train_mono)
    d = tmp_path_factory.mktemp("tail6")
    train_txt, train_wav, _, _ = make_corpus(num_train=6, num_test=1)
    comp = OfflineFeature(MfccOptions(
        frame_opts=FrameExtractionOptions(samp_freq=FS, dither=0.0)))
    tf = dict(zip(train_wav, comp.compute_batch(list(train_wav.values()))))
    lang = Lang({"YES": [["Y"]], "NO": [["N"]]}, sil_phone="SIL",
                sil_prob=0.5)
    lang.make_topology()
    sys_ = train_mono(lang, tf, train_txt,
                      TrainMonoOptions(num_iters=3, totgauss=20,
                                       realign_iters=(1, 2)))
    compiler = TrainingGraphCompiler(sys_.tm, sys_.tree, lang)
    graphs = {u: compiler.compile(train_txt[u]) for u in tf}
    ali = _align_all(sys_, graphs, tf, 10.0, 0.1, 1.0)
    write_am_gmm(f"{d}/final.mdl", sys_.tm, sys_.am)
    kaldi_io.write_kaldi_object(sys_.tm.topo.write, f"{d}/topo")
    kaldi_io.write_kaldi_object(sys_.tree.write, f"{d}/tree")
    with TableWriter("matrix", f"ark:{d}/feats.ark") as w:
        for u in sorted(tf):
            w.write(u, tf[u])
    with TableWriter("int-vector", f"ark:{d}/ali.ark") as w:
        for u in sorted(ali):
            w.write(u, np.asarray(ali[u], np.int32))
    return dict(d=str(d), sys=sys_, tf=tf, ali=ali)


def test_gmm_init_model_from_tree_stats(mono_env):
    d = mono_env["d"]
    rc = get_tool("acc-tree-stats")([
        "acc-tree-stats", "--context-width=1", "--central-position=0",
        f"{d}/final.mdl", f"ark:{d}/feats.ark",
        f"ark:{d}/ali.ark", f"{d}/tree.acc"])
    assert rc == 0
    rc = get_tool("gmm-init-model")([
        "gmm-init-model", f"{d}/tree", f"{d}/tree.acc", f"{d}/topo",
        f"{d}/init.mdl"])
    assert rc == 0
    from kaldi_tpu.cli.gmm_tools import read_am_gmm
    tm, am = read_am_gmm(f"{d}/init.mdl")
    assert am.num_pdfs == mono_env["sys"].am.num_pdfs
    ll = am.log_likes_batch(next(iter(mono_env["tf"].values())))
    assert np.isfinite(ll).all()


def test_gmm_mixup(mono_env):
    d = mono_env["d"]
    from kaldi_tpu.cli.gmm_tools import read_am_gmm
    tm, am0 = read_am_gmm(f"{d}/final.mdl")
    occs = np.full(am0.num_pdfs, 500.0)
    kaldi_io.write_kaldi_object(
        lambda s, b: iof.write_vector(s, b, occs), f"{d}/occs")
    target = am0.num_gauss() + am0.num_pdfs
    rc = get_tool("gmm-mixup")([
        "gmm-mixup", f"--mixup={target}", f"{d}/final.mdl",
        f"{d}/occs", f"{d}/mixed.mdl"])
    assert rc == 0
    tm2, am2 = read_am_gmm(f"{d}/mixed.mdl")
    assert am2.num_gauss() > am0.num_gauss()
    u = sorted(mono_env["tf"])[0]
    ll0 = am0.log_likes_batch(mono_env["tf"][u])
    ll2 = am2.log_likes_batch(mono_env["tf"][u])
    # split-perturbed model stays close to the original scores
    assert np.abs(ll2 - ll0).max() < 1.0


def test_gselect_and_global_post(mono_env, tmp_path):
    d = mono_env["d"]
    from kaldi_tpu.gmm.diag_gmm import DiagGmm
    rng = np.random.default_rng(0)
    allx = np.concatenate(list(mono_env["tf"].values()))
    g = DiagGmm(8, allx.shape[1])
    sel = allx[rng.choice(len(allx), 8, replace=False)]
    g.set_from_means_and_vars(np.ones(8) / 8, sel,
                              np.var(allx, axis=0)[None].repeat(8, 0))
    kaldi_io.write_kaldi_object(g.write, f"{tmp_path}/dubm")
    rc = get_tool("gmm-gselect")([
        "gmm-gselect", "--n=3", f"{tmp_path}/dubm",
        f"ark:{d}/feats.ark", f"ark:{tmp_path}/gsel.ark"])
    assert rc == 0
    gsel = dict(SequentialTableReader("int-vector-vector",
                                      f"ark:{tmp_path}/gsel.ark"))
    u = sorted(mono_env["tf"])[0]
    assert len(gsel[u]) == mono_env["tf"][u].shape[0]
    assert all(len(r) == 3 for r in gsel[u])
    # top-1 of gselect == argmax of component loglikes
    ll = g.component_log_likes(mono_env["tf"][u].astype(np.float32))
    np.testing.assert_array_equal([r[0] for r in gsel[u]],
                                  ll.argmax(axis=1))
    rc = get_tool("gmm-global-get-post")([
        "gmm-global-get-post", "--n=2", f"{tmp_path}/dubm",
        f"ark:{d}/feats.ark", f"ark:{tmp_path}/post.ark"])
    assert rc == 0
    post = dict(SequentialTableReader("posterior",
                                      f"ark:{tmp_path}/post.ark"))[u]
    assert all(abs(sum(p for _, p in fr) - 1.0) < 1e-4 for fr in post)
    rc = get_tool("gmm-global-info")(["gmm-global-info",
                                      f"{tmp_path}/dubm"])
    assert rc == 0


def test_fgmm_tools(mono_env, tmp_path, capsys):
    d = mono_env["d"]
    from kaldi_tpu.gmm.full_gmm import FullGmm
    allx = np.concatenate(list(mono_env["tf"].values())).astype(
        np.float64)
    rng = np.random.default_rng(0)
    f = FullGmm(4, allx.shape[1])
    sel = allx[rng.choice(len(allx), 4, replace=False)]
    f.set_from_means_and_covars(
        np.ones(4) / 4, sel,
        np.stack([np.cov(allx.T) + 0.1 * np.eye(allx.shape[1])] * 4))
    kaldi_io.write_kaldi_object(f.write, f"{tmp_path}/fubm")
    rc = get_tool("fgmm-global-info")(["fgmm-global-info",
                                       f"{tmp_path}/fubm"])
    assert rc == 0
    assert "number of gaussians 4" in capsys.readouterr().out
    rc = get_tool("fgmm-global-copy")([
        "fgmm-global-copy", "--binary=false", f"{tmp_path}/fubm",
        f"{tmp_path}/fubm_txt"])
    assert rc == 0
    f2 = kaldi_io.read_kaldi_object(FullGmm.read, f"{tmp_path}/fubm_txt")
    x = allx[:5].astype(np.float32)
    np.testing.assert_allclose(f2.log_likelihood(x), f.log_likelihood(x),
                               rtol=1e-4, atol=1e-3)
    rc = get_tool("fgmm-gselect")([
        "fgmm-gselect", "--n=2", f"{tmp_path}/fubm",
        f"ark:{d}/feats.ark", f"ark:{tmp_path}/gsel.ark"])
    assert rc == 0


def test_convert_ali_identity(mono_env, tmp_path):
    """Converting within the SAME system must reproduce alignments
    that map to identical phone/pdf sequences frame by frame."""
    d = mono_env["d"]
    rc = get_tool("convert-ali")([
        "convert-ali", f"{d}/final.mdl", f"{d}/final.mdl", f"{d}/tree",
        f"ark:{d}/ali.ark", f"ark:{tmp_path}/conv.ark"])
    assert rc == 0
    sys_ = mono_env["sys"]
    conv = dict(SequentialTableReader("int-vector",
                                      f"ark:{tmp_path}/conv.ark"))
    assert len(conv) == len(mono_env["ali"])
    for u, old in mono_env["ali"].items():
        new = conv[u]
        assert len(new) == len(old)
        for a, b in zip(old, new):
            assert sys_.tm.transition_id_to_phone(int(a)) == \
                sys_.tm.transition_id_to_phone(int(b))
            assert sys_.tm.transition_id_to_pdf(int(a)) == \
                sys_.tm.transition_id_to_pdf(int(b))
            assert sys_.tm.is_self_loop(int(a)) == \
                sys_.tm.is_self_loop(int(b))


def test_convert_ali_mono_to_triphone(mono_env, tmp_path):
    """The real convert-ali use: mono alignments re-expressed under a
    TRIPHONE tree (same topology, different pdfs).  Phone sequence,
    durations, and self-loop structure must be preserved frame by
    frame, and the new pdfs must come from the new tree's context
    lookups."""
    from kaldi_tpu.cli.gmm_tools import write_am_gmm
    from kaldi_tpu.recipes.deltas import TrainDeltasOptions, \
        train_deltas
    d = mono_env["d"]
    sys_ = mono_env["sys"]
    import os
    import sys as _s
    _s.path.insert(0, os.path.dirname(__file__))
    from test_mono_e2e import make_corpus
    train_txt, _tw, _, _ = make_corpus(num_train=6, num_test=1)
    tri = train_deltas(sys_.lang, mono_env["tf"], train_txt, sys_,
                       mono_env["ali"],
                       TrainDeltasOptions(num_iters=2, totgauss=24,
                                          num_leaves=20,
                                          realign_iters=(1,)))
    write_am_gmm(f"{tmp_path}/tri.mdl", tri.tm, tri.am)
    kaldi_io.write_kaldi_object(tri.tree.write, f"{tmp_path}/tri.tree")
    rc = get_tool("convert-ali")([
        "convert-ali", f"{d}/final.mdl", f"{tmp_path}/tri.mdl",
        f"{tmp_path}/tri.tree", f"ark:{d}/ali.ark",
        f"ark:{tmp_path}/conv.ark"])
    assert rc == 0
    conv = dict(SequentialTableReader("int-vector",
                                      f"ark:{tmp_path}/conv.ark"))
    assert len(conv) == len(mono_env["ali"])
    for u, old in mono_env["ali"].items():
        new = conv[u]
        assert len(new) == len(old)
        for a, b in zip(old, new):
            assert sys_.tm.transition_id_to_phone(int(a)) == \
                tri.tm.transition_id_to_phone(int(b))
            assert sys_.tm.is_self_loop(int(a)) == \
                tri.tm.is_self_loop(int(b))
            assert sys_.tm.transition_id_to_hmm_state(int(a)) == \
                tri.tm.transition_id_to_hmm_state(int(b))
            assert 0 <= tri.tm.transition_id_to_pdf(int(b)) \
                < tri.tm.num_pdfs
def test_mllt_cli_ladder(mono_env, tmp_path):
    d = mono_env["d"]
    # posteriors from alignments
    rc = get_tool("ali-to-post")([
        "ali-to-post", f"ark:{d}/ali.ark", f"ark:{tmp_path}/post.ark"])
    assert rc == 0
    rc = get_tool("gmm-acc-mllt")([
        "gmm-acc-mllt", f"{d}/final.mdl", f"ark:{d}/feats.ark",
        f"ark:{tmp_path}/post.ark", f"{tmp_path}/mllt.acc"])
    assert rc == 0
    rc = get_tool("est-mllt")([
        "est-mllt", f"{tmp_path}/mllt.mat", f"{tmp_path}/mllt.acc"])
    assert rc == 0
    mat = np.asarray(kaldi_io.read_kaldi_object(
        iof.read_matrix, f"{tmp_path}/mllt.mat"))
    D = mono_env["sys"].am.dim
    assert mat.shape == (D, D)
    # estimated transform is well-conditioned and orientation-
    # preserving (volume need not be exactly preserved on tiny data)
    sign, logdet = np.linalg.slogdet(mat.astype(np.float64))
    assert sign > 0 and np.isfinite(logdet)
    assert np.linalg.cond(mat.astype(np.float64)) < 1e4


def test_est_pca(tmp_path):
    rng = np.random.default_rng(0)
    # anisotropic data: dominant direction along (1, 1, 0)
    basis = np.asarray([[1.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    z = rng.normal(size=(500, 2)) * np.asarray([3.0, 0.5])
    x = z @ basis + rng.normal(scale=0.05, size=(500, 3)) + 5.0
    with TableWriter("matrix", f"ark:{tmp_path}/f.ark") as w:
        w.write("u1", x.astype(np.float32))
    rc = get_tool("est-pca")([
        "est-pca", "--dim=1", "--normalize-mean=true",
        f"ark:{tmp_path}/f.ark", f"{tmp_path}/pca.mat"])
    assert rc == 0
    mat = np.asarray(kaldi_io.read_kaldi_object(
        iof.read_matrix, f"{tmp_path}/pca.mat"))
    assert mat.shape == (1, 4)
    v = mat[0, :3] / np.linalg.norm(mat[0, :3])
    target = np.asarray([1.0, 1.0, 0.0]) / np.sqrt(2)
    assert abs(abs(v @ target) - 1.0) < 0.01
    # mean-removal bias: projected mean ~ 0
    proj = x @ mat[0, :3] + mat[0, 3]
    assert abs(proj.mean()) < 0.1
