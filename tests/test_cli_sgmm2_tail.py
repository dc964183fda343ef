"""SGMM2 tail: gpost round-trip (stats match the direct route),
signed-posterior num/den stats, spkvecs from gposts, pre-transform +
fMLLR, EBW update, projection."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from kaldi_tpu.cli import get_tool
from kaldi_tpu.util import kaldi_io
from kaldi_tpu.util.table import SequentialTableReader, TableWriter

# reuse the sgmm2 module fixture
from test_cli_sgmm2 import sgmm2_env, _ensure_final_model  # noqa: F401


def _posts(d, tmp_path):
    assert get_tool("ali-to-post")([
        "ali-to-post", f"ark:{d}/ali.ark",
        f"ark:{tmp_path}/post.ark"]) == 0
    return f"ark:{tmp_path}/post.ark"


def test_gpost_roundtrip_stats(sgmm2_env, tmp_path):
    d = sgmm2_env["d"]
    _ensure_final_model(d)
    posts = _posts(d, tmp_path)
    assert get_tool("sgmm2-post-to-gpost")([
        "sgmm2-post-to-gpost", f"{d}/final.mdl", f"ark:{d}/feats.ark",
        posts, f"ark:{tmp_path}/gpost.ark"]) == 0
    assert get_tool("sgmm2-acc-stats-gpost")([
        "sgmm2-acc-stats-gpost", f"{d}/final.mdl",
        f"ark:{d}/feats.ark", f"ark:{tmp_path}/gpost.ark",
        f"{tmp_path}/g.acc"]) == 0
    assert get_tool("sgmm2-acc-stats")([
        "sgmm2-acc-stats", f"{d}/final.mdl", f"ark:{d}/feats.ark",
        posts, f"{tmp_path}/p.acc"]) == 0
    from kaldi_tpu.sgmm2.am_sgmm2 import MleAmSgmm2Accs
    a = kaldi_io.read_kaldi_object(MleAmSgmm2Accs.read,
                                   f"{tmp_path}/g.acc")
    b = kaldi_io.read_kaldi_object(MleAmSgmm2Accs.read,
                                   f"{tmp_path}/p.acc")
    # gposts round the posteriors to float32
    assert np.allclose(a.gamma, b.gamma, rtol=1e-4, atol=1e-4)
    assert np.allclose(a.y, b.y, rtol=1e-3, atol=1e-3)
    # the gpost stats drive an estimation step
    assert get_tool("sgmm2-est")([
        "sgmm2-est", f"{d}/final.mdl", f"{tmp_path}/g.acc",
        f"{tmp_path}/g.mdl"]) == 0


def test_acc_stats2_and_ebw(sgmm2_env, tmp_path):
    d = sgmm2_env["d"]
    _ensure_final_model(d)
    posts = _posts(d, tmp_path)
    # signed posts: original (positive) plus scaled negative copy
    from kaldi_tpu.hmm.posterior import PosteriorHolder
    pos = dict(SequentialTableReader("posterior", posts))
    with TableWriter(PosteriorHolder(),
                     f"ark:{tmp_path}/signed.ark") as w:
        for u, post in pos.items():
            signed = [[(t, wgt)] + [(t, -0.5 * wgt)]
                      for frame in post for t, wgt in frame[:1]]
            # keep per-frame structure
            signed = [[(t, wgt), (t, -0.5 * wgt)]
                      for frame in post for t, wgt in frame[:1]]
            w.write(u, signed)
    assert get_tool("sgmm2-acc-stats2")([
        "sgmm2-acc-stats2", f"{d}/final.mdl", f"ark:{d}/feats.ark",
        f"ark:{tmp_path}/signed.ark", f"{tmp_path}/num.acc",
        f"{tmp_path}/den.acc"]) == 0
    from kaldi_tpu.sgmm2.am_sgmm2 import MleAmSgmm2Accs
    num = kaldi_io.read_kaldi_object(MleAmSgmm2Accs.read,
                                     f"{tmp_path}/num.acc")
    den = kaldi_io.read_kaldi_object(MleAmSgmm2Accs.read,
                                     f"{tmp_path}/den.acc")
    assert den.total_frames == pytest.approx(0.5 * num.total_frames,
                                             rel=1e-6)
    np.testing.assert_allclose(den.gamma, 0.5 * num.gamma,
                               rtol=1e-4, atol=1e-5)
    # EBW update runs and keeps the model decodable
    assert get_tool("sgmm2-est-ebw")([
        "sgmm2-est-ebw", f"{d}/final.mdl", f"{tmp_path}/num.acc",
        f"{tmp_path}/den.acc", f"{tmp_path}/ebw.mdl"]) == 0
    from kaldi_tpu.cli.sgmm2_tools import read_am_sgmm2
    _tm, am = read_am_sgmm2(f"{tmp_path}/ebw.mdl")
    rng = np.random.default_rng(0)
    x = rng.normal(size=(5, am.dim))
    assert np.isfinite(am.log_likes(x)).all()


def test_spkvecs_gpost(sgmm2_env, tmp_path):
    d = sgmm2_env["d"]
    _ensure_final_model(d)
    posts = _posts(d, tmp_path)
    assert get_tool("sgmm2-post-to-gpost")([
        "sgmm2-post-to-gpost", f"{d}/final.mdl", f"ark:{d}/feats.ark",
        posts, f"ark:{tmp_path}/gpost.ark"]) == 0
    assert get_tool("sgmm2-est-spkvecs-gpost")([
        "sgmm2-est-spkvecs-gpost", f"--spk2utt=ark,t:{d}/spk2utt",
        f"{d}/final.mdl", f"ark:{d}/feats.ark",
        f"ark:{tmp_path}/gpost.ark", f"ark:{tmp_path}/vecs.ark"]) == 0
    assert get_tool("sgmm2-est-spkvecs")([
        "sgmm2-est-spkvecs", f"--spk2utt=ark,t:{d}/spk2utt",
        f"{d}/final.mdl", f"ark:{d}/feats.ark", f"ark:{d}/ali.ark",
        f"ark:{tmp_path}/vecs_ali.ark"]) == 0
    vg = dict(SequentialTableReader("vector",
                                    f"ark:{tmp_path}/vecs.ark"))
    va = dict(SequentialTableReader("vector",
                                    f"ark:{tmp_path}/vecs_ali.ark"))
    assert set(vg) == set(va)
    for k in vg:
        np.testing.assert_allclose(vg[k], va[k], rtol=1e-2, atol=1e-3)


def test_prexform_fmllr_project(sgmm2_env, tmp_path):
    d = sgmm2_env["d"]
    _ensure_final_model(d)
    posts = _posts(d, tmp_path)
    from kaldi_tpu.cli.sgmm2_tools import read_am_sgmm2
    _tm, am0 = read_am_sgmm2(f"{d}/final.mdl")
    occs = np.full(am0.num_states, 100.0)
    from kaldi_tpu.base import io_funcs as iof
    kaldi_io.write_kaldi_object(
        lambda s, b: iof.write_vector(s, b, occs),
        f"{tmp_path}/occs.vec")
    assert get_tool("sgmm2-comp-prexform")([
        "sgmm2-comp-prexform", f"{d}/final.mdl",
        f"{tmp_path}/occs.vec", f"{tmp_path}/pre.mdl"]) == 0
    assert get_tool("sgmm2-est-fmllr")([
        "sgmm2-est-fmllr", f"--spk2utt=ark,t:{d}/spk2utt",
        "--fmllr-min-count=50", f"{tmp_path}/pre.mdl",
        f"ark:{d}/feats.ark", posts,
        f"ark:{tmp_path}/fmllr.ark"]) == 0
    xf = dict(SequentialTableReader("matrix",
                                    f"ark:{tmp_path}/fmllr.ark"))
    assert set(xf) == {"spk0", "spk1"}
    D = am0.dim
    for k, W in xf.items():
        assert W.shape == (D, D + 1)
        assert np.isfinite(W).all()
        # invertible linear part
        assert abs(np.linalg.det(np.asarray(W[:, :D],
                                            np.float64))) > 1e-6
    # projection to a sub-range of an identity "LDA" keeps loglikes
    # computable at the reduced dim
    full = np.eye(D)
    kaldi_io.write_kaldi_object(
        lambda s, b: iof.write_matrix(s, b, full),
        f"{tmp_path}/full.mat")
    keep = D - 2
    assert get_tool("sgmm2-project")([
        "sgmm2-project", f"--start-dim=0", f"--end-dim={keep}",
        f"{d}/final.mdl", f"{tmp_path}/full.mat",
        f"{tmp_path}/proj.mdl", f"{tmp_path}/proj.mat"]) == 0
    _tm2, am2 = read_am_sgmm2(f"{tmp_path}/proj.mdl")
    assert am2.dim == keep
    rng = np.random.default_rng(1)
    x = rng.normal(size=(4, keep))
    assert np.isfinite(am2.log_likes(x)).all()
    proj = kaldi_io.read_kaldi_object(iof.read_matrix,
                                      f"{tmp_path}/proj.mat")
    assert proj.shape == (keep, D)
