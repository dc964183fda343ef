"""gpost + fMLLR CLI tail: gmm-post-to-gpost round-trip, fMLLR from
gposts == fMLLR from the posteriors they came from, global (UBM)
fMLLR with gselect, basis-fMLLR accs/training split."""

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
    d = tmp_path_factory.mktemp("transform2")
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
    utts = sorted(tf)
    with open(f"{d}/spk2utt", "w") as f:
        f.write("spkA " + " ".join(utts[:4]) + "\n")
        f.write("spkB " + " ".join(utts[4:]) + "\n")
    return dict(d=str(d), sys=sys_, tf=tf, ali=ali)


def test_post_to_gpost_and_fmllr_gpost(env, tmp_path):
    d = env["d"]
    assert get_tool("gmm-post-to-gpost")([
        "gmm-post-to-gpost", f"{d}/final.mdl", f"ark:{d}/feats.ark",
        f"ark:{d}/post.ark", f"ark:{tmp_path}/gpost.ark"]) == 0
    gposts = dict(SequentialTableReader("gauss-post",
                                        f"ark:{tmp_path}/gpost.ark"))
    u = sorted(env["tf"])[0]
    gp = gposts[u]
    assert len(gp) == env["tf"][u].shape[0]
    tm = env["sys"].tm
    am = env["sys"].am
    # each frame's entry: pdf of the alignment, gaussian posteriors
    # summing to the (unit) posterior weight
    for t, frame in enumerate(gp):
        assert len(frame) == 1
        pdf, vec = frame[0]
        assert pdf == tm.transition_id_to_pdf(int(env["ali"][u][t]))
        assert np.asarray(vec).sum() == pytest.approx(1.0, abs=1e-4)
    # fMLLR from gposts == fMLLR from the source posteriors
    assert get_tool("gmm-est-fmllr-gpost")([
        "gmm-est-fmllr-gpost", f"--spk2utt=ark,t:{d}/spk2utt",
        f"{d}/final.mdl", f"ark:{d}/feats.ark",
        f"ark:{tmp_path}/gpost.ark", f"ark:{tmp_path}/trans_g.ark"]) == 0
    assert get_tool("gmm-est-fmllr")([
        "gmm-est-fmllr", f"--spk2utt=ark,t:{d}/spk2utt",
        f"{d}/final.mdl", f"ark:{d}/feats.ark", f"ark:{d}/post.ark",
        f"ark:{tmp_path}/trans_p.ark"]) == 0
    tg = dict(SequentialTableReader("matrix",
                                    f"ark:{tmp_path}/trans_g.ark"))
    tp = dict(SequentialTableReader("matrix",
                                    f"ark:{tmp_path}/trans_p.ark"))
    assert set(tg) == {"spkA", "spkB"} and set(tp) == set(tg)
    for k in tg:
        # gposts carry float32-rounded posteriors; the iterative
        # row update amplifies that slightly
        np.testing.assert_allclose(tg[k], tp[k], rtol=5e-2, atol=5e-3)
        # a real (non-identity) transform was estimated
        D = tg[k].shape[0]
        assert not np.allclose(tg[k], np.concatenate(
            [np.eye(D), np.zeros((D, 1))], axis=1))


def test_fmllr_global_with_gselect(env, tmp_path):
    d = env["d"]
    # build a small UBM from the training features
    allx = np.concatenate(list(env["tf"].values()))
    from kaldi_tpu.gmm.diag_gmm import DiagGmm
    rng = np.random.default_rng(0)
    ubm = DiagGmm(4, allx.shape[1])
    sel = allx[rng.choice(len(allx), 4, replace=False)]
    var = allx.var(axis=0) + 1e-3
    ubm.set_from_means_and_vars(np.ones(4) / 4, sel,
                                np.tile(var, (4, 1)))
    kaldi_io.write_kaldi_object(ubm.write, f"{tmp_path}/ubm")
    assert get_tool("gmm-est-fmllr-global")([
        "gmm-est-fmllr-global", f"--spk2utt=ark,t:{d}/spk2utt",
        f"{tmp_path}/ubm", f"ark:{d}/feats.ark",
        f"ark:{tmp_path}/trans.ark"]) == 0
    trans = dict(SequentialTableReader("matrix",
                                       f"ark:{tmp_path}/trans.ark"))
    assert set(trans) == {"spkA", "spkB"}
    # gselect over ALL gaussians must reproduce the unrestricted run
    with TableWriter("int-vector-vector",
                     f"ark:{tmp_path}/gsel.ark") as w:
        for u, feats in env["tf"].items():
            w.write(u, [[0, 1, 2, 3]] * feats.shape[0])
    assert get_tool("gmm-est-fmllr-global")([
        "gmm-est-fmllr-global", f"--spk2utt=ark,t:{d}/spk2utt",
        f"--gselect=ark:{tmp_path}/gsel.ark", f"{tmp_path}/ubm",
        f"ark:{d}/feats.ark", f"ark:{tmp_path}/trans_sel.ark"]) == 0
    trans_sel = dict(SequentialTableReader(
        "matrix", f"ark:{tmp_path}/trans_sel.ark"))
    for k in trans:
        np.testing.assert_allclose(trans_sel[k], trans[k],
                                   rtol=1e-5, atol=1e-6)
    # restricting to one gaussian changes the result
    with TableWriter("int-vector-vector",
                     f"ark:{tmp_path}/gsel1.ark") as w:
        for u, feats in env["tf"].items():
            w.write(u, [[0]] * feats.shape[0])
    assert get_tool("gmm-est-fmllr-global")([
        "gmm-est-fmllr-global", f"--spk2utt=ark,t:{d}/spk2utt",
        f"--gselect=ark:{tmp_path}/gsel1.ark", f"{tmp_path}/ubm",
        f"ark:{d}/feats.ark", f"ark:{tmp_path}/trans_1.ark"]) == 0
    trans_1 = dict(SequentialTableReader(
        "matrix", f"ark:{tmp_path}/trans_1.ark"))
    assert any(not np.allclose(trans_1[k], trans[k], atol=1e-4)
               for k in trans)


def test_basis_fmllr_accs_split(env, tmp_path):
    """accs (posterior) + training (accs mode) == fused training;
    gpost accs match posterior accs; est-basis-fmllr-gpost matches
    the alignment-driven estimator."""
    d = env["d"]
    assert get_tool("gmm-basis-fmllr-accs")([
        "gmm-basis-fmllr-accs", f"--spk2utt=ark,t:{d}/spk2utt",
        f"{d}/final.mdl", f"ark:{d}/feats.ark", f"ark:{d}/post.ark",
        f"{tmp_path}/basis.accs"]) == 0
    from kaldi_tpu.transform.basis_fmllr import BasisFmllrAccus
    accs = kaldi_io.read_kaldi_object(BasisFmllrAccus.read,
                                      f"{tmp_path}/basis.accs")
    assert accs.beta > 0
    # gpost route gives the same scatter
    assert get_tool("gmm-post-to-gpost")([
        "gmm-post-to-gpost", f"{d}/final.mdl", f"ark:{d}/feats.ark",
        f"ark:{d}/post.ark", f"ark:{tmp_path}/gpost.ark"]) == 0
    assert get_tool("gmm-basis-fmllr-accs-gpost")([
        "gmm-basis-fmllr-accs-gpost", f"--spk2utt=ark,t:{d}/spk2utt",
        f"{d}/final.mdl", f"ark:{d}/feats.ark",
        f"ark:{tmp_path}/gpost.ark", f"{tmp_path}/basis_g.accs"]) == 0
    accs_g = kaldi_io.read_kaldi_object(BasisFmllrAccus.read,
                                        f"{tmp_path}/basis_g.accs")
    assert accs_g.beta == pytest.approx(accs.beta, rel=1e-5)
    # float32 gpost rounding: compare in relative Frobenius norm
    rel = np.linalg.norm(accs_g.grad_scatter - accs.grad_scatter) \
        / np.linalg.norm(accs.grad_scatter)
    assert rel < 1e-3, rel
    # training from accs (reference form)
    assert get_tool("gmm-basis-fmllr-training")([
        "gmm-basis-fmllr-training", "--basis-size=20",
        f"{d}/final.mdl", f"{tmp_path}/basis.mat",
        f"{tmp_path}/basis.accs"]) == 0
    # fused form over the same data
    assert get_tool("gmm-basis-fmllr-training")([
        "gmm-basis-fmllr-training", "--basis-size=20",
        f"--spk2utt=ark,t:{d}/spk2utt", f"{d}/final.mdl",
        f"ark:{d}/feats.ark", f"ark:{d}/ali.ark",
        f"{tmp_path}/basis_fused.mat"]) == 0
    from kaldi_tpu.base import io_funcs as iof
    from kaldi_tpu.cli.tail8_tools import _read_basis
    with kaldi_io.input_stream(f"{tmp_path}/basis.mat") as f:
        est1 = _read_basis(f, iof.init_input_stream(f))
    with kaldi_io.input_stream(f"{tmp_path}/basis_fused.mat") as f:
        est2 = _read_basis(f, iof.init_input_stream(f))
    assert len(est1.bases) == len(est2.bases) == 20
    # two training speakers -> the scatter has rank 2; bases beyond
    # that are arbitrary. The rank-2 principal subspace must agree
    # between the accs route and the fused alignment route.
    def proj(est):
        v = np.stack([b.reshape(-1) for b in est.bases[:2]])
        return v.T @ v
    assert np.linalg.norm(proj(est1) - proj(est2)) < 1e-2
    # per-speaker transforms via gposts
    assert get_tool("gmm-est-basis-fmllr-gpost")([
        "gmm-est-basis-fmllr-gpost", f"--spk2utt=ark,t:{d}/spk2utt",
        f"{d}/final.mdl", f"{tmp_path}/basis.mat",
        f"ark:{d}/feats.ark", f"ark:{tmp_path}/gpost.ark",
        f"ark:{tmp_path}/btrans.ark"]) == 0
    assert get_tool("gmm-est-basis-fmllr")([
        "gmm-est-basis-fmllr", f"--spk2utt=ark,t:{d}/spk2utt",
        f"{d}/final.mdl", f"{tmp_path}/basis.mat",
        f"ark:{d}/feats.ark", f"ark:{d}/ali.ark",
        f"ark:{tmp_path}/btrans_ali.ark"]) == 0
    bg = dict(SequentialTableReader("matrix",
                                    f"ark:{tmp_path}/btrans.ark"))
    ba = dict(SequentialTableReader("matrix",
                                    f"ark:{tmp_path}/btrans_ali.ark"))
    assert set(bg) == {"spkA", "spkB"}
    for k in bg:
        np.testing.assert_allclose(bg[k], ba[k], rtol=1e-3, atol=1e-4)
