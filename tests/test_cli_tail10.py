"""Round-3 CLI tail batch 8: gmm-global/fgmm tails, signed-posterior
accumulation, gselect copy, transform extension (parity: src/gmmbin,
src/bin)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from kaldi_tpu.base import io_funcs as iof
from kaldi_tpu.cli import get_tool
from kaldi_tpu.util import kaldi_io
from kaldi_tpu.util.table import SequentialTableReader, TableWriter


@pytest.fixture()
def dubm(tmp_path):
    from kaldi_tpu.gmm.diag_gmm import DiagGmm
    rng = np.random.default_rng(0)
    g = DiagGmm(4, 3)
    g.set_from_means_and_vars(np.ones(4) / 4,
                              rng.normal(scale=2.0, size=(4, 3)),
                              np.ones((4, 3)))
    kaldi_io.write_kaldi_object(g.write, f"{tmp_path}/dubm")
    x = (g.get_means()[rng.integers(0, 4, 60)]
         + 0.4 * rng.normal(size=(60, 3))).astype(np.float32)
    with TableWriter("matrix", f"ark:{tmp_path}/f.ark") as w:
        w.write("u1", x[:30])
        w.write("u2", x[30:])
    return g, x


def test_global_sum_copy_likes(tmp_path, dubm):
    g, x = dubm
    rc = get_tool("gmm-global-acc-stats")([
        "gmm-global-acc-stats", f"{tmp_path}/dubm",
        f"ark:{tmp_path}/f.ark", f"{tmp_path}/1.acc"])
    assert rc == 0
    rc = get_tool("gmm-global-sum-accs")([
        "gmm-global-sum-accs", f"{tmp_path}/sum.acc",
        f"{tmp_path}/1.acc", f"{tmp_path}/1.acc"])
    assert rc == 0
    from kaldi_tpu.gmm.mle import AccumDiagGmm
    a1 = kaldi_io.read_kaldi_object(AccumDiagGmm.read,
                                    f"{tmp_path}/1.acc")
    a2 = kaldi_io.read_kaldi_object(AccumDiagGmm.read,
                                    f"{tmp_path}/sum.acc")
    np.testing.assert_allclose(a2.occupancy, 2 * a1.occupancy,
                               rtol=1e-6)
    rc = get_tool("gmm-global-copy")([
        "gmm-global-copy", "--binary=false", f"{tmp_path}/dubm",
        f"{tmp_path}/dubm_txt"])
    assert rc == 0
    from kaldi_tpu.gmm.diag_gmm import DiagGmm
    g2 = kaldi_io.read_kaldi_object(DiagGmm.read, f"{tmp_path}/dubm_txt")
    np.testing.assert_allclose(g2.log_likelihood(x[:5]),
                               g.log_likelihood(x[:5]), rtol=1e-4,
                               atol=1e-3)
    rc = get_tool("gmm-global-get-frame-likes")([
        "gmm-global-get-frame-likes", f"{tmp_path}/dubm",
        f"ark:{tmp_path}/f.ark", f"ark:{tmp_path}/ll.ark"])
    assert rc == 0
    ll = dict(SequentialTableReader("vector", f"ark:{tmp_path}/ll.ark"))
    np.testing.assert_allclose(ll["u1"], g.log_likelihood(x[:30]),
                               atol=1e-3)


def test_global_est_fmllr(tmp_path, dubm):
    g, x = dubm
    # shift the features: the estimated transform must undo it
    # (enough frames to clear the tool's 100-frame min-count)
    x = np.tile(x, (3, 1))
    with TableWriter("matrix", f"ark:{tmp_path}/sh.ark") as w:
        w.write("u1", x + np.asarray([1.0, -0.5, 0.0],
                                     np.float32))
    rc = get_tool("gmm-global-est-fmllr")([
        "gmm-global-est-fmllr", f"{tmp_path}/dubm",
        f"ark:{tmp_path}/sh.ark", f"ark:{tmp_path}/tr.ark"])
    assert rc == 0
    W = np.asarray(dict(SequentialTableReader(
        "matrix", f"ark:{tmp_path}/tr.ark"))["u1"])
    assert W.shape == (3, 4)
    from kaldi_tpu.transform.fmllr import apply_affine_transform
    shifted = x + np.asarray([1.0, -0.5, 0.0], np.float32)
    adapted = apply_affine_transform(shifted, W)
    # the fMLLR objective includes the log-determinant Jacobian term
    logdet = float(np.linalg.slogdet(W[:, :3].astype(np.float64))[1])
    obj_sh = g.log_likelihood(shifted).mean()
    obj_ad = g.log_likelihood(adapted.astype(np.float32)).mean() \
        + logdet
    assert obj_ad > obj_sh
    # and the estimated bias counteracts the injected shift
    assert W[0, 3] < 0 and W[1, 3] > 0


def test_fgmm_sum_and_to_gmm(tmp_path, dubm):
    g, x = dubm
    rc = get_tool("gmm-global-to-fgmm")([
        "gmm-global-to-fgmm", f"{tmp_path}/dubm", f"{tmp_path}/fubm"])
    assert rc == 0
    rc = get_tool("fgmm-global-acc-stats")([
        "fgmm-global-acc-stats", f"{tmp_path}/fubm",
        f"ark:{tmp_path}/f.ark", f"{tmp_path}/1.facc"])
    assert rc == 0
    rc = get_tool("fgmm-global-sum-accs")([
        "fgmm-global-sum-accs", f"{tmp_path}/sum.facc",
        f"{tmp_path}/1.facc", f"{tmp_path}/1.facc"])
    assert rc == 0
    with kaldi_io.input_stream(f"{tmp_path}/1.facc") as f:
        a1 = dict(np.load(f))
    with kaldi_io.input_stream(f"{tmp_path}/sum.facc") as f:
        a2 = dict(np.load(f))
    np.testing.assert_allclose(a2["occupancy"], 2 * a1["occupancy"],
                               rtol=1e-6)
    rc = get_tool("fgmm-global-to-gmm")([
        "fgmm-global-to-gmm", f"{tmp_path}/fubm", f"{tmp_path}/back"])
    assert rc == 0
    from kaldi_tpu.gmm.diag_gmm import DiagGmm
    back = kaldi_io.read_kaldi_object(DiagGmm.read, f"{tmp_path}/back")
    np.testing.assert_allclose(back.get_means(), g.get_means(),
                               atol=1e-4)


def test_copy_gselect(tmp_path):
    with TableWriter("int-vector-vector", f"ark:{tmp_path}/g.ark") as w:
        w.write("u1", [[3, 1, 2], [0, 2, 1]])
    rc = get_tool("copy-gselect")([
        "copy-gselect", "--n=2", f"ark:{tmp_path}/g.ark",
        f"ark:{tmp_path}/o.ark"])
    assert rc == 0
    out = dict(SequentialTableReader("int-vector-vector",
                                     f"ark:{tmp_path}/o.ark"))["u1"]
    assert [list(r) for r in out] == [[3, 1], [0, 2]]


def test_gmm_acc_stats2(tmp_path):
    from test_mono_e2e import FS, make_corpus
    from kaldi_tpu.cli.gmm_tools import write_am_gmm
    from kaldi_tpu.decoder.graph import Lang, TrainingGraphCompiler
    from kaldi_tpu.feat.frontend import MfccOptions, OfflineFeature
    from kaldi_tpu.feat.window import FrameExtractionOptions
    from kaldi_tpu.recipes.mono import (TrainMonoOptions, _align_all,
                                        train_mono)
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
    compiler = TrainingGraphCompiler(sys_.tm, sys_.tree, lang)
    graphs = {u: compiler.compile(train_txt[u]) for u in tf}
    ali = _align_all(sys_, graphs, tf, 10.0, 0.1, 1.0)
    write_am_gmm(f"{tmp_path}/final.mdl", sys_.tm, sys_.am)
    with TableWriter("matrix", f"ark:{tmp_path}/feats.ark") as w:
        for u in sorted(tf):
            w.write(u, tf[u])
    # signed posteriors: +1 on the aligned tid, -0.5 on tid 1
    with TableWriter("posterior", f"ark:{tmp_path}/post.ark") as w:
        for u, a in ali.items():
            w.write(u, [[(int(t), 1.0), (1, -0.5)] for t in a])
    rc = get_tool("gmm-acc-stats2")([
        "gmm-acc-stats2", f"{tmp_path}/final.mdl",
        f"ark:{tmp_path}/feats.ark", f"ark:{tmp_path}/post.ark",
        f"{tmp_path}/num.acc", f"{tmp_path}/den.acc"])
    assert rc == 0
    from kaldi_tpu.gmm.mle import AccumAmDiagGmm
    num = kaldi_io.read_kaldi_object(AccumAmDiagGmm.read,
                                     f"{tmp_path}/num.acc")
    den = kaldi_io.read_kaldi_object(AccumAmDiagGmm.read,
                                     f"{tmp_path}/den.acc")
    T = sum(f.shape[0] for f in tf.values())
    assert num.total_frames == pytest.approx(T, rel=1e-6)
    assert den.total_frames == pytest.approx(0.5 * T, rel=1e-6)


def test_extend_transform_dim(tmp_path):
    mat = np.asarray([[1.0, 2.0, 0.5], [3.0, 4.0, -0.5]])  # affine 2->2
    kaldi_io.write_kaldi_object(
        lambda s, b: iof.write_matrix(s, b, mat), f"{tmp_path}/t")
    rc = get_tool("extend-transform-dim")([
        "extend-transform-dim", "--new-dimension=4", f"{tmp_path}/t",
        f"{tmp_path}/t4"])
    assert rc == 0
    out = np.asarray(kaldi_io.read_kaldi_object(iof.read_matrix,
                                                f"{tmp_path}/t4"))
    assert out.shape == (4, 5)
    x = np.asarray([1.0, -1.0, 2.0, 3.0])
    y = out[:, :4] @ x + out[:, 4]
    y_ref2 = mat[:, :2] @ x[:2] + mat[:, 2]
    np.testing.assert_allclose(y[:2], y_ref2, atol=1e-12)
    np.testing.assert_allclose(y[2:], x[2:], atol=1e-12)
