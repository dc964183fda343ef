"""Raw-space fMLLR (transform/fmllr_raw.py vs transform/fmllr-raw.cc):
the accumulated quadratic auxiliary must EXACTLY match the objective
computed directly from data (up to an F-independent constant), and the
row-wise update must improve it monotonically."""

import numpy as np
import pytest

from kaldi_tpu.gmm.diag_gmm import DiagGmm
from kaldi_tpu.transform.fmllr_raw import (FmllrRawAccs, FmllrRawOptions,
                                           apply_raw_fmllr)

D_RAW, SPLICE, D_MODEL = 3, 3, 6
D_FULL = D_RAW * SPLICE


def make_setup(seed=0):
    rng = np.random.default_rng(seed)
    # full LDA-like transform: random orthogonal + offset column
    Q, _ = np.linalg.qr(rng.normal(size=(D_FULL, D_FULL)))
    full = np.concatenate([Q, rng.normal(size=(D_FULL, 1)) * 0.1],
                          axis=1)
    gmm = DiagGmm(4, D_MODEL)
    means = rng.normal(size=(4, D_MODEL))
    variances = 0.5 + rng.random((4, D_MODEL))
    gmm.set_means_vars(means, variances) if hasattr(gmm, "set_means_vars") \
        else None
    gmm.means_invvars = (means / variances).astype(np.float64)
    gmm.inv_vars = (1.0 / variances).astype(np.float64)
    gmm.weights = np.full(4, 0.25)
    gmm.compute_gconsts() if hasattr(gmm, "compute_gconsts") else None
    T = 120
    spliced = rng.normal(size=(T, D_FULL)) * 1.5 + 0.3
    return full, gmm, spliced, rng


def accumulate(full, gmm, spliced):
    accs = FmllrRawAccs(D_RAW, D_MODEL, full)
    for t in range(spliced.shape[0]):
        accs.accumulate_for_gmm(gmm, spliced[t], 1.0)
    return accs


def direct_auxf(accs, full, gmm, spliced, F):
    """Objective from data with posteriors fixed at F=identity:
    sum_t [A.y - 0.5 B.y^2] + beta logdet(F_sq) where y = T
    splice(F s) + offset; rejected dims use A=0, B=1."""
    Tm = np.asarray(full[:, :D_FULL], np.float64)
    offset = np.asarray(full[:, D_FULL], np.float64)
    n = spliced.shape[0]
    tot = 0.0
    for t in range(n):
        s = spliced[t]
        z0 = Tm @ s + offset
        post = gmm.component_posteriors(z0[:D_MODEL])[0]
        A = post @ gmm.means_invvars
        B = post @ gmm.inv_vars
        # transformed raw frame, re-spliced
        fs = np.concatenate([
            F[:, :D_RAW] @ s[c * D_RAW:(c + 1) * D_RAW] + F[:, D_RAW]
            for c in range(SPLICE)])
        y = Tm @ fs + offset
        tot += A @ y[:D_MODEL] - 0.5 * B @ (y[:D_MODEL] ** 2)
        tot += -0.5 * (y[D_MODEL:] ** 2).sum()
    sign, logdet = np.linalg.slogdet(F[:, :D_RAW])
    return tot + n * SPLICE * logdet


class TestFmllrRaw:
    def test_auxf_matches_direct_objective(self):
        full, gmm, spliced, rng = make_setup()
        accs = accumulate(full, gmm, spliced)
        linear, quad = accs._simple_stats()
        F1 = np.concatenate([np.eye(D_RAW), np.zeros((D_RAW, 1))], 1)
        F2 = F1 + 0.1 * rng.normal(size=(D_RAW, D_RAW + 1))
        F3 = F1 - 0.2 * rng.normal(size=(D_RAW, D_RAW + 1))
        d12_stats = accs.auxf(linear, quad, F1) - accs.auxf(linear,
                                                            quad, F2)
        d12_direct = direct_auxf(accs, full, gmm, spliced, F1) - \
            direct_auxf(accs, full, gmm, spliced, F2)
        assert d12_stats == pytest.approx(d12_direct, rel=1e-8)
        d13_stats = accs.auxf(linear, quad, F1) - accs.auxf(linear,
                                                            quad, F3)
        d13_direct = direct_auxf(accs, full, gmm, spliced, F1) - \
            direct_auxf(accs, full, gmm, spliced, F3)
        assert d13_stats == pytest.approx(d13_direct, rel=1e-8)

    def test_update_improves_and_is_monotone(self):
        full, gmm, spliced, _ = make_setup(1)
        accs = accumulate(full, gmm, spliced)
        linear, quad = accs._simple_stats()
        F0 = np.concatenate([np.eye(D_RAW), np.zeros((D_RAW, 1))], 1)
        prev = accs.auxf(linear, quad, F0)
        F, impr, count = accs.update(FmllrRawOptions(min_count=10,
                                                     num_iters=8))
        assert count == pytest.approx(spliced.shape[0])
        assert impr > 0
        assert accs.auxf(linear, quad, F) == pytest.approx(prev + impr,
                                                           rel=1e-6)
        # the direct objective improves by the same amount
        d = direct_auxf(accs, full, gmm, spliced, F) - \
            direct_auxf(accs, full, gmm, spliced, F0)
        assert d == pytest.approx(impr, rel=1e-6)

    def test_batch_accumulation_equals_per_frame(self):
        full, gmm, spliced, _ = make_setup(2)
        a1 = accumulate(full, gmm, spliced)
        a2 = FmllrRawAccs(D_RAW, D_MODEL, full)
        Tm, off = a2.T, a2.offset
        z = spliced @ Tm.T + off
        post = gmm.component_posteriors(z[:, :D_MODEL])
        A = post @ gmm.means_invvars
        B = post @ gmm.inv_vars
        a2.accumulate_batch(A, B, post.sum(axis=1), spliced)
        np.testing.assert_allclose(a2.Q, a1.Q, rtol=1e-10)
        np.testing.assert_allclose(a2.S, a1.S, rtol=1e-10)

    def test_min_count_guard(self):
        full, gmm, spliced, _ = make_setup(3)
        accs = accumulate(full, gmm, spliced[:5])
        F, impr, _ = accs.update(FmllrRawOptions(min_count=1000))
        np.testing.assert_array_equal(
            F, np.concatenate([np.eye(D_RAW), np.zeros((D_RAW, 1))], 1))
        assert impr == 0.0

    def test_apply(self):
        F = np.asarray([[2.0, 0, 0, 1.0], [0, 1, 0, 0], [0, 0, 1, -1]])
        x = np.ones((2, 3))
        y = apply_raw_fmllr(x, F)
        np.testing.assert_allclose(y[0], [3.0, 1.0, 0.0])


class TestCliFmllrRaw:
    @pytest.fixture(scope="class")
    def env(self, tmp_path_factory):
        from kaldi_tpu.cli.gmm_tools import write_am_gmm
        from kaldi_tpu.gmm.am_diag_gmm import AmDiagGmm
        from kaldi_tpu.hmm.topology import HmmTopology
        from kaldi_tpu.hmm.transition_model import TransitionModel
        from kaldi_tpu.tree import monophone_context_dependency
        from kaldi_tpu.util.table import TableWriter
        d = tmp_path_factory.mktemp("fmllr_raw_cli")
        rng = np.random.default_rng(0)
        phones = [1, 2]
        topo = HmmTopology.three_state(phones)
        tree = monophone_context_dependency(phones, {p: 3 for p in phones})
        tm = TransitionModel(topo, tree)
        am = AmDiagGmm()
        for _ in range(tm.num_pdfs):
            g = DiagGmm(2, D_MODEL)
            means = rng.normal(size=(2, D_MODEL))
            variances = 0.5 + rng.random((2, D_MODEL))
            g.means_invvars = (means / variances).astype(np.float32)
            g.inv_vars = (1.0 / variances).astype(np.float32)
            g.weights = np.full(2, 0.5, np.float32)
            g.compute_gconsts()
            am.add_pdf(g)
        write_am_gmm(f"{d}/final.mdl", tm, am)
        Q, _ = np.linalg.qr(rng.normal(size=(D_FULL, D_FULL)))
        full = np.concatenate([Q, rng.normal(size=(D_FULL, 1)) * 0.1],
                              axis=1).astype(np.float32)
        from kaldi_tpu.util import kaldi_io
        from kaldi_tpu.base import io_funcs as iof
        kaldi_io.write_kaldi_object(
            lambda s, b: iof.write_matrix(s, b, full), f"{d}/full.mat")
        # spliced feats + a 1-best tid posterior per frame
        T = 150
        with TableWriter("matrix", f"ark:{d}/feats.ark") as w, \
             open(f"{d}/post.txt", "w") as pf:
            for u in ("utt1", "utt2"):
                w.write(u, rng.normal(size=(T, D_FULL)).astype(
                    np.float32) * 1.2)
                tids = rng.integers(1, tm.num_transition_ids + 1, T)
                pf.write(u + " " + " ".join(
                    f"[ {int(t)} 1.0 ]" for t in tids) + "\n")
        with open(f"{d}/spk2utt", "w") as f:
            f.write("spk1 utt1 utt2\n")
        return str(d)

    def test_cli_per_utt_and_per_spk(self, env, tmp_path):
        from kaldi_tpu.cli import get_tool
        from kaldi_tpu.util.table import SequentialTableReader
        rc = get_tool("gmm-est-fmllr-raw")([
            "gmm-est-fmllr-raw", "--raw-feat-dim=3",
            "--fmllr-min-count=20", f"{env}/final.mdl",
            f"{env}/full.mat", f"ark:{env}/feats.ark",
            f"ark,t:{env}/post.txt", f"ark:{tmp_path}/t_utt.ark"])
        assert rc == 0
        t_utt = dict(SequentialTableReader(
            "matrix", f"ark:{tmp_path}/t_utt.ark"))
        assert set(t_utt) == {"utt1", "utt2"}
        for F in t_utt.values():
            assert F.shape == (D_RAW, D_RAW + 1)
            assert not np.allclose(F[:, :D_RAW], np.eye(D_RAW))
        rc = get_tool("gmm-est-fmllr-raw")([
            "gmm-est-fmllr-raw", "--raw-feat-dim=3",
            f"--spk2utt=ark,t:{env}/spk2utt", "--fmllr-min-count=20",
            f"{env}/final.mdl", f"{env}/full.mat",
            f"ark:{env}/feats.ark", f"ark,t:{env}/post.txt",
            f"ark:{tmp_path}/t_spk.ark"])
        assert rc == 0
        t_spk = dict(SequentialTableReader(
            "matrix", f"ark:{tmp_path}/t_spk.ark"))
        assert set(t_spk) == {"spk1"}

    def test_cli_gpost_agrees(self, env, tmp_path):
        from kaldi_tpu.cli import get_tool
        from kaldi_tpu.util.table import SequentialTableReader
        # gposts must be computed on the PROJECTED (model-space) feats
        from kaldi_tpu.base import io_funcs as iof
        from kaldi_tpu.util import kaldi_io
        from kaldi_tpu.util.table import TableWriter
        full = kaldi_io.read_kaldi_object(
            iof.read_matrix, f"{env}/full.mat")
        with TableWriter("matrix", f"ark:{tmp_path}/proj.ark") as w:
            for u, m in SequentialTableReader(
                    "matrix", f"ark:{env}/feats.ark"):
                z = np.asarray(m) @ full[:, :D_FULL].T + full[:, D_FULL]
                w.write(u, z[:, :D_MODEL].astype(np.float32))
        rc = get_tool("gmm-post-to-gpost")([
            "gmm-post-to-gpost", f"{env}/final.mdl",
            f"ark:{tmp_path}/proj.ark", f"ark,t:{env}/post.txt",
            f"ark:{tmp_path}/gpost.ark"])
        assert rc == 0
        rc = get_tool("gmm-est-fmllr-raw-gpost")([
            "gmm-est-fmllr-raw-gpost", "--raw-feat-dim=3",
            "--fmllr-min-count=20", f"{env}/final.mdl",
            f"{env}/full.mat", f"ark:{env}/feats.ark",
            f"ark:{tmp_path}/gpost.ark", f"ark:{tmp_path}/t_g.ark"])
        assert rc == 0
        rc = get_tool("gmm-est-fmllr-raw")([
            "gmm-est-fmllr-raw", "--raw-feat-dim=3",
            "--fmllr-min-count=20", f"{env}/final.mdl",
            f"{env}/full.mat", f"ark:{env}/feats.ark",
            f"ark,t:{env}/post.txt", f"ark:{tmp_path}/t_p.ark"])
        assert rc == 0
        tg = dict(SequentialTableReader("matrix",
                                        f"ark:{tmp_path}/t_g.ark"))
        tp = dict(SequentialTableReader("matrix",
                                        f"ark:{tmp_path}/t_p.ark"))
        for k in tp:
            np.testing.assert_allclose(tg[k], tp[k], rtol=5e-2,
                                       atol=5e-3)
