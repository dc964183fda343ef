"""Round-3 CLI tail batch 7: PLDA adaptation, cosine scoring, SDC
features, combined pitch tool (parity: ivectorbin/featbin tails)."""

import numpy as np
import pytest

from kaldi_tpu.base import io_funcs as iof
from kaldi_tpu.cli import get_tool
from kaldi_tpu.util import kaldi_io
from kaldi_tpu.util.table import SequentialTableReader, TableWriter


def _train_plda(tmp_path, rng, shift=0.0, scale=1.0):
    from kaldi_tpu.ivector.plda import train_plda
    D, S, NP = 4, 12, 20
    spk_means = rng.normal(scale=2.0, size=(S, D))
    classes = {}
    for s in range(S):
        x = spk_means[s] + 0.5 * rng.normal(size=(NP, D))
        classes[f"s{s}"] = scale * x + shift
    return train_plda(classes)


def test_plda_adapt_cli(tmp_path):
    rng = np.random.default_rng(0)
    plda = _train_plda(tmp_path, rng)
    kaldi_io.write_kaldi_object(plda.write, f"{tmp_path}/plda")
    # target domain: shifted + wider-variance i-vectors
    adapt = rng.normal(size=(200, 4)) * 3.0 + 2.0
    with TableWriter("vector", f"ark:{tmp_path}/adapt.ark") as w:
        for i, v in enumerate(adapt):
            w.write(f"a{i:03d}", v)
    rc = get_tool("ivector-adapt-plda")([
        "ivector-adapt-plda", f"{tmp_path}/plda",
        f"ark:{tmp_path}/adapt.ark", f"{tmp_path}/plda_ad"])
    assert rc == 0
    from kaldi_tpu.ivector.plda import Plda
    ad = kaldi_io.read_kaldi_object(Plda.read, f"{tmp_path}/plda_ad")
    assert ad.dim == plda.dim
    # adapted model sees the target data as closer-to-expected:
    # total variance of transformed adapt data is nearer I + psi
    def excess(m):
        X = np.stack([m.transform @ (v - m.mean) for v in adapt])
        S = np.cov(X.T)
        lam = np.linalg.eigvalsh(S)
        expect = 1.0 + m.psi
        return float(np.abs(np.sort(lam) - np.sort(expect)).sum())
    assert excess(ad) < excess(plda)
    # smoothing copy flattens psi spread
    rc = get_tool("ivector-copy-plda")([
        "ivector-copy-plda", "--smoothing=0.5", f"{tmp_path}/plda",
        f"{tmp_path}/plda_sm"])
    assert rc == 0
    sm = kaldi_io.read_kaldi_object(Plda.read, f"{tmp_path}/plda_sm")
    assert sm.psi.std() < plda.psi.std() + 1e-12


def test_dot_products(tmp_path, capsys):
    with TableWriter("vector", f"ark:{tmp_path}/a.ark") as w:
        w.write("x1", np.asarray([1.0, 0.0]))
        w.write("x2", np.asarray([0.0, 2.0]))
    with TableWriter("vector", f"ark:{tmp_path}/b.ark") as w:
        w.write("y1", np.asarray([3.0, 0.0]))
    (tmp_path / "trials").write_text("x1 y1\nx2 y1\nx9 y1\n")
    rc = get_tool("ivector-compute-dot-products")([
        "ivector-compute-dot-products", f"{tmp_path}/trials",
        f"ark:{tmp_path}/a.ark", f"ark:{tmp_path}/b.ark", "-"])
    assert rc == 0
    lines = [l.split() for l in capsys.readouterr().out.splitlines()
             if l.strip()]
    scores = {(a, b): float(s) for a, b, s in lines}
    assert scores[("x1", "y1")] == pytest.approx(1.0, abs=1e-5)
    assert scores[("x2", "y1")] == pytest.approx(0.0, abs=1e-5)
    assert ("x9", "y1") not in scores


def test_sdc(tmp_path):
    from kaldi_tpu.cli.tail9_tools import compute_sdc
    rng = np.random.default_rng(0)
    x = rng.normal(size=(30, 13)).astype(np.float32)
    out = compute_sdc(x, 7, 1, 3, 7)
    assert out.shape == (30, 7 * 8)
    # static part preserved
    np.testing.assert_allclose(out[:, :7], x[:, :7], atol=1e-6)
    # block i at frame t equals c[t+3i+1] - c[t+3i-1] (interior)
    t, i = 10, 2
    np.testing.assert_allclose(
        out[t, 7 * (i + 1):7 * (i + 2)],
        x[t + 3 * i + 1, :7] - x[t + 3 * i - 1, :7], atol=1e-5)
    with TableWriter("matrix", f"ark:{tmp_path}/f.ark") as w:
        w.write("u1", x)
    rc = get_tool("add-deltas-sdc")([
        "add-deltas-sdc", f"ark:{tmp_path}/f.ark",
        f"ark:{tmp_path}/o.ark"])
    assert rc == 0
    got = dict(SequentialTableReader("matrix",
                                     f"ark:{tmp_path}/o.ark"))["u1"]
    np.testing.assert_allclose(got, out, atol=1e-5)


def test_wav_perturb_speed_and_volume(tmp_path):
    from kaldi_tpu.feat.wave import WaveData
    fs = 8000.0
    t = np.arange(int(fs))
    wav = (2000 * np.sin(2 * np.pi * 200 * t / fs)).astype(np.float32)
    with TableWriter("wave", f"ark:{tmp_path}/w.ark") as w:
        w.write("u1", WaveData(fs, wav))
    rc = get_tool("wav-perturb-speed")([
        "wav-perturb-speed", "--utt-prefix=sp1.1-", "1.1",
        f"ark:{tmp_path}/w.ark", f"ark:{tmp_path}/sp.ark"])
    assert rc == 0
    out = dict(SequentialTableReader("wave", f"ark:{tmp_path}/sp.ark"))
    key = "sp1.1-u1"
    assert key in out
    y = out[key].channel(0)
    # speed 1.1 -> ~1/1.1 as long, sample rate unchanged
    assert abs(len(y) - len(wav) / 1.1) < 10
    assert out[key].samp_freq == fs
    # the 200 Hz tone becomes ~220 Hz: count zero crossings
    zc = int(((y[:-1] < 0) & (y[1:] >= 0)).sum())
    dur = len(y) / fs
    assert abs(zc / dur - 220) < 8, zc / dur
    rc = get_tool("wav-perturb-volume")([
        "wav-perturb-volume", "--factor=0.5", f"ark:{tmp_path}/w.ark",
        f"ark:{tmp_path}/v.ark"])
    assert rc == 0
    v = dict(SequentialTableReader("wave",
                                   f"ark:{tmp_path}/v.ark"))["u1"]
    # ark wave entries round-trip as PCM16: half-LSB tolerance
    np.testing.assert_allclose(v.channel(0), 0.5 * wav, atol=0.51)


def test_ivector_extract_online(tmp_path):
    from kaldi_tpu.gmm.diag_gmm import DiagGmm
    from kaldi_tpu.ivector.extractor import IvectorExtractor
    rng = np.random.default_rng(0)
    D, G = 4, 3
    ubm = DiagGmm(G, D)
    means = rng.normal(scale=2.0, size=(G, D))
    ubm.set_from_means_and_vars(np.ones(G) / G, means, np.ones((G, D)))
    ex = IvectorExtractor(ubm, 3)
    kaldi_io.write_kaldi_object(ex.write, f"{tmp_path}/ie")
    x = (means[rng.integers(0, G, 50)] + 1.0
         + 0.3 * rng.normal(size=(50, D))).astype(np.float32)
    with TableWriter("matrix", f"ark:{tmp_path}/f.ark") as w:
        w.write("u1", x)
    rc = get_tool("ivector-extract-online")([
        "ivector-extract-online", "--ivector-period=10",
        f"{tmp_path}/ie", f"ark:{tmp_path}/f.ark",
        f"ark:{tmp_path}/iv.ark"])
    assert rc == 0
    out = dict(SequentialTableReader("matrix",
                                     f"ark:{tmp_path}/iv.ark"))["u1"]
    assert out.shape == (5, 3)
    # the final online row equals the full-utterance MAP estimate
    full = ex.extract(x)
    np.testing.assert_allclose(out[-1], full, atol=1e-3)
    # early rows stay closer to the prior (offset, 0, 0) than late
    prior = np.asarray([ex.prior_offset, 0.0, 0.0])
    d0 = np.linalg.norm(out[0] - prior)
    d4 = np.linalg.norm(out[-1] - prior)
    assert d0 < d4 + 1e-6 or d0 < 1.5 * d4 + 1.0


def test_nnet3_discriminative_train_cli(tmp_path):
    """CLI fine-tuning loop: init an xconfig model, write feats/ali/
    den-lats, train with sMBR, verify the saved model's aligned-path
    scores moved up."""
    import os
    import sys as _sys
    _sys.path.insert(0, os.path.dirname(__file__))
    from test_discriminative import make_den_lattice
    from test_hmm_gmm import mono_system
    from kaldi_tpu.lat.kaldi_lattice import LatticeHolder
    topo, tree, tm = mono_system()
    # write the transition model as a bare model file
    kaldi_io.write_kaldi_object(tm.write, f"{tmp_path}/trans.mdl")
    D = 5
    (tmp_path / "net.xconfig").write_text(
        f"input name=input dim={D}\n"
        f"output-layer name=output dim={tm.num_pdfs} "
        "include-log-softmax=false\n")
    rc = get_tool("nnet3-init")([
        "nnet3-init", f"{tmp_path}/net.xconfig", f"{tmp_path}/mdl0"])
    assert rc == 0
    rng = np.random.default_rng(0)
    T = 8
    sl1, sl2 = tm.self_loop_of(1), tm.self_loop_of(6)
    with TableWriter("matrix", f"ark:{tmp_path}/feats.ark") as w:
        w.write("u1", rng.normal(size=(T, D)).astype(np.float32))
    with TableWriter("int-vector", f"ark:{tmp_path}/ali.ark") as w:
        w.write("u1", np.asarray([sl1] * T, np.int32))
    with TableWriter(LatticeHolder(), f"ark:{tmp_path}/lat.ark") as w:
        w.write("u1", make_den_lattice(tm, [sl2] * T, [sl1] * T,
                                       cost_b=0.3))
    rc = get_tool("nnet3-discriminative-train")([
        "nnet3-discriminative-train", "--criterion=smbr",
        "--num-epochs=8", "--learning-rate=0.05",
        "--acoustic-scale=1.0",
        f"{tmp_path}/mdl0", f"{tmp_path}/trans.mdl",
        f"ark:{tmp_path}/feats.ark", f"ark:{tmp_path}/ali.ark",
        f"ark:{tmp_path}/lat.ark", f"{tmp_path}/mdl1"])
    assert rc == 0
    # the fine-tuned model must now favor the ALIGNED pdf per frame
    rc = get_tool("nnet3-compute")([
        "nnet3-compute", f"{tmp_path}/mdl1",
        f"ark:{tmp_path}/feats.ark", f"ark:{tmp_path}/out.ark"])
    assert rc == 0
    out = dict(SequentialTableReader("matrix",
                                     f"ark:{tmp_path}/out.ark"))["u1"]
    pdf_good = tm.transition_id_to_pdf(sl1)
    pdf_bad = tm.transition_id_to_pdf(sl2)
    # sMBR raises the aligned PATH's total score relative to the
    # competitor (path-level margin, not per-frame dominance); the
    # den lattice handicaps the correct path by 0.3, so the model
    # must have opened a clear gap
    margin = float(out[:, pdf_good].sum() - out[:, pdf_bad].sum())
    assert margin > 0.3, margin


def test_combined_pitch_tool(tmp_path):
    from kaldi_tpu.feat.wave import WaveData
    rng = np.random.default_rng(0)
    fs = 8000.0
    t = np.arange(int(fs * 1.2)) / fs
    wav = (3000 * np.sin(2 * np.pi * 150 * t)
           + 100 * rng.standard_normal(len(t))).astype(np.float32)
    with TableWriter("wave", f"ark:{tmp_path}/w.ark") as w:
        w.write("u1", WaveData(fs, wav))
    rc = get_tool("compute-and-process-kaldi-pitch-feats")([
        "compute-and-process-kaldi-pitch-feats",
        f"--sample-frequency={fs}", f"ark:{tmp_path}/w.ark",
        f"ark:{tmp_path}/p.ark"])
    assert rc == 0
    out = dict(SequentialTableReader("matrix",
                                     f"ark:{tmp_path}/p.ark"))["u1"]
    assert out.shape[0] > 50 and out.shape[1] == 3
    assert np.isfinite(out).all()
