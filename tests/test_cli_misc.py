"""Smoke/behavior tests for the second CLI batch (transforms, VAD,
ivectors, rescoring, nnet3 init/compute)."""

import io
import os
import sys

import numpy as np
import pytest

from kaldi_tpu.base import io_funcs as iof
from kaldi_tpu.cli import TOOLS, get_tool
from kaldi_tpu.util import kaldi_io
from kaldi_tpu.util.table import SequentialTableReader, TableWriter


def run(tool, *args):
    rc = get_tool(tool)([tool] + [str(a) for a in args])
    assert rc == 0, f"{tool} failed"


def test_all_tools_resolve():
    for name in TOOLS:
        assert callable(get_tool(name)), name


def test_transform_feats_global_and_table(tmp_path):
    rng = np.random.default_rng(0)
    feats = {f"u{i}": rng.normal(size=(10, 4)).astype(np.float32)
             for i in range(3)}
    with TableWriter("matrix", f"ark:{tmp_path}/f.ark") as w:
        for k, v in feats.items():
            w.write(k, v)
    # global affine transform (D x D+1)
    W = np.concatenate([2 * np.eye(4), np.ones((4, 1))], axis=1
                       ).astype(np.float32)
    kaldi_io.write_kaldi_object(lambda s, b: iof.write_matrix(s, b, W),
                                f"{tmp_path}/trans.mat")
    run("transform-feats", f"{tmp_path}/trans.mat", f"ark:{tmp_path}/f.ark",
        f"ark:{tmp_path}/out.ark")
    got = dict(SequentialTableReader("matrix", f"ark:{tmp_path}/out.ark"))
    np.testing.assert_allclose(got["u0"], 2 * feats["u0"] + 1, atol=1e-5)


def test_vad_cli(tmp_path):
    feats = np.zeros((50, 5), np.float32)
    feats[10:20, 0] = 15.0
    with TableWriter("matrix", f"ark:{tmp_path}/f.ark") as w:
        w.write("u", feats)
    run("compute-vad", "--vad-energy-threshold=5",
        "--vad-energy-mean-scale=0", f"ark:{tmp_path}/f.ark",
        f"ark:{tmp_path}/vad.ark")
    vad = dict(SequentialTableReader("vector", f"ark:{tmp_path}/vad.ark"))
    assert vad["u"].sum() == 10


def test_nnet3_init_and_compute(tmp_path):
    cfg = tmp_path / "model.xconfig"
    cfg.write_text("""
input dim=8 name=input
relu-batchnorm-layer name=tdnn1 dim=16
output-layer name=output dim=12 include-log-softmax=true
""")
    run("nnet3-init", str(cfg), str(tmp_path / "model"))
    rng = np.random.default_rng(1)
    with TableWriter("matrix", f"ark:{tmp_path}/feats.ark") as w:
        w.write("u1", rng.normal(size=(9, 8)).astype(np.float32))
    run("nnet3-compute", str(tmp_path / "model"),
        f"ark:{tmp_path}/feats.ark", f"ark:{tmp_path}/out.ark")
    out = dict(SequentialTableReader("matrix", f"ark:{tmp_path}/out.ark"))
    assert out["u1"].shape == (9, 12)
    np.testing.assert_allclose(np.exp(out["u1"]).sum(-1), 1.0, atol=1e-4)


def test_lattice_mbr_and_ctm(tmp_path):
    from kaldi_tpu.fstext.fst import Arc, LatticeWeight, VectorFst
    from kaldi_tpu.lat.kaldi_lattice import LatticeHolder
    lat = VectorFst(LatticeWeight)
    s = [lat.add_state() for _ in range(3)]
    lat.set_start(s[0])
    lat.add_arc(s[0], Arc(5, 1, (0.5, 0.1), s[1]))
    lat.add_arc(s[1], Arc(6, 2, (0.2, 0.1), s[2]))
    lat.set_final(s[2], (0.0, 0.0))
    with TableWriter(LatticeHolder(), f"ark:{tmp_path}/lat.ark") as w:
        w.write("u1", lat)
    run("lattice-mbr-decode", f"ark:{tmp_path}/lat.ark",
        f"ark:{tmp_path}/tra.ark", f"ark:{tmp_path}/risk.ark")
    tra = dict(SequentialTableReader("int-vector", f"ark:{tmp_path}/tra.ark"))
    assert tra["u1"] == [1, 2]
    run("lattice-to-ctm-conf", f"ark:{tmp_path}/lat.ark",
        f"{tmp_path}/out.ctm")
    ctm = open(tmp_path / "out.ctm").read()
    assert "u1" in ctm and len(ctm.strip().splitlines()) == 2


def test_ivector_cli(tmp_path):
    from kaldi_tpu.gmm.diag_gmm import DiagGmm
    from kaldi_tpu.ivector import IvectorExtractor
    rng = np.random.default_rng(2)
    ubm = DiagGmm(2, 4)
    ubm.set_from_means_and_vars([0.5, 0.5], rng.normal(size=(2, 4)),
                                np.ones((2, 4)))
    ex = IvectorExtractor(ubm, 3)
    kaldi_io.write_kaldi_object(ex.write, f"{tmp_path}/final.ie")
    with TableWriter("matrix", f"ark:{tmp_path}/f.ark") as w:
        for i in range(4):
            w.write(f"u{i}", rng.normal(size=(30, 4)).astype(np.float32))
    run("ivector-extract", f"{tmp_path}/final.ie", f"ark:{tmp_path}/f.ark",
        f"ark:{tmp_path}/iv.ark")
    ivs = dict(SequentialTableReader("vector", f"ark:{tmp_path}/iv.ark"))
    assert len(ivs) == 4 and ivs["u0"].shape == (3,)
    # plda over fake speakers
    (tmp_path / "spk2utt").write_text("s0 u0 u1\ns1 u2 u3\n")
    run("ivector-compute-plda", f"ark:{tmp_path}/spk2utt",
        f"ark:{tmp_path}/iv.ark", f"{tmp_path}/plda")
    assert (tmp_path / "plda").exists()


def test_plda_scoring_htk_export_ivector_mean(tmp_path):
    """ivector-plda-scoring / copy-feats-to-htk / ivector-mean CLIs."""
    import numpy as np
    from kaldi_tpu.cli import get_tool
    from kaldi_tpu.feat.htk import read_htk
    from kaldi_tpu.ivector.plda import train_plda
    from kaldi_tpu.util import kaldi_io
    from kaldi_tpu.util.table import SequentialTableReader, TableWriter
    rng = np.random.default_rng(0)
    spk_means = rng.normal(scale=2.0, size=(4, 10))
    classes = {f"s{k}": [spk_means[k] + 0.3 * rng.normal(size=10)
                         for _ in range(6)] for k in range(4)}
    plda = train_plda(classes)
    kaldi_io.write_kaldi_object(plda.write, f"{tmp_path}/plda")
    with TableWriter("vector", f"ark:{tmp_path}/enroll.ark") as w:
        for k in range(4):
            w.write(f"s{k}", spk_means[k] + 0.2 * rng.normal(size=10))
    with TableWriter("vector", f"ark:{tmp_path}/test.ark") as w:
        for k in range(4):
            w.write(f"t{k}", spk_means[k] + 0.3 * rng.normal(size=10))
    with open(f"{tmp_path}/trials", "w") as f:
        for a in range(4):
            for b in range(4):
                f.write(f"s{a} t{b}\n")
    assert get_tool("ivector-plda-scoring")([
        "ivector-plda-scoring", f"{tmp_path}/plda",
        f"ark:{tmp_path}/enroll.ark", f"ark:{tmp_path}/test.ark",
        f"{tmp_path}/trials", f"{tmp_path}/scores"]) == 0
    scores = {}
    for line in open(f"{tmp_path}/scores"):
        a, b, sc = line.split()
        scores[(a, b)] = float(sc)
    # speaker-ID property: per test utt, the matching enrollment wins
    for b in range(4):
        best = max(range(4), key=lambda a: scores[(f"s{a}", f"t{b}")])
        assert best == b
    # HTK export round-trips
    feats = rng.normal(size=(7, 13)).astype(np.float32)
    with TableWriter("matrix", f"ark:{tmp_path}/f.ark") as w:
        w.write("u1", feats)
    assert get_tool("copy-feats-to-htk")([
        "copy-feats-to-htk", f"--output-dir={tmp_path}/htk",
        f"ark:{tmp_path}/f.ark"]) == 0
    with open(f"{tmp_path}/htk/u1.fea", "rb") as f:
        m, period, kind = read_htk(f)
    np.testing.assert_allclose(m, feats, atol=1e-6)
    assert period == 100000
    # ivector-mean
    with TableWriter("token-vector", f"ark:{tmp_path}/s2u.ark") as w:
        w.write("spkA", ["t0", "t1"])
    assert get_tool("ivector-mean")([
        "ivector-mean", f"ark:{tmp_path}/s2u.ark",
        f"ark:{tmp_path}/test.ark", f"ark:{tmp_path}/mean.ark"]) == 0
    mean = dict(SequentialTableReader(
        "vector", f"ark:{tmp_path}/mean.ark"))["spkA"]
    assert mean.shape == (10,)


def test_fstprint_fstcompile_round_trip(tmp_path):
    import numpy as np
    from kaldi_tpu.cli import get_tool
    from kaldi_tpu.fstext.fst import Arc, TropicalWeight, VectorFst
    from kaldi_tpu.fstext.openfst_io import read_fst_file, write_fst
    from kaldi_tpu.fstext.ops import equal_paths
    f = VectorFst(TropicalWeight)
    s0, s1, s2 = f.add_state(), f.add_state(), f.add_state()
    f.set_start(s0)
    f.add_arc(s0, Arc(1, 2, 0.5, s1))
    f.add_arc(s0, Arc(0, 0, 1.25, s2))
    f.add_arc(s1, Arc(3, 3, 0.0, s2))
    f.finals[s2] = 0.75
    with open(f"{tmp_path}/a.fst", "wb") as fh:
        write_fst(fh, f)
    assert get_tool("fstprint")(["fstprint", f"{tmp_path}/a.fst",
                                 f"{tmp_path}/a.txt"]) == 0
    assert get_tool("fstcompile")(["fstcompile", f"{tmp_path}/a.txt",
                                   f"{tmp_path}/b.fst"]) == 0
    g = read_fst_file(f"{tmp_path}/b.fst")
    assert equal_paths(f, g)


def test_nnet3_info_prints_model(tmp_path, capsys):
    from kaldi_tpu.cli import get_tool
    raw = """<Nnet3>
input-node name=input dim=3
component-node name=a component=a input=input
output-node name=output input=a objective=linear

<NumComponents> 1
<ComponentName> a <AffineComponent> <LearningRate> 0.001 <LinearParams>  [
  1 0 0 
  0 1 0 ]
<BiasParams>  [ 0 0 ]
</AffineComponent>
</Nnet3>
"""
    (tmp_path / "m.raw").write_text(raw)
    assert get_tool("nnet3-info")(["nnet3-info",
                                   str(tmp_path / "m.raw")]) == 0
    out = capsys.readouterr().out
    assert "type=AffineComponent" in out
    assert "num-parameters: 8" in out
