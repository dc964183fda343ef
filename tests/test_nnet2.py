"""nnet2 thin importer (kaldi_tpu/nnet2) against archives produced by
binaries compiled from the reference's own C++ (nnet-init /
raw-nnet-info / a NnetComputation forward dump, tools/ref_fixtures):
binary+text import parity, forward output at 1e-6, round-trip, and the
nnet2bin CLI surface."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from kaldi_tpu.cli import get_tool
from kaldi_tpu.nnet2 import Nnet2, read_raw_nnet2, write_raw_nnet2
from kaldi_tpu.util.table import SequentialTableReader

DATA = os.path.join(os.path.dirname(__file__), "data", "ref_golden")

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(DATA, "nnet2.raw")),
    reason="reference-compiled nnet2 goldens not generated")


@pytest.fixture(scope="module")
def nnet():
    return read_raw_nnet2(os.path.join(DATA, "nnet2.raw"))


def test_import_structure(nnet):
    assert [c.TYPE for c in nnet.components] == [
        "SpliceComponent", "AffineComponentPreconditionedOnline",
        "PnormComponent", "NormalizeComponent", "AffineComponent",
        "SoftmaxComponent"]
    assert nnet.left_context() == 1 and nnet.right_context() == 1
    assert nnet.input_dim() == 13 and nnet.output_dim() == 8


def test_text_binary_agree(nnet):
    nt = read_raw_nnet2(os.path.join(DATA, "nnet2_text.raw"))
    for c, ct in zip(nnet.components, nt.components):
        for key in ("LinearParams", "BiasParams"):
            if key in c.fields:
                np.testing.assert_allclose(
                    np.asarray(c.fields[key]),
                    np.asarray(ct.fields[key]), atol=2e-5)


def test_forward_matches_reference(nnet):
    feats = {k: np.asarray(m) for k, m in SequentialTableReader(
        "matrix", f"ark:{os.path.join(DATA, 'feats.ark')}")}
    ref = {k: np.asarray(m) for k, m in SequentialTableReader(
        "matrix", f"ark:{os.path.join(DATA, 'nnet2_out.ark')}")}
    for k, f in feats.items():
        out = nnet.forward(f, pad_input=True)
        assert out.shape == ref[k].shape
        np.testing.assert_allclose(out, ref[k], atol=1e-6)


def test_roundtrip(nnet, tmp_path):
    write_raw_nnet2(nnet, f"{tmp_path}/copy.raw", binary=True)
    n2 = read_raw_nnet2(f"{tmp_path}/copy.raw")
    feats = next(iter(SequentialTableReader(
        "matrix", f"ark:{os.path.join(DATA, 'feats.ark')}")))[1]
    np.testing.assert_allclose(nnet.forward(np.asarray(feats)),
                               n2.forward(np.asarray(feats)),
                               atol=1e-7)
    # byte-identical round trip for the supported component set
    raw0 = open(os.path.join(DATA, "nnet2.raw"), "rb").read()
    raw1 = open(f"{tmp_path}/copy.raw", "rb").read()
    assert raw0 == raw1


def test_cli_raw_tools(tmp_path, capsys):
    src = os.path.join(DATA, "nnet2.raw")
    assert get_tool("raw-nnet-info")(["raw-nnet-info", src]) == 0
    out = capsys.readouterr().out
    assert "num-components 6" in out and "PnormComponent" in out
    assert get_tool("raw-nnet-copy")([
        "raw-nnet-copy", "--learning-rate=0.5", src,
        f"{tmp_path}/c.raw"]) == 0
    n = read_raw_nnet2(f"{tmp_path}/c.raw")
    assert all(c.fields.get("LearningRate", 0.5) == 0.5
               for c in n.components)


def test_cli_am_tools_and_compute(tmp_path, capsys):
    from kaldi_tpu.hmm.topology import HmmTopology
    from kaldi_tpu.hmm.transition_model import TransitionModel
    from kaldi_tpu.nnet2 import AmNnet2, write_nnet2_am
    from kaldi_tpu.tree import monophone_context_dependency
    from kaldi_tpu.util.table import TableWriter
    nnet = read_raw_nnet2(os.path.join(DATA, "nnet2.raw"))
    phones = [1, 2]
    topo = HmmTopology.three_state(phones)
    tree = monophone_context_dependency(phones, {p: 4 for p in phones})
    tm = TransitionModel(topo, tree)
    # output-dim 8 >= tree pdfs: priors over 8
    am = AmNnet2(nnet, np.full(8, 1.0 / 8, np.float32))
    write_nnet2_am(f"{tmp_path}/am.mdl", tm, am)
    assert get_tool("nnet-am-info")([
        "nnet-am-info", f"{tmp_path}/am.mdl"]) == 0
    out = capsys.readouterr().out
    assert "prior-dimension 8" in out
    # raw extraction equals the source net
    assert get_tool("nnet-to-raw-nnet")([
        "nnet-to-raw-nnet", f"{tmp_path}/am.mdl",
        f"{tmp_path}/x.raw"]) == 0
    assert open(f"{tmp_path}/x.raw", "rb").read() == \
        open(os.path.join(DATA, "nnet2.raw"), "rb").read()
    # compute: posterior rows sum to 1
    rng = np.random.default_rng(0)
    with TableWriter("matrix", f"ark:{tmp_path}/f.ark") as w:
        w.write("u1", rng.normal(size=(12, 13)).astype(np.float32))
    assert get_tool("nnet-am-compute")([
        "nnet-am-compute", f"{tmp_path}/am.mdl",
        f"ark:{tmp_path}/f.ark", f"ark:{tmp_path}/o.ark"]) == 0
    [(k, o)] = list(SequentialTableReader("matrix",
                                          f"ark:{tmp_path}/o.ark"))
    assert o.shape == (12, 8)
    np.testing.assert_allclose(np.asarray(o).sum(axis=1), 1.0,
                               atol=1e-4)


def test_cli_concat_and_nnet1_convert(tmp_path):
    src = os.path.join(DATA, "nnet2.raw")
    # build a second tiny net 8 -> 8 to concat
    from kaldi_tpu.nnet2.model import AffineComponent, TanhComponent
    rng = np.random.default_rng(1)
    n2 = Nnet2([AffineComponent(LearningRate=0.01,
                                LinearParams=rng.normal(
                                    size=(8, 8)).astype(np.float32),
                                BiasParams=np.zeros(8, np.float32),
                                IsGradient=False),
                TanhComponent(Dim=8)])
    write_raw_nnet2(n2, f"{tmp_path}/b.raw")
    assert get_tool("raw-nnet-concat")([
        "raw-nnet-concat", src, f"{tmp_path}/b.raw",
        f"{tmp_path}/ab.raw"]) == 0
    ab = read_raw_nnet2(f"{tmp_path}/ab.raw")
    assert len(ab.components) == 8 and ab.output_dim() == 8
    # nnet1 -> nnet2: build an nnet1 with splice+affine+softmax and
    # check the converted net computes the same function
    from kaldi_tpu.nnet1.nnet import (AffineTransform, Nnet as Nnet1,
                                      Softmax, Splice)
    sp = Splice(4, 12)
    sp.frame_offsets = np.asarray([-1, 0, 1], np.int32)
    aff = AffineTransform(12, 5)
    aff.linearity = rng.normal(size=(5, 12)).astype(np.float32)
    aff.bias = rng.normal(size=5).astype(np.float32)
    sm = Softmax(5, 5)
    n1 = Nnet1([sp, aff, sm])
    from kaldi_tpu.util import kaldi_io
    kaldi_io.write_kaldi_object(n1.write, f"{tmp_path}/n1.nnet")
    assert get_tool("nnet1-to-raw-nnet")([
        "nnet1-to-raw-nnet", f"{tmp_path}/n1.nnet",
        f"{tmp_path}/conv.raw"]) == 0
    conv = read_raw_nnet2(f"{tmp_path}/conv.raw")
    x = rng.normal(size=(9, 4)).astype(np.float32)
    want = n1.propagate(x)
    got = conv.forward(x, pad_input=True)
    np.testing.assert_allclose(got, want, atol=1e-5)
