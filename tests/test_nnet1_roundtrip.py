"""nnet1 regression tests for the round-3 advisor findings:

  - text-format round-trip of models with option tokens (the pending
    '\\n' before '<LearnRateCoef>' etc. must not hide the token)
  - BlockSoftmax backprop masks blocks whose diff row-sum is ~1.0
    (reference nnet-activation.h BlockSoftmax::BackpropagateFnc)
  - nnet-initialize --seed gives distinct per-layer draws
  - frame trainers trim feature/target length mismatch
"""

import io
import os
import subprocess
import sys

import numpy as np
import pytest

from kaldi_tpu.base import io_funcs as iof
from kaldi_tpu.nnet1 import nnet as n1
from kaldi_tpu.nnet1.nnet import (AffineTransform, BlockSoftmax, Dropout,
                                  Nnet, Sigmoid, nnet_from_proto)


def _roundtrip(net: Nnet, binary: bool) -> Nnet:
    buf = io.BytesIO()
    if binary:
        buf.write(b"\0B")
    net.write(buf, binary)
    buf.seek(0)
    stream = iof.PeekableReader(buf) if hasattr(iof, "PeekableReader") else buf
    rd_binary = iof.init_input_stream(stream)
    assert rd_binary == binary
    return Nnet.read(stream, rd_binary)


def _make_net() -> Nnet:
    n1.seed_init_rng(7)
    aff = AffineTransform(5, 4)
    aff.init_data(["<ParamStddev>", "0.1", "<LearnRateCoef>", "0.5",
                   "<MaxNorm>", "2.0"])
    sig = Sigmoid(4, 4)
    drop = Dropout(4, 4)
    drop.dropout_rate = 0.25
    aff2 = AffineTransform(4, 6)
    aff2.init_data(["<ParamStddev>", "0.2"])
    return Nnet([aff, sig, drop, aff2])


@pytest.mark.parametrize("binary", [True, False])
def test_roundtrip_with_option_tokens(binary):
    net = _make_net()
    got = _roundtrip(net, binary)
    assert len(got.components) == 4
    a0 = got.components[0]
    assert isinstance(a0, AffineTransform)
    assert a0.learn_rate_coef == pytest.approx(0.5)
    assert a0.max_norm == pytest.approx(2.0)
    np.testing.assert_allclose(a0.linearity, net.components[0].linearity,
                               rtol=1e-5)
    assert got.components[2].dropout_rate == pytest.approx(0.25, abs=1e-6)
    np.testing.assert_allclose(got.components[3].bias,
                               net.components[3].bias, rtol=1e-5)


def test_text_roundtrip_twice_stable():
    # write -> read -> write must give identical text (catches separator
    # bugs that only appear on the second pass)
    net = _make_net()
    b1 = io.BytesIO()
    net.write(b1, False)
    got = _roundtrip(net, False)
    b2 = io.BytesIO()
    got.write(b2, False)
    assert b1.getvalue() == b2.getvalue()


def test_blocksoftmax_backprop_masks_untargeted_blocks():
    bs = BlockSoftmax(6, 6)
    bs.block_dims = np.array([3, 3], np.int32)
    x = np.random.default_rng(0).standard_normal((2, 6)).astype(np.float32)
    y = bs.propagate(x)
    # targets present only in block 0: diff = y - t there; block 1 diff = y
    t = np.zeros_like(y)
    t[:, 0] = 1.0
    dy = y - t
    out = bs.backprop(x, y, dy)
    # block 1 had no target: its diff row-sums are 1.0 -> zeroed
    np.testing.assert_allclose(out[:, 3:], 0.0, atol=1e-6)
    # block 0 diff sums to 0 -> passed through unchanged
    np.testing.assert_allclose(out[:, :3], dy[:, :3], atol=1e-6)


def test_seeded_init_distinct_layers():
    n1.seed_init_rng(123)
    a = AffineTransform(8, 8)
    a.init_data(["<ParamStddev>", "0.1"])
    b = AffineTransform(8, 8)
    b.init_data(["<ParamStddev>", "0.1"])
    assert not np.allclose(a.linearity, b.linearity)
    # reseeding reproduces the same stream
    n1.seed_init_rng(123)
    a2 = AffineTransform(8, 8)
    a2.init_data(["<ParamStddev>", "0.1"])
    np.testing.assert_allclose(a.linearity, a2.linearity)


def test_cmvn_to_nnet_text_readable(tmp_path):
    """cmvn-to-nnet writes text by default; its output must be readable
    as a --feature-transform (the round-3 high-severity finding)."""
    from kaldi_tpu.cli import get_tool
    from kaldi_tpu.util import kaldi_io
    cmvn = np.zeros((2, 4), np.float64)
    cmvn[0, :3] = [1.0, 2.0, 3.0]       # sum x
    cmvn[0, 3] = 2.0                     # count
    cmvn[1, :3] = [4.0, 8.0, 18.0]       # sum x^2
    cmvn_path = tmp_path / "cmvn.mat"
    kaldi_io.write_kaldi_object(
        lambda s, b: iof.write_matrix(s, b, cmvn), str(cmvn_path), True)
    out = tmp_path / "cmvn.nnet"
    rc = get_tool("cmvn-to-nnet")(
        ["cmvn-to-nnet", str(cmvn_path), str(out)])
    assert rc == 0
    from kaldi_tpu.cli.nnet1_tools import _read_nnet
    net = _read_nnet(str(out))
    assert len(net.components) == 2
    y = net.propagate(np.ones((3, 3), np.float32))
    assert np.isfinite(y).all()


def test_frm_train_trims_target_mismatch(tmp_path):
    from kaldi_tpu.cli import get_tool
    from kaldi_tpu.util.table import TableWriter
    # model: 3 -> 4 affine + softmax prototype
    proto = tmp_path / "nnet.proto"
    proto.write_text(
        "<NnetProto>\n"
        "<AffineTransform> <InputDim> 3 <OutputDim> 4 <ParamStddev> 0.1\n"
        "<Softmax> <InputDim> 4 <OutputDim> 4\n"
        "</NnetProto>\n")
    mdl = tmp_path / "nnet.init"
    assert get_tool("nnet-initialize")(
        ["nnet-initialize", str(proto), str(mdl)]) == 0
    rng = np.random.default_rng(0)
    feats = tmp_path / "feats.ark"
    with TableWriter("matrix", f"ark:{feats}") as w:
        w.write("utt1", rng.standard_normal((10, 3)).astype(np.float32))
    # targets 2 frames shorter than the features (within tolerance)
    posts = tmp_path / "post.ark"
    with TableWriter("posterior", f"ark:{posts}") as w:
        w.write("utt1", [[(int(i % 4), 1.0)] for i in range(8)])
    out = tmp_path / "nnet.out"
    rc = get_tool("nnet-train-frmshuff")([
        "nnet-train-frmshuff", "--minibatch-size=4", "--learn-rate=0.001",
        f"ark:{feats}", f"ark:{posts}", str(mdl), str(out)])
    assert rc == 0
    assert out.exists()
