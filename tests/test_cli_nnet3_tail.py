"""Plain nnet3 egs + raw-model CLI tail (parity: src/nnet3bin
nnet3-get-egs / copy / shuffle / merge / subset, nnet3-copy,
nnet3-average, nnet3-compute-from-egs, nnet3-compute-prob)."""

import numpy as np
import pytest

from kaldi_tpu.cli import get_tool
from kaldi_tpu.nnet3.egs import ExampleHolder
from kaldi_tpu.util.table import SequentialTableReader, TableWriter

RAW = """<Nnet3>
input-node name=input dim=3
component-node name=aff component=aff input=input
component-node name=lsm component=lsm input=aff
output-node name=output input=lsm objective=linear

<NumComponents> 2
<ComponentName> aff <NaturalGradientAffineComponent> <LearningRate> 0.001 <LinearParams>  [
  1 0 0
  0 1 0
  0 0 1 ]
<BiasParams>  [ 0 0 0 ]
<RankIn> 20 <RankOut> 80 <UpdatePeriod> 4 <NumSamplesHistory> 2000 <Alpha> 4 </NaturalGradientAffineComponent>
<ComponentName> lsm <LogSoftmaxComponent> <Dim> 3 <ValueAvg>  [ ]
<DerivAvg>  [ ]
<Count> 0 </LogSoftmaxComponent>
</Nnet3>
"""


@pytest.fixture()
def egs_env(tmp_path):
    rng = np.random.default_rng(0)
    with TableWriter("matrix", f"ark:{tmp_path}/feats.ark") as w:
        for i in range(3):
            w.write(f"u{i}", rng.normal(size=(20, 3)).astype(np.float32))
    with TableWriter("posterior", f"ark:{tmp_path}/post.ark") as w:
        for i in range(3):
            w.write(f"u{i}", [[(int(rng.integers(0, 3)), 1.0)]
                              for _ in range(20)])
    rc = get_tool("nnet3-get-egs")([
        "nnet3-get-egs", "--num-frames=10", "--left-context=2",
        f"ark:{tmp_path}/feats.ark", f"ark:{tmp_path}/post.ark",
        f"ark:{tmp_path}/egs.ark"])
    assert rc == 0
    return tmp_path


def read_egs(path):
    return list(SequentialTableReader(ExampleHolder(), f"ark:{path}"))


def test_get_and_round_trip(egs_env):
    egs = read_egs(f"{egs_env}/egs.ark")
    assert len(egs) == 6        # 3 utts x 2 chunks
    k, eg = egs[0]
    assert eg.targets and eg.feats.shape[1] == 3
    assert eg.left_context == 0          # chunk at t=0
    k1, eg1 = egs[1]
    assert eg1.left_context == 2         # mid-utterance chunk


def test_copy_shuffle_merge_subset(egs_env):
    d = egs_env
    rc = get_tool("nnet3-copy-egs")([
        "nnet3-copy-egs", f"ark:{d}/egs.ark", f"ark:{d}/c1.ark",
        f"ark:{d}/c2.ark"])
    assert rc == 0
    assert len(read_egs(f"{d}/c1.ark")) == 3
    assert len(read_egs(f"{d}/c2.ark")) == 3
    rc = get_tool("nnet3-shuffle-egs")([
        "nnet3-shuffle-egs", "--srand=7", f"ark:{d}/egs.ark",
        f"ark:{d}/sh.ark"])
    assert rc == 0
    orig = [k for k, _ in read_egs(f"{d}/egs.ark")]
    shuf = [k for k, _ in read_egs(f"{d}/sh.ark")]
    assert sorted(orig) == sorted(shuf) and orig != shuf
    rc = get_tool("nnet3-merge-egs")([
        "nnet3-merge-egs", "--minibatch-size=3", f"ark:{d}/egs.ark",
        f"ark:{d}/m.ark"])
    assert rc == 0
    merged = read_egs(f"{d}/m.ark")
    assert sum(eg.batch for _, eg in merged) == 6
    assert any(eg.batch == 3 for _, eg in merged)
    rc = get_tool("nnet3-subset-egs")([
        "nnet3-subset-egs", "--n=2", f"ark:{d}/egs.ark",
        f"ark:{d}/s.ark"])
    assert rc == 0
    assert len(read_egs(f"{d}/s.ark")) == 2


def test_raw_model_ops(tmp_path, egs_env, capsys):
    raw = tmp_path / "a.raw"
    raw.write_text(RAW)
    rc = get_tool("nnet3-copy")([
        "nnet3-copy", "--binary=true", str(raw), f"{tmp_path}/b.raw"])
    assert rc == 0
    from kaldi_tpu.nnet3.mdl_io import read_raw_nnet3
    g1, g2 = read_raw_nnet3(str(raw)), read_raw_nnet3(f"{tmp_path}/b.raw")
    x = np.random.default_rng(0).normal(size=(4, 3)).astype(np.float32)
    np.testing.assert_allclose(g2.forward(x), g1.forward(x), atol=1e-5)
    # average of a model with itself = itself; with shifted weights,
    # the mean
    rc = get_tool("nnet3-average")([
        "nnet3-average", str(raw), f"{tmp_path}/b.raw",
        f"{tmp_path}/avg.raw"])
    assert rc == 0
    g3 = read_raw_nnet3(f"{tmp_path}/avg.raw")
    np.testing.assert_allclose(g3.forward(x), g1.forward(x), atol=1e-5)
    rc = get_tool("nnet3-compute-from-egs")([
        "nnet3-compute-from-egs", str(raw), f"ark:{egs_env}/egs.ark",
        f"ark:{tmp_path}/out.ark"])
    assert rc == 0
    outs = dict(SequentialTableReader("matrix", f"ark:{tmp_path}/out.ark"))
    assert len(outs) == 6
    # log-softmax rows sum to 1 in prob space
    first = next(iter(outs.values()))
    np.testing.assert_allclose(np.exp(first).sum(axis=1), 1.0,
                               atol=1e-4)
    rc = get_tool("nnet3-compute-prob")([
        "nnet3-compute-prob", str(raw), f"ark:{egs_env}/egs.ark"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "log-prob per frame:" in out
    val = float(out.split(":")[1].split("over")[0])
    assert -10.0 < val < 0.0
