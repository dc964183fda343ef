"""Round-2 nnet3 component-zoo tail: serialization round trips and
forward semantics for the importer components added for arbitrary
reference-model import (parity: nnet-simple-component.cc,
nnet-general-component.cc, nnet-convolutional-component.cc,
nnet-normalize-component.cc)."""

import io

import numpy as np
import pytest

from kaldi_tpu.nnet3 import mdl_io as M


def round_trip(comp):
    buf = io.BytesIO()
    comp.write(buf, binary=True)
    buf.seek(0)
    import kaldi_tpu.base.io_funcs as iof
    tok = iof.read_token(buf, True)
    assert tok == f"<{comp.TYPE}>"
    back = type(comp).read(buf, True)
    return back


def assert_same_forward(a, b, x):
    np.testing.assert_allclose(a.forward(x), b.forward(x), rtol=1e-5,
                               atol=1e-6)


RNG = np.random.default_rng(0)


def X(t, d):
    return RNG.normal(size=(t, d)).astype(np.float32)


class TestSimpleTail:
    def test_normalize(self):
        c = M.NormalizeComponent(InputDim=8, BlockDim=8, TargetRms=0.7,
                                 AddLogStddev=False)
        x = X(5, 8)
        y = c.forward(x)
        rms = np.sqrt((y * y).sum(-1) / 8)
        np.testing.assert_allclose(rms, 0.7, rtol=1e-5)
        assert_same_forward(c, round_trip(c), x)

    def test_normalize_log_stddev(self):
        c = M.NormalizeComponent(InputDim=6, BlockDim=6, TargetRms=1.0,
                                 AddLogStddev=True)
        y = c.forward(X(4, 6))
        assert y.shape == (4, 7)

    def test_normalize_multiblock_log_stddev_interleaved(self):
        """BlockDim < InputDim with AddLogStddev: output is per-block
        [block_dim normalized, log_stddev] interleaved, NOT all
        log-stddevs appended at the end
        (nnet-normalize-component.cc:137-147)."""
        c = M.NormalizeComponent(InputDim=6, BlockDim=3, TargetRms=1.0,
                                 AddLogStddev=True)
        x = X(4, 6)
        y = c.forward(x)
        assert y.shape == (4, 8)
        for blk in range(2):
            xb = x[:, 3 * blk:3 * blk + 3]
            ss = np.maximum((xb * xb).sum(-1), 2.0 ** -66)
            want_norm = xb / np.sqrt(ss / 3)[:, None]
            np.testing.assert_allclose(y[:, 4 * blk:4 * blk + 3],
                                       want_norm, rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(y[:, 4 * blk + 3],
                                       0.5 * np.log(ss / 3), rtol=1e-5,
                                       atol=1e-6)
        assert_same_forward(c, round_trip(c), x)

    def test_per_element_scale_and_offset(self):
        s = M.PerElementScaleComponent(LearningRate=0.01,
                                       Params=np.arange(1, 5,
                                                        dtype=np.float32))
        x = X(3, 4)
        np.testing.assert_allclose(s.forward(x), x * [1, 2, 3, 4])
        assert_same_forward(s, round_trip(s), x)
        o = M.PerElementOffsetComponent(LearningRate=0.01,
                                        Offsets=np.ones(2, np.float32),
                                        Dim=4, UseNaturalGradient=True)
        np.testing.assert_allclose(o.forward(x), x + 1.0)
        assert o.input_dim == 4
        assert_same_forward(o, round_trip(o), x)

    def test_permute(self):
        c = M.PermuteComponent(ColumnMap=[2, 0, 1, 3])
        x = X(3, 4)
        np.testing.assert_allclose(c.forward(x), x[:, [2, 0, 1, 3]])
        assert_same_forward(c, round_trip(c), x)

    def test_sum_group(self):
        c = M.SumGroupComponent(Sizes=[2, 3, 1])
        x = X(4, 6)
        y = c.forward(x)
        np.testing.assert_allclose(y[:, 0], x[:, 0] + x[:, 1], rtol=1e-6)
        np.testing.assert_allclose(y[:, 1], x[:, 2:5].sum(-1), rtol=1e-6)
        np.testing.assert_allclose(y[:, 2], x[:, 5], rtol=1e-6)
        assert c.input_dim == 6
        assert_same_forward(c, round_trip(c), x)

    def test_clip_gradient_and_backprop_truncation(self):
        c = M.ClipGradientComponent(Dim=5, ClippingThreshold=1.0,
                                    NormBasedClipping=True,
                                    NumElementsClipped=0.0,
                                    NumElementsProcessed=0.0,
                                    NumSelfRepaired=0.0,
                                    NumBackpropped=0.0)
        x = X(3, 5)
        np.testing.assert_allclose(c.forward(x), x)
        assert_same_forward(c, round_trip(c), x)
        b = M.BackpropTruncationComponent(
            Dim=5, Scale=0.5, ClippingThreshold=30.0,
            ZeroingThreshold=15.0, ZeroingInterval=20,
            RecurrenceInterval=1, NumElementsClipped=0.0,
            NumElementsZeroed=0.0, NumElementsProcessed=0.0,
            NumZeroingBoundaries=0.0)
        np.testing.assert_allclose(b.forward(x), 0.5 * x)
        assert_same_forward(b, round_trip(b), x)

    def test_elementwise_product_and_pnorm_and_sumblock(self):
        x = X(3, 6)
        p = M.ElementwiseProductComponent(InputDim=6, OutputDim=3)
        np.testing.assert_allclose(p.forward(x), x[:, :3] * x[:, 3:],
                                   rtol=1e-6)
        n = M.PnormComponent(InputDim=6, OutputDim=3)
        want = np.sqrt(x.reshape(3, 3, 2) ** 2).sum(-1) ** 0  # shape chk
        y = n.forward(x)
        np.testing.assert_allclose(
            y, np.sqrt((x.reshape(3, 3, 2) ** 2).sum(-1)), rtol=1e-5)
        s = M.SumBlockComponent(InputDim=6, OutputDim=3, Scale=2.0)
        np.testing.assert_allclose(s.forward(x),
                                   2.0 * (x[:, :3] + x[:, 3:]), rtol=1e-5)
        for c in (p, n, s):
            assert_same_forward(c, round_trip(c), x)

    def test_fixed_scale_bias_constant(self):
        x = X(3, 4)
        fs = M.FixedScaleComponent(Scales=np.full(4, 2.0, np.float32))
        np.testing.assert_allclose(fs.forward(x), 2 * x)
        fb = M.FixedBiasComponent(Bias=np.full(4, -1.0, np.float32))
        np.testing.assert_allclose(fb.forward(x), x - 1)
        cc = M.ConstantComponent(LearningRate=0.001,
                                 Output=np.arange(3, dtype=np.float32),
                                 IsUpdatable=True, UseNaturalGradient=True)
        y = cc.forward(x)
        assert y.shape == (3, 3)
        np.testing.assert_allclose(y[1], [0, 1, 2])
        cf = M.ConstantFunctionComponent(
            LearningRate=0.001, InputDim=4,
            Output=np.arange(2, dtype=np.float32), IsUpdatable=False,
            UseNaturalGradient=False)
        assert cf.input_dim == 4 and cf.forward(x).shape == (3, 2)
        for c in (fs, fb, cc, cf):
            assert_same_forward(c, round_trip(c), x)

    def test_block_and_repeated_affine(self):
        x = X(3, 6)
        W = RNG.normal(size=(4, 3)).astype(np.float32)  # 2 blocks of 2x3
        b = RNG.normal(size=4).astype(np.float32)
        c = M.BlockAffineComponent(LearningRate=0.01, NumBlocks=2,
                                   LinearParams=W, BiasParams=b)
        y = c.forward(x)
        want0 = x[:, :3] @ W[:2].T + b[:2]
        want1 = x[:, 3:] @ W[2:].T + b[2:]
        np.testing.assert_allclose(y, np.concatenate([want0, want1], -1),
                                   rtol=1e-5)
        assert c.input_dim == 6
        assert_same_forward(c, round_trip(c), x)
        Wr = RNG.normal(size=(2, 3)).astype(np.float32)
        br = RNG.normal(size=2).astype(np.float32)
        r = M.RepeatedAffineComponent(LearningRate=0.01, NumRepeats=2,
                                      LinearParams=Wr, BiasParams=br)
        yr = r.forward(x)
        np.testing.assert_allclose(
            yr, np.concatenate([x[:, :3] @ Wr.T + br,
                                x[:, 3:] @ Wr.T + br], -1), rtol=1e-5)
        assert_same_forward(r, round_trip(r), x)


class TestStatistics:
    def test_extraction_pooling_pair_equals_global_mean_std(self):
        """Extraction+pooling over a window covering the whole
        utterance = per-utterance mean and stddev (the x-vector use)."""
        T, D = 12, 3
        x = X(T, D)
        ext = M.StatisticsExtractionComponent(
            InputDim=D, InputPeriod=1, OutputPeriod=1,
            IncludeVarinance=True)
        stats = ext.forward(x)
        assert stats.shape == (T, 1 + 2 * D)
        pool = M.StatisticsPoolingComponent(
            InputDim=1 + 2 * D, InputPeriod=1, LeftContext=100,
            RightContext=100, NumLogCountFeatures=0, OutputStddevs=True,
            VarianceFloor=1e-10)
        # stats at output period 1 cover window [t, t+1) = frame t, so
        # pooling over all t gives exact global stats
        y = pool.forward(stats)
        np.testing.assert_allclose(y[0, :D], x.mean(0), rtol=1e-4,
                                   atol=1e-5)
        np.testing.assert_allclose(y[0, D:], x.std(0), rtol=1e-3,
                                   atol=1e-4)
        for c in (ext, pool):
            assert_same_forward(c, round_trip(c), x if c is ext else stats)

    def test_positive_left_context_window(self):
        """Reference convention: serialized LeftContext >= 0 and the
        pooled window is [t - left, t + right]
        (nnet-general-component.cc:595,685).  An asymmetric window
        distinguishes [t-left, t+right] from [t+left, t+right]."""
        T, D = 10, 2
        x = X(T, D)
        ext = M.StatisticsExtractionComponent(
            InputDim=D, InputPeriod=1, OutputPeriod=1,
            IncludeVarinance=False)
        stats = ext.forward(x)
        pool = M.StatisticsPoolingComponent(
            InputDim=1 + D, InputPeriod=1, LeftContext=3,
            RightContext=1, NumLogCountFeatures=0, OutputStddevs=False,
            VarianceFloor=1e-10)
        y = pool.forward(stats)
        t = 5
        np.testing.assert_allclose(y[t], x[t - 3:t + 2].mean(0),
                                   rtol=1e-5, atol=1e-6)
        # edge clamp at the start
        np.testing.assert_allclose(y[0], x[0:2].mean(0), rtol=1e-5,
                                   atol=1e-6)

    def test_log_count_features(self):
        T, D = 6, 2
        x = X(T, D)
        ext = M.StatisticsExtractionComponent(
            InputDim=D, InputPeriod=1, OutputPeriod=1,
            IncludeVarinance=False)
        stats = ext.forward(x)
        assert stats.shape == (T, 1 + D)
        pool = M.StatisticsPoolingComponent(
            InputDim=1 + D, InputPeriod=1, LeftContext=100,
            RightContext=100, NumLogCountFeatures=1, OutputStddevs=False,
            VarianceFloor=1e-10)
        y = pool.forward(stats)
        assert y.shape == (T, 1 + D)
        np.testing.assert_allclose(y[0, 0], np.log(T), rtol=1e-5)


class TestTimeHeightConvolution:
    def _model(self, fin=2, fout=3, hin=4, hout=4, sub=1,
               offsets=((0, 0), (0, 1), (1, 0))):
        return dict(num_filters_in=fin, num_filters_out=fout,
                    height_in=hin, height_out=hout,
                    height_subsample_out=sub,
                    offsets=[tuple(o) for o in offsets],
                    required_time_offsets=[0])

    def test_matches_naive_convolution(self):
        m = self._model()
        fin, fout, hin, hout = 2, 3, 4, 4
        K = len(m["offsets"])
        W = RNG.normal(size=(fout, K * fin)).astype(np.float32)
        b = RNG.normal(size=fout).astype(np.float32)
        c = M.TimeHeightConvolutionComponent(
            LearningRate=0.01, Model=m, LinearParams=W, BiasParams=b,
            MaxMemoryMb=200.0, UseNaturalGradient=True,
            NumMinibatchesHistory=4.0, AlphaInOut=(4.0, 4.0),
            RankInOut=(40, 40))
        T = 5
        x = X(T, hin * fin)
        y = c.forward(x).reshape(T, hout, fout)
        xb = x.reshape(T, hin, fin)
        # naive loop
        want = np.zeros((T, hout, fout), np.float32)
        for t in range(T):
            for h in range(hout):
                acc = b.copy()
                for k, (dt, dh) in enumerate(m["offsets"]):
                    ts = min(max(t + dt, 0), T - 1)   # edge clamp
                    hs = h + dh
                    if 0 <= hs < hin:
                        acc = acc + W[:, k * fin:(k + 1) * fin] @ xb[ts, hs]
                want[t, h] = acc
        np.testing.assert_allclose(y, want, rtol=1e-4, atol=1e-5)
        assert c.input_dim == hin * fin
        assert_same_forward(c, round_trip(c), x)

    def test_height_subsample(self):
        m = self._model(hin=6, hout=3, sub=2, offsets=((0, 0), (0, 1)))
        W = RNG.normal(size=(3, 2 * 2)).astype(np.float32)
        c = M.TimeHeightConvolutionComponent(
            LearningRate=0.01, Model=m, LinearParams=W,
            BiasParams=np.zeros(3, np.float32), MaxMemoryMb=200.0,
            UseNaturalGradient=False, NumMinibatchesHistory=4.0,
            AlphaInOut=(4.0, 4.0), RankInOut=(40, 40))
        x = X(4, 12)
        y = c.forward(x)
        assert y.shape == (4, 9)
        assert_same_forward(c, round_trip(c), x)


class TestGraphIntegration:
    def test_xvector_style_graph(self, tmp_path):
        """CNN front end + stats pooling + affine through the full
        graph reader/evaluator (an x-vector extractor skeleton)."""
        fin, hin = 1, 4
        m = dict(num_filters_in=fin, num_filters_out=2, height_in=hin,
                 height_out=hin, height_subsample_out=1,
                 offsets=[(0, 0), (0, 1)], required_time_offsets=[0])
        W = RNG.normal(size=(2, 2 * fin)).astype(np.float32)
        conv = M.TimeHeightConvolutionComponent(
            LearningRate=0.01, Model=m, LinearParams=W,
            BiasParams=np.zeros(2, np.float32), MaxMemoryMb=200.0,
            UseNaturalGradient=False, NumMinibatchesHistory=4.0,
            AlphaInOut=(4.0, 4.0), RankInOut=(40, 40))
        relu = M.RectifiedLinearComponent(Dim=8)
        ext = M.StatisticsExtractionComponent(
            InputDim=8, InputPeriod=1, OutputPeriod=1,
            IncludeVarinance=True)
        pool = M.StatisticsPoolingComponent(
            InputDim=17, InputPeriod=1, LeftContext=100,
            RightContext=100, NumLogCountFeatures=0, OutputStddevs=True,
            VarianceFloor=1e-10)
        aff = M.NaturalGradientAffineComponent(
            LearningRate=0.001,
            LinearParams=RNG.normal(size=(5, 16)).astype(np.float32),
            BiasParams=np.zeros(5, np.float32), RankIn=20, RankOut=80,
            UpdatePeriod=4, NumSamplesHistory=2000.0, Alpha=4.0)
        nodes = [
            M.Node("input", "input", dim=4),
            M.Node("component", "conv", component="conv",
                   desc=M.parse_descriptor("input")),
            M.Node("component", "relu", component="relu",
                   desc=M.parse_descriptor("conv")),
            M.Node("component", "stats", component="stats",
                   desc=M.parse_descriptor("relu")),
            M.Node("component", "pool", component="pool",
                   desc=M.parse_descriptor("stats")),
            M.Node("component", "embed", component="embed",
                   desc=M.parse_descriptor("pool")),
            M.Node("output", "output",
                   desc=M.parse_descriptor("embed")),
        ]
        g = M.Nnet3Graph(nodes, {"conv": conv, "relu": relu,
                                 "stats": ext, "pool": pool,
                                 "embed": aff})
        x = X(10, 4)
        y = g.forward(x)
        assert y.shape == (10, 5)
        # whole-graph file round trip preserves the forward
        path = str(tmp_path / "xvec.raw")
        M.write_raw_nnet3(g, path)
        g2 = M.read_raw_nnet3(path)
        np.testing.assert_allclose(g2.forward(x), y, rtol=1e-5,
                                   atol=1e-6)


class TestCompositeAndMasks:
    def test_spec_augment_and_dropout_mask(self):
        sa = M.SpecAugmentTimeMaskComponent(Dim=5, ZeroedProportion=0.2,
                                            TimeMaskMaxFrames=10,
                                            TestMode=True)
        x = X(4, 5)
        np.testing.assert_allclose(sa.forward(x), x)
        assert_same_forward(sa, round_trip(sa), x)
        dm = M.DropoutMaskComponent(OutputDim=3, DropoutProportion=0.5,
                                    TestMode=True, Continuous=False)
        np.testing.assert_allclose(dm.forward(x), 1.0)
        assert_same_forward(dm, round_trip(dm), x)

    def test_composite_round_trip_and_forward(self):
        aff = M.NaturalGradientAffineComponent(
            LearningRate=0.001,
            LinearParams=RNG.normal(size=(3, 4)).astype(np.float32),
            BiasParams=np.zeros(3, np.float32), RankIn=20, RankOut=80,
            UpdatePeriod=4, NumSamplesHistory=2000.0, Alpha=4.0)
        relu = M.RectifiedLinearComponent(Dim=3)
        comp = M.CompositeComponent(
            sub_components=[aff, relu], LearningRate=0.001,
            MaxRowsProcess=2048)
        x = X(5, 4)
        want = np.maximum(x @ np.asarray(
            aff.fields["LinearParams"]).T, 0.0)
        np.testing.assert_allclose(comp.forward(x), want, rtol=1e-5)
        back = round_trip(comp)
        assert len(back.sub_components) == 2
        assert back.fields["MaxRowsProcess"] == 2048
        np.testing.assert_allclose(back.forward(x), want, rtol=1e-5)
        assert comp.input_dim == 4
