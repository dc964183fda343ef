"""Recurrent nnet3 import: LSTM/GRU/attention/maxpool/legacy-conv
components and cyclic-graph evaluation (VERDICT r2 items 4-5).

The lstmp graph below is the skeleton the reference xconfig
fast-lstmp-layer generates (steps/libs/nnet3/xconfig/lstm.py): an
affine over Append(input, IfDefined(Offset(r, -1))), the fused
LstmNonlinearityComponent, dim-ranges for c/m, and a projection whose
first rows feed back as r."""

import io

import numpy as np
import pytest

from kaldi_tpu.nnet3 import mdl_io as M


RNG = np.random.default_rng(0)


def sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def make_lstmp_graph(D=5, C=8, R=4, N=2, seed=0):
    """Returns (graph, params dict) for a 1-layer projected LSTM."""
    rng = np.random.default_rng(seed)
    W_all = rng.normal(size=(4 * C, D + R)).astype(np.float32) * 0.3
    b_all = rng.normal(size=4 * C).astype(np.float32) * 0.1
    w_diag = rng.normal(size=(3, C)).astype(np.float32) * 0.2
    W_proj = rng.normal(size=(R + N, C)).astype(np.float32) * 0.4
    comps = {
        "W_all": M.NaturalGradientAffineComponent(
            LearningRate=0.001, LinearParams=W_all, BiasParams=b_all,
            RankIn=20, RankOut=80, UpdatePeriod=4,
            NumSamplesHistory=2000.0, Alpha=4.0),
        "lstm_nonlin": M.LstmNonlinearityComponent(
            LearningRate=0.001, Params=w_diag,
            ValueAvg=np.zeros((5, C), np.float32),
            DerivAvg=np.zeros((5, C), np.float32),
            SelfRepairConfig=np.asarray(
                [0.05, 0.05, 0.2, 0.05, 0.2] + [1e-5] * 5, np.float32),
            SelfRepairProb=np.zeros(5, np.float32), Count=0.0),
        "rp": M.LinearComponent(Params=W_proj,
                                OrthonormalConstraint=0.0,
                                UseNaturalGradient=True),
    }
    nodes = [
        M.Node("input", "input", dim=D),
        M.Node("component", "W_all", component="W_all",
               desc=M.parse_descriptor(
                   "Append(input, IfDefined(Offset(r_trunc, -1)))")),
        M.Node("component", "lstm_nonlin", component="lstm_nonlin",
               desc=M.parse_descriptor(
                   "Append(W_all, IfDefined(Offset(c_trunc, -1)))")),
        M.Node("dim-range", "c_trunc", dim=C, dim_offset=0,
               desc=M.Desc("node", ["lstm_nonlin"])),
        M.Node("dim-range", "m", dim=C, dim_offset=C,
               desc=M.Desc("node", ["lstm_nonlin"])),
        M.Node("component", "rp", component="rp",
               desc=M.parse_descriptor("m")),
        M.Node("dim-range", "r_trunc", dim=R, dim_offset=0,
               desc=M.Desc("node", ["rp"])),
        M.Node("output", "output", desc=M.parse_descriptor("rp")),
    ]
    return (M.Nnet3Graph(nodes, comps),
            dict(W_all=W_all, b_all=b_all, w=w_diag, W_proj=W_proj,
                 D=D, C=C, R=R))


def manual_lstmp(x, p):
    """Reference recurrence in plain python."""
    T = x.shape[0]
    C, R = p["C"], p["R"]
    c_prev = np.zeros(C, np.float32)
    r_prev = np.zeros(R, np.float32)
    w = p["w"]
    outs = []
    for t in range(T):
        inp = np.concatenate([x[t], r_prev])
        parts = p["W_all"] @ inp + p["b_all"]
        i_p, f_p, c_p, o_p = (parts[k * C:(k + 1) * C] for k in range(4))
        i_t = sigmoid(i_p + w[0] * c_prev)
        f_t = sigmoid(f_p + w[1] * c_prev)
        c_t = f_t * c_prev + i_t * np.tanh(c_p)
        o_t = sigmoid(o_p + w[2] * c_t)
        m_t = o_t * np.tanh(c_t)
        y = p["W_proj"] @ m_t
        outs.append(y)
        c_prev, r_prev = c_t, y[:R]
    return np.stack(outs)


class TestLstmGraph:
    def test_matches_manual_recurrence(self):
        g, p = make_lstmp_graph()
        x = RNG.normal(size=(11, p["D"])).astype(np.float32)
        got = g.forward(x)
        want = manual_lstmp(x, p)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_mdl_round_trip(self):
        g, p = make_lstmp_graph(seed=3)
        x = RNG.normal(size=(7, p["D"])).astype(np.float32)
        buf = io.BytesIO()
        g.write(buf, binary=True)
        buf.seek(0)
        g2 = M.Nnet3Graph.read(buf, binary=True)
        np.testing.assert_allclose(g2.forward(x), g.forward(x),
                                   rtol=1e-5, atol=1e-6)

    def test_lstm_dropout_masks(self):
        C = 4
        comp = M.LstmNonlinearityComponent(
            LearningRate=0.001,
            Params=np.zeros((3, C), np.float32),
            ValueAvg=np.zeros((5, C), np.float32),
            DerivAvg=np.zeros((5, C), np.float32),
            SelfRepairConfig=np.zeros(10, np.float32),
            SelfRepairProb=np.zeros(5, np.float32),
            UseDropout=True, Count=0.0)
        x = RNG.normal(size=(3, 5 * C + 3)).astype(np.float32)
        x[:, 5 * C:] = [1.0, 0.0, 1.0]   # kill the forget gate
        y = comp.forward(x)
        c_prev = x[:, 4 * C:5 * C]
        i_t = sigmoid(x[:, :C])          # w=0, mask 1
        want_c = i_t * np.tanh(x[:, 2 * C:3 * C])   # f masked to 0
        np.testing.assert_allclose(y[:, :C], want_c, rtol=1e-5,
                                   atol=1e-6)


class TestGru:
    def test_gru_graph_recurrence(self):
        """Projected-GRU subgraph: z/r/hpart affine + GruNonlinearity
        with c/s feedback, vs manual loop."""
        D, C, R = 4, 6, 3
        rng = np.random.default_rng(1)
        U = rng.normal(size=(2 * C + R, D + R)).astype(np.float32) * 0.3
        b = rng.normal(size=2 * C + R).astype(np.float32) * 0.1
        Wh = rng.normal(size=(C, R)).astype(np.float32) * 0.3
        Wy = rng.normal(size=(R + 2, C)).astype(np.float32) * 0.4
        comps = {
            "zr": M.NaturalGradientAffineComponent(
                LearningRate=0.001, LinearParams=U, BiasParams=b,
                RankIn=20, RankOut=80, UpdatePeriod=4,
                NumSamplesHistory=2000.0, Alpha=4.0),
            "gru": M.GruNonlinearityComponent(
                LearningRate=0.001, CellDim=C, RecurrentDim=R, w_h=Wh,
                ValueAvg=np.zeros(C, np.float32),
                DerivAvg=np.zeros(C, np.float32),
                SelfRepairTotal=0.0, Count=0.0,
                SelfRepairThreshold=0.2, SelfRepairScale=1e-5,
                Alpha=4.0, RankIn=20, RankOut=80, UpdatePeriod=4),
            "proj": M.LinearComponent(Params=Wy,
                                      OrthonormalConstraint=0.0,
                                      UseNaturalGradient=True),
        }
        # zr output = (z_pre (C), r_pre (R), hpart (C)); apply sigmoids
        # via dim-ranges + Sigmoid components
        comps["sig_z"] = M.SigmoidComponent(Dim=C)
        comps["sig_r"] = M.SigmoidComponent(Dim=R)
        nodes = [
            M.Node("input", "input", dim=D),
            M.Node("component", "zr", component="zr",
                   desc=M.parse_descriptor(
                       "Append(input, IfDefined(Offset(s_prev, -1)))")),
            M.Node("dim-range", "z_pre", dim=C, dim_offset=0,
                   desc=M.Desc("node", ["zr"])),
            M.Node("dim-range", "r_pre", dim=R, dim_offset=C,
                   desc=M.Desc("node", ["zr"])),
            M.Node("dim-range", "hpart", dim=C, dim_offset=C + R,
                   desc=M.Desc("node", ["zr"])),
            M.Node("component", "z", component="sig_z",
                   desc=M.parse_descriptor("z_pre")),
            M.Node("component", "r", component="sig_r",
                   desc=M.parse_descriptor("r_pre")),
            M.Node("component", "gru", component="gru",
                   desc=M.parse_descriptor(
                       "Append(z, r, hpart, "
                       "IfDefined(Offset(c_prev, -1)), "
                       "IfDefined(Offset(s_prev, -1)))")),
            M.Node("dim-range", "c_prev", dim=C, dim_offset=C,
                   desc=M.Desc("node", ["gru"])),
            M.Node("component", "proj", component="proj",
                   desc=M.parse_descriptor("c_prev")),
            M.Node("dim-range", "s_prev", dim=R, dim_offset=0,
                   desc=M.Desc("node", ["proj"])),
            M.Node("output", "output", desc=M.parse_descriptor("proj")),
        ]
        g = M.Nnet3Graph(nodes, comps)
        T = 9
        x = rng.normal(size=(T, D)).astype(np.float32)
        got = g.forward(x)
        # manual
        c = np.zeros(C, np.float32)
        s = np.zeros(R, np.float32)
        outs = []
        for t in range(T):
            pre = U @ np.concatenate([x[t], s]) + b
            z = sigmoid(pre[:C])
            r = sigmoid(pre[C:C + R])
            hpart = pre[C + R:]
            h = np.tanh(hpart + Wh @ (s * r))
            c = (1 - z) * h + z * c
            y = Wy @ c
            outs.append(y)
            s = y[:R]
        np.testing.assert_allclose(got, np.stack(outs), rtol=1e-4,
                                   atol=1e-5)

    def test_output_gru_component(self):
        C = 5
        w = RNG.normal(size=C).astype(np.float32)
        comp = M.OutputGruNonlinearityComponent(
            LearningRate=0.001, CellDim=C, w_h=w,
            ValueAvg=np.zeros(C, np.float32),
            DerivAvg=np.zeros(C, np.float32), SelfRepairTotal=0.0,
            Count=0.0, SelfRepairThreshold=0.2, SelfRepairScale=1e-5,
            Alpha=4.0, Rank=8, UpdatePeriod=4)
        x = RNG.normal(size=(4, 3 * C)).astype(np.float32)
        y = comp.forward(x)
        z, hpart, c_prev = x[:, :C], x[:, C:2 * C], x[:, 2 * C:]
        h = np.tanh(hpart + w * c_prev)
        np.testing.assert_allclose(y[:, :C], h, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(y[:, C:], (1 - z) * h + z * c_prev,
                                   rtol=1e-5, atol=1e-6)


class TestAttention:
    def _comp(self, H=2, kd=3, vd=4, L=2, Rr=1, stride=1, out_ctx=False):
        ctx = L + 1 + Rr
        return M.RestrictedAttentionComponent(
            NumHeads=H, KeyDim=kd, ValueDim=vd, NumLeftInputs=L,
            NumRightInputs=Rr, TimeStride=stride,
            NumLeftInputsRequired=0, NumRightInputsRequired=0,
            OutputContext=out_ctx, KeyScale=1.0 / np.sqrt(kd),
            StatsCount=0.0,
            EntropyStats=np.zeros(H, np.float32),
            PosteriorStats=np.zeros((H, ctx), np.float32))

    def test_uniform_attention_is_mean(self):
        """Zero keys/queries -> uniform softmax -> output is the mean
        of the in-window values (interior frames)."""
        H, kd, vd, L, Rr = 1, 3, 4, 1, 1
        c = self._comp(H, kd, vd, L, Rr)
        T = 8
        x = np.zeros((T, kd + vd + kd + 3), np.float32)
        vals = RNG.normal(size=(T, vd)).astype(np.float32)
        x[:, kd:kd + vd] = vals
        y = c.forward(x)
        t = 4
        np.testing.assert_allclose(y[t], vals[t - 1:t + 2].mean(0),
                                   rtol=1e-5, atol=1e-6)

    def test_context_bias_selects_position(self):
        """A large positional bias must pick out that position."""
        H, kd, vd, L, Rr = 1, 2, 3, 1, 1
        c = self._comp(H, kd, vd, L, Rr)
        T = 6
        x = np.zeros((T, kd + vd + kd + 3), np.float32)
        vals = RNG.normal(size=(T, vd)).astype(np.float32)
        x[:, kd:kd + vd] = vals
        x[:, kd + vd + kd + 0] = 50.0     # bias toward m=0 (t-1)
        y = c.forward(x)
        np.testing.assert_allclose(y[3], vals[2], rtol=1e-4, atol=1e-5)

    def test_round_trip_and_output_context(self):
        c = self._comp(out_ctx=True)
        T = 5
        x = RNG.normal(size=(T, c.input_dim)).astype(np.float32)
        buf = io.BytesIO()
        c.write(buf, binary=True)
        buf.seek(0)
        tok = __import__("kaldi_tpu.base.io_funcs",
                         fromlist=["io_funcs"]).read_token(buf, True)
        assert tok == "<RestrictedAttentionComponent>"
        c2 = M.RestrictedAttentionComponent.read(buf, True)
        np.testing.assert_allclose(c2.forward(x), c.forward(x),
                                   rtol=1e-5, atol=1e-6)
        ctx = 2 + 1 + 1
        assert c.forward(x).shape == (T, 2 * (4 + ctx))


class TestMaxpoolConv:
    def test_maxpooling_matches_naive(self):
        ix, iy, iz = 4, 3, 2
        c = M.MaxpoolingComponent(InputXDim=ix, InputYDim=iy,
                                  InputZDim=iz, PoolXSize=2, PoolYSize=2,
                                  PoolZSize=1, PoolXStep=2, PoolYStep=1,
                                  PoolZStep=1)
        T = 3
        x = RNG.normal(size=(T, ix * iy * iz)).astype(np.float32)
        y = c.forward(x)
        nx, ny, nz = 2, 2, 2
        assert y.shape == (T, nx * ny * nz)
        xt = x.reshape(T, ix, iy, iz)
        for t in range(T):
            for a in range(nx):
                for b_ in range(ny):
                    for d in range(nz):
                        want = xt[t, 2 * a:2 * a + 2,
                                  b_:b_ + 2, d].max()
                        got = y[t, a * ny * nz + b_ * nz + d]
                        assert abs(want - got) < 1e-6

    def test_convolution_matches_naive_zyx(self):
        ix, iy, iz, fx, fy, nf = 4, 4, 2, 2, 2, 3
        W = RNG.normal(size=(nf, fx * fy * iz)).astype(np.float32)
        b = RNG.normal(size=nf).astype(np.float32)
        c = M.ConvolutionComponent(
            LearningRate=0.01, InputXDim=ix, InputYDim=iy, InputZDim=iz,
            FiltXDim=fx, FiltYDim=fy, FiltXStep=1, FiltYStep=1,
            InputVectorization=0, FilterParams=W, BiasParams=b)
        T = 2
        x = RNG.normal(size=(T, ix * iy * iz)).astype(np.float32)
        y = c.forward(x)
        nx, ny = 3, 3
        assert y.shape == (T, nx * ny * nf)
        xt = x.reshape(T, ix, iy, iz)
        for t in range(T):
            for xs in range(nx):
                for ys in range(ny):
                    patch = xt[t, xs:xs + fx, ys:ys + fy, :].reshape(-1)
                    want = W @ patch + b
                    got = y[t, (xs * ny + ys) * nf:(xs * ny + ys + 1) * nf]
                    np.testing.assert_allclose(got, want, rtol=1e-4,
                                               atol=1e-5)

    def test_distribute_identity_and_round_trip(self):
        c = M.DistributeComponent(InputDim=6, OutputDim=6)
        x = RNG.normal(size=(3, 6)).astype(np.float32)
        np.testing.assert_allclose(c.forward(x), x)
        c2 = M.DistributeComponent(InputDim=6, OutputDim=3)
        with pytest.raises(Exception):
            c2.forward(x)


class TestJaxBridge:
    def test_lstmp_jitted_matches_numpy(self):
        import jax
        jax.config.update("jax_platforms", "cpu")
        import jax.numpy as jnp
        from kaldi_tpu.nnet3.jax_bridge import compile_graph
        g, p = make_lstmp_graph(seed=7)
        B, T = 3, 12
        x = RNG.normal(size=(B, T, p["D"])).astype(np.float32)
        fn = compile_graph(g)
        got = np.asarray(jax.jit(fn)(jnp.asarray(x)))
        for b in range(B):
            want = g.forward(x[b])
            np.testing.assert_allclose(got[b], want, rtol=1e-4,
                                       atol=1e-4)

    def test_tdnn_acyclic_jitted_matches_numpy(self):
        """A TDNN-F-style acyclic graph through the bridge."""
        import jax
        import jax.numpy as jnp
        from kaldi_tpu.nnet3.jax_bridge import compile_graph
        rng = np.random.default_rng(2)
        D, H = 6, 8
        comps = {
            "tdnn": M.TdnnComponent(
                TimeOffsets=[-1, 0, 1],
                LinearParams=rng.normal(size=(H, 3 * D)).astype(
                    np.float32) * 0.3,
                BiasParams=rng.normal(size=H).astype(np.float32),
                OrthonormalConstraint=0.0, UseNaturalGradient=True),
            "relu": M.RectifiedLinearComponent(Dim=H),
            "bn": M.BatchNormComponent(
                Dim=H, BlockDim=H, Epsilon=1e-3, TargetRms=1.0,
                TestMode=True, Count=100.0,
                StatsMean=rng.normal(size=H).astype(np.float32) * 0.1,
                StatsVar=np.abs(rng.normal(size=H)).astype(
                    np.float32) + 0.5),
            "out_aff": M.NaturalGradientAffineComponent(
                LearningRate=0.001,
                LinearParams=rng.normal(size=(5, H)).astype(
                    np.float32) * 0.3,
                BiasParams=np.zeros(5, np.float32), RankIn=20,
                RankOut=80, UpdatePeriod=4, NumSamplesHistory=2000.0,
                Alpha=4.0),
        }
        nodes = [
            M.Node("input", "input", dim=D),
            M.Node("component", "tdnn", component="tdnn",
                   desc=M.parse_descriptor("input")),
            M.Node("component", "relu", component="relu",
                   desc=M.parse_descriptor("tdnn")),
            M.Node("component", "bn", component="bn",
                   desc=M.parse_descriptor("relu")),
            M.Node("component", "out_aff", component="out_aff",
                   desc=M.parse_descriptor(
                       "Append(Offset(bn, -3), bn, Offset(bn, 3))")),
            M.Node("output", "output",
                   desc=M.parse_descriptor("out_aff")),
        ]
        # Append of 3 contexts needs a 3x-wide affine
        comps["out_aff"].fields["LinearParams"] = rng.normal(
            size=(5, 3 * H)).astype(np.float32) * 0.2
        g = M.Nnet3Graph(nodes, comps)
        B, T = 2, 9
        x = RNG.normal(size=(B, T, D)).astype(np.float32)
        from kaldi_tpu.nnet3.jax_bridge import compile_graph
        import jax
        fn = compile_graph(g)
        got = np.asarray(jax.jit(fn)(x))
        for b in range(B):
            np.testing.assert_allclose(got[b], g.forward(x[b]),
                                       rtol=1e-4, atol=1e-4)

    def test_attention_and_statspool_jitted(self):
        import jax
        from kaldi_tpu.nnet3.jax_bridge import compile_graph
        rng = np.random.default_rng(3)
        H, kd, vd, L, R = 2, 3, 4, 1, 1
        ctx = L + 1 + R
        blk = 2 * kd + ctx + vd
        comps = {
            "attn": M.RestrictedAttentionComponent(
                NumHeads=H, KeyDim=kd, ValueDim=vd, NumLeftInputs=L,
                NumRightInputs=R, TimeStride=1,
                NumLeftInputsRequired=0, NumRightInputsRequired=0,
                OutputContext=True, KeyScale=0.5, StatsCount=0.0,
                EntropyStats=np.zeros(H, np.float32),
                PosteriorStats=np.zeros((H, ctx), np.float32)),
        }
        nodes = [
            M.Node("input", "input", dim=H * blk),
            M.Node("component", "attn", component="attn",
                   desc=M.parse_descriptor("input")),
            M.Node("output", "output", desc=M.parse_descriptor("attn")),
        ]
        g = M.Nnet3Graph(nodes, comps)
        B, T = 2, 7
        x = rng.normal(size=(B, T, H * blk)).astype(np.float32)
        fn = compile_graph(g)
        got = np.asarray(jax.jit(fn)(x))
        for b in range(B):
            np.testing.assert_allclose(got[b], g.forward(x[b]),
                                       rtol=1e-4, atol=1e-4)
