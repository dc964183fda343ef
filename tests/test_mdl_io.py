"""nnet3 model import/export (parity: nnet3/nnet-nnet.cc read/write,
am-nnet-simple.cc, nnet-simple-component.cc serialization)."""

import io

import numpy as np
import pytest

from kaldi_tpu.nnet3.mdl_io import (Desc, Nnet3Graph, chain_tdnnf_to_nnet3,
                                    parse_descriptor, read_nnet3_am,
                                    read_raw_nnet3, write_nnet3_am,
                                    write_raw_nnet3)


class TestDescriptors:
    def test_parse_simple(self):
        d = parse_descriptor("tdnn1.batchnorm")
        assert d.op == "node" and d.args == ["tdnn1.batchnorm"]

    def test_parse_nested(self):
        d = parse_descriptor(
            "Sum(Scale(0.66, Append(Offset(input, -1), input)), x.y)")
        assert d.op == "Sum"
        assert d.args[0].op == "Scale" and d.args[0].args[0] == 0.66
        ap = d.args[0].args[1]
        assert ap.op == "Append" and ap.args[0].op == "Offset"
        assert ap.args[0].args[1] == -1

    def test_repr_round_trip(self):
        s = "Sum(Scale(0.66, prev.bn), tdnnf3.batchnorm)"
        assert repr(parse_descriptor(s)) == s


REFERENCE_TEXT_RAW = """<Nnet3>
input-node name=input dim=3
component-node name=tdnn1.affine component=tdnn1.affine input=Append(Offset(input,-1),input,Offset(input,1))
component-node name=tdnn1.relu component=tdnn1.relu input=tdnn1.affine
output-node name=output input=tdnn1.relu objective=linear

<NumComponents> 2
<ComponentName> tdnn1.affine <NaturalGradientAffineComponent> <LearningRate> 0.001 <LinearParams>  [
  1 0 0 0 1 0 0 0 1 
  0 1 0 1 0 1 0 1 0 ]
<BiasParams>  [ 0.5 -0.5 ]
<RankIn> 20 <RankOut> 80 <UpdatePeriod> 4 <NumSamplesHistory> 2000 <Alpha> 4 </NaturalGradientAffineComponent>
<ComponentName> tdnn1.relu <RectifiedLinearComponent> <Dim> 2 <ValueAvg>  [ ]
<DerivAvg>  [ ]
<Count> 0 </RectifiedLinearComponent>
</Nnet3>
"""


class TestImportReferenceText:
    def test_reads_and_evaluates(self, tmp_path):
        p = tmp_path / "final.raw"
        p.write_text(REFERENCE_TEXT_RAW)
        g = read_raw_nnet3(str(p))
        assert len(g.components) == 2
        T = 6
        rng = np.random.default_rng(0)
        x = rng.normal(size=(T, 3)).astype(np.float32)
        out = g.forward(x)
        # manual: spliced [x(t-1), x(t), x(t+1)] (edge-clamped),
        # W row0 = picks x(t-1)[0]+x(t)[1]+x(t+1)[2], row1 = the rest
        t = np.arange(T)
        spl = np.concatenate([x[np.clip(t - 1, 0, T - 1)], x,
                              x[np.clip(t + 1, 0, T - 1)]], axis=1)
        W = np.array([[1, 0, 0, 0, 1, 0, 0, 0, 1],
                      [0, 1, 0, 1, 0, 1, 0, 1, 0]], np.float32)
        expected = np.maximum(spl @ W.T + np.array([0.5, -0.5]), 0.0)
        np.testing.assert_allclose(out, expected, atol=1e-6)


class TestBinaryRoundTrip:
    def _graph(self):
        txt = io.BytesIO(REFERENCE_TEXT_RAW.encode())
        return Nnet3Graph.read(txt, binary=False)

    def test_raw_round_trip(self, tmp_path):
        g = self._graph()
        p = str(tmp_path / "m.raw")
        write_raw_nnet3(g, p, binary=True)
        g2 = read_raw_nnet3(p)
        x = np.random.default_rng(1).normal(size=(5, 3)).astype(np.float32)
        np.testing.assert_allclose(g2.forward(x), g.forward(x), atol=1e-6)

    def test_text_round_trip(self, tmp_path):
        g = self._graph()
        p = str(tmp_path / "m_text.raw")
        write_raw_nnet3(g, p, binary=False)
        g2 = read_raw_nnet3(p)
        x = np.random.default_rng(2).normal(size=(5, 3)).astype(np.float32)
        np.testing.assert_allclose(g2.forward(x), g.forward(x), atol=1e-5)

    def test_mdl_round_trip(self, tmp_path):
        from kaldi_tpu.hmm.topology import HmmTopology
        from kaldi_tpu.hmm.transition_model import TransitionModel
        from kaldi_tpu.tree import monophone_context_dependency
        topo = HmmTopology.chain_topology([1, 2])
        npc = {p: topo.num_pdf_classes(p) for p in (1, 2)}
        tm = TransitionModel(topo, monophone_context_dependency([1, 2],
                                                                npc))
        g = self._graph()
        p = str(tmp_path / "final.mdl")
        write_nnet3_am(p, tm, g, left_context=1, right_context=1,
                       priors=np.array([0.25, 0.75], np.float32))
        tm2, g2, info = read_nnet3_am(p)
        assert tm2.num_pdfs == tm.num_pdfs
        assert info["left_context"] == 1
        np.testing.assert_allclose(info["priors"], [0.25, 0.75], atol=1e-7)
        x = np.random.default_rng(3).normal(size=(4, 3)).astype(np.float32)
        np.testing.assert_allclose(g2.forward(x), g.forward(x), atol=1e-6)


@pytest.mark.slow
class TestChainTdnnfExport:
    def test_export_matches_flax_model(self):
        import jax
        import jax.numpy as jnp
        from kaldi_tpu.nnet3.models import ChainTdnnf, ChainTdnnfConfig
        cfg = ChainTdnnfConfig(feat_dim=8, num_pdfs=6, hidden_dim=16,
                               bottleneck_dim=4, prefinal_dim=8,
                               num_layers=5, subsample_layer=3,
                               frame_subsampling_factor=3)
        model = ChainTdnnf(cfg, train=False)
        rng = jax.random.PRNGKey(0)
        T = 45
        feats = jax.random.normal(jax.random.PRNGKey(1), (1, T, 8))
        variables = model.init(rng, jnp.zeros((1, T, 8)))
        chain_out, xent_out = model.apply(variables, feats)

        g = chain_tdnnf_to_nnet3(model, variables)
        full = g.forward(np.asarray(feats[0]))
        sub = full[::cfg.frame_subsampling_factor]
        # interior frames (edge clamping differs at the boundaries
        # because our model clamps at the subsampled rate)
        interior = slice(4, sub.shape[0] - 4)
        np.testing.assert_allclose(sub[interior],
                                   np.asarray(chain_out[0])[interior],
                                   atol=2e-4)
        xf = g.forward(np.asarray(feats[0]), output_name="output-xent")
        np.testing.assert_allclose(
            xf[::3][interior], np.asarray(xent_out[0])[interior],
            atol=2e-4)

    def test_export_import_round_trip(self, tmp_path):
        import jax
        import jax.numpy as jnp
        from kaldi_tpu.nnet3.models import ChainTdnnf, ChainTdnnfConfig
        cfg = ChainTdnnfConfig(feat_dim=6, num_pdfs=4, hidden_dim=8,
                               bottleneck_dim=4, prefinal_dim=8,
                               num_layers=4, subsample_layer=2,
                               frame_subsampling_factor=3)
        model = ChainTdnnf(cfg, train=False)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 30, 6)))
        g = chain_tdnnf_to_nnet3(model, variables)
        p = str(tmp_path / "exported.raw")
        write_raw_nnet3(g, p, binary=True)
        g2 = read_raw_nnet3(p)
        x = np.random.default_rng(4).normal(size=(30, 6)).astype(np.float32)
        np.testing.assert_allclose(g2.forward(x), g.forward(x), atol=1e-5)


@pytest.mark.slow
class TestIvectorInputExport:
    def test_ivector_model_export_matches(self):
        import jax
        import jax.numpy as jnp
        from kaldi_tpu.nnet3.models import ChainTdnnf, ChainTdnnfConfig
        cfg = ChainTdnnfConfig(feat_dim=8, ivector_dim=5, num_pdfs=6,
                               hidden_dim=16, bottleneck_dim=4,
                               prefinal_dim=8, num_layers=4,
                               subsample_layer=2,
                               frame_subsampling_factor=3)
        model = ChainTdnnf(cfg, train=False)
        T = 30
        feats = jax.random.normal(jax.random.PRNGKey(1), (1, T, 8))
        iv = jax.random.normal(jax.random.PRNGKey(2), (1, 5))
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, T, 8)), jnp.zeros((1, 5)))
        chain_out, _ = model.apply(variables, feats, iv)
        g = chain_tdnnf_to_nnet3(model, variables)
        full = g.forward(np.asarray(feats[0]), ivector=np.asarray(iv[0]))
        sub = full[::3]
        interior = slice(3, sub.shape[0] - 3)
        np.testing.assert_allclose(sub[interior],
                                   np.asarray(chain_out[0])[interior],
                                   atol=2e-4)
        # the exported graph demands the ivector
        with pytest.raises(Exception):
            g.forward(np.asarray(feats[0]))
