"""xconfig importer: parse + build + run the librispeech-style chain
TDNN-F config and an LSTM config."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kaldi_tpu.nnet3.xconfig import (build_xconfig_model, parse_xconfig)

TDNNF_CONFIG = """
input dim=100 name=ivector
input dim=40 name=input

# the librispeech tdnn_1d prologue (trimmed depth for the test)
fixed-affine-layer name=lda input=Append(-1,0,1,ReplaceIndex(ivector, t, 0)) dim=220
relu-batchnorm-layer name=tdnn1 dim=128
tdnnf-layer name=tdnnf2 dim=128 bottleneck-dim=32 time-stride=1
tdnnf-layer name=tdnnf3 dim=128 bottleneck-dim=32 time-stride=1
tdnnf-layer name=tdnnf4 dim=128 bottleneck-dim=32 time-stride=3
linear-component name=prefinal-l dim=64
prefinal-layer name=prefinal-chain input=prefinal-l big-dim=128 small-dim=64
output-layer name=output include-log-softmax=false dim=$num_targets
prefinal-layer name=prefinal-xent input=prefinal-l big-dim=128 small-dim=64
output-layer name=output-xent dim=$num_targets
"""

LSTM_CONFIG = """
input dim=40 name=input
relu-batchnorm-layer name=tdnn1 dim=64
fast-lstmp-layer name=lstm1 cell-dim=64 recurrent-projection-dim=16 non-recurrent-projection-dim=16
output-layer name=output dim=50
"""


class TestParse:
    def test_parse_layers(self):
        layers = parse_xconfig(TDNNF_CONFIG, {"num_targets": 200})
        types = [l.layer_type for l in layers]
        assert types[0] == "input" and "tdnnf-layer" in types
        out = [l for l in layers if l.name == "output"][0]
        assert out.get_int("dim") == 200

    def test_append_stays_whole(self):
        layers = parse_xconfig(TDNNF_CONFIG, {"num_targets": 10})
        lda = [l for l in layers if l.name == "lda"][0]
        assert lda.get("input").startswith("Append(")


class TestBuildRun:
    def test_tdnnf_model_runs(self):
        model = build_xconfig_model(TDNNF_CONFIG,
                                    {"num_targets": 120}, train=False)
        B, T = 2, 24
        inputs = {"input": jnp.zeros((B, T, 40)),
                  "ivector": jnp.zeros((B, 100))}
        variables = model.init(jax.random.PRNGKey(0), inputs)
        out = model.apply(variables, inputs)
        assert set(out) == {"output", "output-xent"}
        assert out["output"].shape == (B, T, 120)
        # xent head is log-softmax normalized
        s = np.exp(np.asarray(out["output-xent"])).sum(-1)
        np.testing.assert_allclose(s, 1.0, atol=1e-4)

    def test_lstm_model_runs(self):
        model = build_xconfig_model(LSTM_CONFIG, train=False)
        inputs = {"input": jnp.ones((1, 10, 40))}
        variables = model.init(jax.random.PRNGKey(1), inputs)
        out = model.apply(variables, inputs)
        assert out["output"].shape == (1, 10, 50)

    def test_offsets_shift_time(self):
        cfg = """
input dim=4 name=input
output-layer name=output input=Offset(input, -1) dim=4 include-log-softmax=false
"""
        model = build_xconfig_model(cfg, train=False)
        x = jnp.asarray(np.arange(8, dtype=np.float32).reshape(1, 2, 4))
        variables = model.init(jax.random.PRNGKey(0), {"input": x})
        # check shift semantics directly through the descriptor
        from kaldi_tpu.nnet3.xconfig import _shift
        sh = _shift(x, -1)
        np.testing.assert_array_equal(np.asarray(sh[0, 1]),
                                      np.asarray(x[0, 0]))
        np.testing.assert_array_equal(np.asarray(sh[0, 0]),
                                      np.asarray(x[0, 0]))


class TestNewLayerFamilies:
    def test_cnn_tdnnf_model(self):
        """CNN front-end + TDNN-F body from xconfig (the cnn_tdnn
        recipe family)."""
        import jax
        text = """
input name=input dim=40
conv-relu-batchnorm-layer name=cnn1 height-in=40 num-filters-out=8 time-kernel=3 height-kernel=3 height-subsample-out=2
conv-relu-batchnorm-layer name=cnn2 height-in=20 num-filters-out=4 time-kernel=3 height-kernel=3
tdnnf-layer name=tdnnf1 dim=32 bottleneck-dim=8 time-stride=1
output-layer name=output dim=10 include-log-softmax=false
"""
        model = build_xconfig_model(text, train=False)
        x = {"input": jnp.zeros((2, 21, 40))}
        variables = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(variables, x)
        assert out["output"].shape == (2, 21, 10)
        # conv params present with the right kernel shape
        k = variables["params"]["cnn1_conv"]["kernel"]
        assert k.shape == (3, 3, 1, 8)

    def test_gru_and_attention_layers(self):
        import jax
        text = """
input name=input dim=12
gru-layer name=gru1 cell-dim=16 recurrent-projection-dim=8
attention-relu-renorm-layer name=att1 num-heads=2 key-dim=8 value-dim=8 num-left-inputs=2 num-right-inputs=1
output-layer name=output dim=5 include-log-softmax=true
"""
        model = build_xconfig_model(text, train=False)
        x = {"input": jnp.zeros((1, 15, 12))}
        variables = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(variables, x)
        assert out["output"].shape == (1, 15, 5)
        # log-softmax output sums to 1
        np.testing.assert_allclose(
            np.exp(np.asarray(out["output"][0, 0])).sum(), 1.0, atol=1e-4)
