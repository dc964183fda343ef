"""Streaming neural inference == offline forward (interior frames)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kaldi_tpu.nnet3.models import ChainTdnnf, ChainTdnnfConfig
from kaldi_tpu.nnet3.streaming import OnlineNnetScorer


def test_streaming_matches_offline():
    cfg = ChainTdnnfConfig(feat_dim=8, num_pdfs=20, hidden_dim=32,
                           bottleneck_dim=8, prefinal_dim=16,
                           num_layers=4, subsample_layer=2,
                           frame_subsampling_factor=1)
    model = ChainTdnnf(cfg, train=False)
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(90, 8)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 30, 8)))

    def forward(x):
        out, _ = model.apply(variables, jnp.asarray(x))
        return out

    offline = np.asarray(forward(feats[None]))[0]
    # receptive field of 4 tdnnf layers with stride<=3: ~24 frames
    scorer = OnlineNnetScorer(forward, left_context=30, right_context=30)
    outs = []
    for chunk in np.array_split(feats, 6):
        outs.append(scorer.accept_features(chunk))
    outs.append(scorer.finish())
    streamed = np.concatenate([o for o in outs if o.size], axis=0)
    assert streamed.shape == offline.shape
    # interior frames exact (edges differ due to replication padding)
    np.testing.assert_allclose(streamed[30:-30], offline[30:-30], atol=1e-4)


def test_streaming_with_subsampling():
    cfg = ChainTdnnfConfig(feat_dim=8, num_pdfs=12, hidden_dim=32,
                           bottleneck_dim=8, prefinal_dim=16,
                           num_layers=3, subsample_layer=2,
                           frame_subsampling_factor=3)
    model = ChainTdnnf(cfg, train=False)
    variables = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 30, 8)))

    def forward(x):
        out, _ = model.apply(variables, jnp.asarray(x))
        return out

    rng = np.random.default_rng(1)
    feats = rng.normal(size=(90, 8)).astype(np.float32)
    offline = np.asarray(forward(feats[None]))[0]
    scorer = OnlineNnetScorer(forward, left_context=30, right_context=30,
                              subsample=3)
    outs = [scorer.accept_features(c) for c in np.array_split(feats, 4)]
    outs.append(scorer.finish())
    streamed = np.concatenate([o for o in outs if o.size], axis=0)
    assert streamed.shape[0] == offline.shape[0]
    np.testing.assert_allclose(streamed[10:-10], offline[10:-10], atol=1e-4)
