"""Backstitch SGD (parity: the --backstitch-training-scale option of
steps/nnet3/chain/train.py; Wang et al. 2017): a negative step of
alpha*lr then a (1+alpha)*lr corrective step, two gradient evals per
minibatch."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from kaldi_tpu.chain.graphs import PackedGraph, batch_pack
from kaldi_tpu.chain.objective import ChainTrainingOptions
from kaldi_tpu.chain.supervision import DenominatorGraph
from kaldi_tpu.nnet3.models import ChainTdnnf, ChainTdnnfConfig
from kaldi_tpu.parallel.trainer import (ChainTrainState,
                                        make_sharded_train_step)

CFG = ChainTdnnfConfig(feat_dim=5, num_pdfs=8, hidden_dim=16,
                       bottleneck_dim=4, prefinal_dim=8, num_layers=2,
                       subsample_layer=1, frame_subsampling_factor=3)


def _setup(lr=0.1):
    model = ChainTdnnf(CFG, train=True)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((2, 12, CFG.feat_dim)))
    tx = optax.sgd(lr)
    state = ChainTrainState(variables["params"],
                            variables.get("batch_stats", {}),
                            tx.init(variables["params"]), 0)
    rng = np.random.default_rng(0)
    S, A = 3, 8
    den = DenominatorGraph(PackedGraph(
        src=rng.integers(0, S, A).astype(np.int32),
        dst=rng.integers(0, S, A).astype(np.int32),
        pdf=rng.integers(0, CFG.num_pdfs, A).astype(np.int32),
        log_prob=np.full(A, -1.0, np.float32),
        initial=np.full(S, -np.log(S), np.float32),
        final=np.zeros(S, np.float32)))
    Tout = 4
    nums = []
    for _ in range(2):
        pdfs = rng.integers(0, CFG.num_pdfs, Tout).astype(np.int32)
        ninf = -1e30
        initial = np.full(Tout + 1, ninf, np.float32)
        initial[0] = 0.0
        final = np.full(Tout + 1, ninf, np.float32)
        final[Tout] = 0.0
        nums.append(PackedGraph(np.arange(Tout, dtype=np.int32),
                                np.arange(1, Tout + 1).astype(np.int32),
                                pdfs, np.zeros(Tout, np.float32),
                                initial, final))
    batch = {"feats": jnp.asarray(rng.normal(
        size=(2, 12, CFG.feat_dim)).astype(np.float32)),
        "num_graphs": tuple(jnp.asarray(a) for a in batch_pack(nums))}
    return model, tx, state, den, batch


def test_backstitch_matches_manual_two_step():
    lr, alpha = 0.1, 0.3
    model, tx, state, den, batch = _setup(lr)
    opts = ChainTrainingOptions(leaky_hmm_coefficient=0.1)
    step_bs = make_sharded_train_step(model, tx, opts, den, donate=False,
                                      backstitch_scale=alpha)
    new_state, metrics = step_bs(state, batch)

    # manual: g1 = grad at x; mid = x + alpha*lr*g1;
    # x' = mid - (1+alpha)*lr*g(mid)      (plain SGD, stateless)
    def loss(params):
        from kaldi_tpu.chain.objective import chain_loss
        (chain_out, xent_out), _ = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            batch["feats"], mutable=["batch_stats"])
        objf, _ = chain_loss(opts, den, batch["num_graphs"], chain_out,
                             xent_out)
        return -objf

    g1 = jax.grad(loss)(state.params)
    mid = jax.tree.map(lambda p, g: p + alpha * lr * g, state.params, g1)
    g2 = jax.grad(loss)(mid)
    expected = jax.tree.map(lambda p, g: p - (1 + alpha) * lr * g, mid, g2)
    for a, b in zip(jax.tree.leaves(expected),
                    jax.tree.leaves(new_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6)


def test_backstitch_zero_is_plain_sgd():
    lr = 0.1
    model, tx, state, den, batch = _setup(lr)
    opts = ChainTrainingOptions(leaky_hmm_coefficient=0.1)
    plain = make_sharded_train_step(model, tx, opts, den, donate=False)
    bs0 = make_sharded_train_step(model, tx, opts, den, donate=False,
                                  backstitch_scale=0.0)
    s1, _ = plain(state, batch)
    s2, _ = bs0(state, batch)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_backstitch_trains():
    model, tx, state, den, batch = _setup(0.05)
    opts = ChainTrainingOptions(leaky_hmm_coefficient=0.1)
    step = make_sharded_train_step(model, tx, opts, den, donate=False,
                                   backstitch_scale=0.3)
    objs = []
    for _ in range(8):
        state, metrics = step(state, batch)
        objs.append(float(metrics["objf"]))
    assert all(np.isfinite(objs))
    assert objs[-1] > objs[0]
