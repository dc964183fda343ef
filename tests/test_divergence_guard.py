"""Diverged-model handling (parity: the reference drops diverged jobs
from the periodic model average — get_successful_models,
steps/libs/nnet3/train/chain_objf/acoustic_model.py:332 — and falls
back to the previous iteration's model on objective collapse; the
synchronous-trainer equivalent is DivergenceGuard's
snapshot/reject/rollback with LR backoff)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from kaldi_tpu.chain.objective import ChainTrainingOptions
from kaldi_tpu.parallel.recovery import DivergenceGuard
from kaldi_tpu.parallel.trainer import make_sharded_train_step
from tests.test_backstitch import _setup


def _params_finite(params) -> bool:
    leaves = jax.tree.leaves(params)
    return all(bool(jnp.all(jnp.isfinite(x))) for x in leaves)


def _run(poison_step=None, n_steps=14, guard=None):
    model, tx, state, den, batch = _setup(lr=0.05)
    opts = ChainTrainingOptions(leaky_hmm_coefficient=0.1)
    step_fn = make_sharded_train_step(model, tx, opts, den,
                                      donate=False)
    objfs = []
    for i in range(n_steps):
        b = dict(batch)
        if i == poison_step:
            # a corrupt minibatch (e.g. a bad shard read): non-finite
            # features poison the whole step
            b["feats"] = batch["feats"] * jnp.nan
        if guard is not None:
            b["lr_scale"] = jnp.float32(guard.lr_scale)
        state, metrics = step_fn(state, b)
        objf = float(metrics["objf"])
        if guard is not None:
            state, ok = guard.observe(
                state, objf, float(metrics["grad_norm"]))
            if not ok:
                continue
        objfs.append(objf)
    return state, objfs


def test_healthy_training_untouched():
    guard = DivergenceGuard(snapshot_every=5)
    state_g, objfs_g = _run(guard=guard)
    assert guard.rejects == 0
    assert guard.lr_scale == 1.0
    assert all(np.isfinite(objfs_g))


def test_poisoned_batch_rolls_back_and_recovers():
    # without the guard the poisoned step corrupts the params
    state_bad, objfs_bad = _run(poison_step=6)
    bad_tail = objfs_bad[7:]
    unguarded_broken = (not _params_finite(state_bad.params)) or \
        any(not np.isfinite(o) for o in bad_tail)

    guard = DivergenceGuard(snapshot_every=2, collapse_tol=5.0)
    state_ok, objfs_ok = _run(poison_step=6, guard=guard)
    assert guard.rejects >= 1, "the poisoned step must be rejected"
    assert guard.lr_scale < 1.0 or guard.rejects >= 1
    assert _params_finite(state_ok.params)
    assert all(np.isfinite(objfs_ok))
    # the rollback must leave training in a state comparable to the
    # healthy run's neighbourhood (the poisoned step left no trace)
    _state_ref, objfs_ref = _run()
    assert abs(objfs_ok[-1] - objfs_ref[-1]) < 2.0, \
        (objfs_ok[-1], objfs_ref[-1])
    # sanity: the scenario is actually dangerous without a guard OR
    # the collapse detection fired (objf drop), either way the guard
    # must have engaged — asserted above; record the unguarded state
    # for the log
    print(f"unguarded broken={unguarded_broken} "
          f"guard rejects={guard.rejects} lr={guard.lr_scale:.3g}")


def test_too_many_rejects_raises():
    guard = DivergenceGuard(snapshot_every=1, max_rejects=3)
    model, tx, state, den, batch = _setup(lr=0.05)
    opts = ChainTrainingOptions(leaky_hmm_coefficient=0.1)
    step_fn = make_sharded_train_step(model, tx, opts, den,
                                      donate=False)
    # one good step so a snapshot exists
    state, metrics = step_fn(state, dict(batch,
                                         lr_scale=jnp.float32(1.0)))
    state, ok = guard.observe(state, float(metrics["objf"]))
    assert ok
    with pytest.raises(RuntimeError, match="cannot recover"):
        for _ in range(10):
            state, _ok = guard.observe(state, float("nan"))
