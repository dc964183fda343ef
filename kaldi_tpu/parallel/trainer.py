"""Sharded chain training step.

Replaces the reference's N-parallel-jobs + nnet3-average outer loop
(steps/libs/nnet3/train/chain_objf/acoustic_model.py:166-340) with a
single pjit'd data-parallel step: per-device microbatches, gradient
psum over the data axis (inserted by XLA from the shardings), optional
tensor parallelism over hidden dims, max-param-change clipping like
UpdateParamsWithMaxChange (nnet-chain-training.cc).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from kaldi_tpu.chain.objective import ChainTrainingOptions, chain_loss
from kaldi_tpu.nnet3.models import ChainTdnnf, ChainTdnnfConfig


@functools.partial(jax.tree_util.register_dataclass,
                   data_fields=["params", "batch_stats", "opt_state", "step"],
                   meta_fields=[])
@dataclass
class ChainTrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: int = 0


def make_chain_train_state(cfg: ChainTdnnfConfig, rng,
                           learning_rate: float = 1e-3,
                           momentum: float = 0.0,
                           max_param_change: float = 2.0,
                           example_T: int = 48):
    """Initialize model + optimizer. Returns (state, model, tx)."""
    model = ChainTdnnf(cfg, train=True)
    feats = jnp.zeros((2, example_T, cfg.feat_dim), jnp.float32)
    variables = model.init(rng, feats)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = optax.chain(
        optax.clip_by_global_norm(max_param_change),
        optax.sgd(learning_rate, momentum=momentum) if momentum
        else optax.adam(learning_rate),
    )
    opt_state = tx.init(params)
    return ChainTrainState(params, batch_stats, opt_state, 0), model, tx


def make_sharded_train_step(model: ChainTdnnf, tx, opts: ChainTrainingOptions,
                            den_graph, mesh: Optional[Mesh] = None,
                            donate: bool = True,
                            backstitch_scale: float = 0.0) -> Callable:
    """Returns train_step(state, batch) -> (state, metrics).

    batch dict:
      feats        (B, T, D)
      num_graphs   tuple of 6 stacked arrays (chain.graphs.batch_pack)
    Shardings: batch over 'data'; params per parallel.mesh rules.

    backstitch_scale (alpha > 0) enables backstitch SGD
    (nnet3/nnet-utils.h, Wang et al. 2017): first take a NEGATIVE step
    of size alpha*lr at the current point, then a (1+alpha)*lr step
    from there — two gradient evaluations per minibatch; the
    optimizer state is advanced only by the second (corrective) step
    so momentum/Adam statistics track the main direction.
    """
    g = den_graph.graph
    den_arrays = tuple(jnp.asarray(a) for a in
                       (g.src, g.dst, g.pdf, g.log_prob, g.initial, g.final))

    def loss_fn(params, batch_stats, batch):
        variables = {"params": params, "batch_stats": batch_stats}
        (chain_out, xent_out), updates = model.apply(
            variables, batch["feats"], mutable=["batch_stats"])
        from kaldi_tpu.chain.graphs import DenominatorGraph, PackedGraph
        pg = PackedGraph(*den_arrays)
        objf, aux = chain_loss(opts, DenominatorGraph(pg),
                               batch["num_graphs"], chain_out, xent_out,
                               batch.get("num_posteriors"))
        return -objf, (aux, updates["batch_stats"])

    def train_step(state: ChainTrainState, batch) -> Tuple[ChainTrainState, Dict]:
        # optional runtime LR multiplier (a traced scalar, so the
        # divergence guard's backoff does not recompile the step)
        lr_scale = batch.get("lr_scale", 1.0)
        (loss, (aux, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, batch)
        if backstitch_scale > 0:
            # backstitch step 1: ascend by alpha * update(g)
            upd1, _ = tx.update(grads, state.opt_state, state.params)
            mid = optax.apply_updates(
                state.params,
                jax.tree.map(lambda u: -backstitch_scale * lr_scale * u,
                             upd1))
            # step 2: descend by (1+alpha) * update(g(mid))
            (loss, (aux, new_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(mid, state.batch_stats, batch)
            upd2, new_opt = tx.update(grads, state.opt_state, mid)
            new_params = optax.apply_updates(
                mid, jax.tree.map(
                    lambda u: (1 + backstitch_scale) * lr_scale * u,
                    upd2))
        else:
            updates, new_opt = tx.update(grads, state.opt_state,
                                         state.params)
            new_params = optax.apply_updates(
                state.params,
                jax.tree.map(lambda u: lr_scale * u, updates))
        metrics = {"objf": -loss, **aux,
                   "grad_norm": optax.global_norm(grads)}
        return ChainTrainState(new_params, new_stats, new_opt,
                               state.step + 1), metrics

    if mesh is None:
        return jax.jit(train_step, donate_argnums=(0,) if donate else ())

    from kaldi_tpu.parallel.mesh import batch_sharding, param_shardings
    with mesh:
        psh = None  # resolved lazily at first call via jit shardings

    def sharded_step(state, batch):
        return train_step(state, batch)

    # rely on jit + explicit input shardings applied by the caller
    # (see __graft_entry__.dryrun_multichip for the canonical usage)
    return jax.jit(sharded_step, donate_argnums=(0,) if donate else ())


def train_chain_from_egs(den_fst_path: str, egs_rspecifier: str,
                         model_out: str, num_epochs: int = 4,
                         minibatch_size: int = 32,
                         learning_rate: float = 1e-3,
                         hidden_dim: int = 256,
                         bottleneck_dim: int = 64,
                         num_layers: int = 6,
                         xent_regularize: float = 0.1,
                         frame_subsampling_factor: int = 3,
                         seed: int = 0,
                         divergence_guard: bool = True) -> Tuple[int, float]:
    """nnet3-chain-train: train the native TDNN-F from prepared
    chain egs + a den.fst, write an exporter raw .mdl (the reference's
    raw-nnet in/out contract, src/chainbin/nnet3-chain-train.cc).
    divergence_guard enables snapshot/rollback + LR backoff on
    non-finite or collapsing objectives (parallel/recovery.py — the
    reference's get_successful_models / iteration-restart policy).
    Returns (num_steps, final_objf)."""
    from kaldi_tpu.chain.graphs import den_graph_from_fst_file
    from kaldi_tpu.nnet3.egs import merged_minibatches
    from kaldi_tpu.nnet3.mdl_io import (chain_tdnnf_to_nnet3,
                                        write_raw_nnet3)
    den_graph = den_graph_from_fst_file(den_fst_path)
    num_pdfs = int(den_graph.graph.pdf.max()) + 1
    state = model = step_fn = None
    opts = ChainTrainingOptions(xent_regularize=xent_regularize)
    n_steps, objf = 0, float("nan")
    guard = None
    if divergence_guard:
        from kaldi_tpu.parallel.recovery import DivergenceGuard
        guard = DivergenceGuard()
    for _epoch in range(num_epochs):
        for batch in merged_minibatches(egs_rspecifier, minibatch_size,
                                        drop_last=False):
            # the model pads its convs internally (SAME), so the extra
            # acoustic context stored with each eg is trimmed to keep
            # output frames aligned with the numerator graph
            lc = int(batch.get("left_context", 0))
            rc = int(batch.get("right_context", 0))
            feats = np.asarray(batch["feats"])
            feats = feats[:, lc:feats.shape[1] - rc if rc else None]
            feats = jnp.asarray(feats)
            if state is None:
                # the subsample point must fall INSIDE the stack or the
                # output stays at the input rate and never matches the
                # numerator graph (the config default of 8 assumes the
                # 17-layer flagship)
                cfg = ChainTdnnfConfig(
                    feat_dim=int(feats.shape[-1]),
                    num_pdfs=max(num_pdfs,
                                 int(batch["num_graphs"][2].max()) + 1),
                    hidden_dim=hidden_dim,
                    bottleneck_dim=bottleneck_dim,
                    prefinal_dim=max(hidden_dim // 2, bottleneck_dim),
                    num_layers=num_layers,
                    subsample_layer=min(8, max(1, num_layers // 2)),
                    frame_subsampling_factor=frame_subsampling_factor)
                state, model, tx = make_chain_train_state(
                    cfg, jax.random.PRNGKey(seed),
                    learning_rate=learning_rate,
                    example_T=int(feats.shape[1]))
                step_fn = make_sharded_train_step(model, tx, opts,
                                                  den_graph)
            step_batch = {"feats": feats,
                          "num_graphs": tuple(jnp.asarray(a) for a in
                                              batch["num_graphs"])}
            if guard is not None:
                step_batch["lr_scale"] = jnp.float32(guard.lr_scale)
            state, metrics = step_fn(state, step_batch)
            objf = float(metrics["objf"])
            if guard is not None and n_steps > 0:
                state, ok = guard.observe(
                    state, objf, float(metrics["grad_norm"]))
                if not ok:
                    continue
            if n_steps == 0 and objf < -1e9:
                raise ValueError(
                    "train_chain_from_egs: numerator forward-backward "
                    "returned -inf on the first minibatch — the model's "
                    "output frame rate does not match the egs' "
                    "supervision (check frame-subsampling-factor / "
                    "chunk-width)")
            n_steps += 1
    if state is None:
        raise ValueError("train_chain_from_egs: no examples")
    graph = chain_tdnnf_to_nnet3(
        model, {"params": jax.device_get(state.params),
                "batch_stats": jax.device_get(state.batch_stats)})
    write_raw_nnet3(graph, model_out)
    return n_steps, objf


def train_xent_from_egs(egs_rspecifier: str, model_out: str,
                        num_epochs: int = 4, minibatch_size: int = 32,
                        learning_rate: float = 1e-3,
                        hidden_dim: int = 256,
                        bottleneck_dim: int = 64,
                        num_layers: int = 4,
                        num_pdfs: int = 0,
                        seed: int = 0) -> Tuple[int, float]:
    """nnet3-train: plain frame-level cross-entropy training from
    NnetExample egs (src/nnet3bin/nnet3-train.cc contract: egs in,
    raw nnet out).  The model is the native TDNN-F stack at frame
    rate 1; targets are the egs' sparse per-frame posteriors."""
    from kaldi_tpu.nnet3.egs import ExampleHolder
    from kaldi_tpu.nnet3.mdl_io import (chain_tdnnf_to_nnet3,
                                        write_raw_nnet3)
    from kaldi_tpu.util.table import SequentialTableReader

    egs = [eg for _k, eg in SequentialTableReader(ExampleHolder(),
                                                  egs_rspecifier)]
    if not egs:
        raise ValueError("train_xent_from_egs: no examples")
    if num_pdfs <= 0:
        num_pdfs = 1 + max((p for eg in egs for fr in eg.targets
                            for p, _w in fr), default=0)
    feat_dim = egs[0].feats.shape[1]
    # group egs by shape so each minibatch stacks cleanly
    by_shape: dict = {}
    for eg in egs:
        by_shape.setdefault((eg.feats.shape[0], len(eg.targets),
                             eg.left_context), []).append(eg)
    cfg = ChainTdnnfConfig(
        feat_dim=feat_dim, num_pdfs=num_pdfs, hidden_dim=hidden_dim,
        bottleneck_dim=bottleneck_dim,
        prefinal_dim=max(hidden_dim // 2, bottleneck_dim),
        num_layers=num_layers, subsample_layer=10 ** 9,
        frame_subsampling_factor=1)
    model = ChainTdnnf(cfg, train=True)
    rng = jax.random.PRNGKey(seed)
    T0 = egs[0].feats.shape[0]
    variables = model.init(rng, jnp.zeros((2, T0, feat_dim)))
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = optax.adam(learning_rate)
    opt_state = tx.init(params)

    import functools

    @functools.partial(jax.jit, static_argnums=(5, 6))
    def step(params, batch_stats, opt_state, feats, tgt, lc, n_out):
        def loss_fn(p):
            out, new_vars = model.apply(
                {"params": p, "batch_stats": batch_stats}, feats,
                mutable=["batch_stats"])
            chain_out, _xent = out
            # the exported graph's output is the chain head: train it
            logp = jax.nn.log_softmax(chain_out, axis=-1)
            # trim context rows so output frames align with targets
            logp = jax.lax.dynamic_slice_in_dim(logp, lc, n_out,
                                                axis=1)
            ce = -(tgt * logp).sum() / jnp.maximum(tgt.sum(), 1.0)
            return ce, new_vars["batch_stats"]
        (ce, new_bs), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_bs, \
            opt_state2, ce

    n_steps, objf = 0, float("nan")
    rng_np = np.random.default_rng(seed)
    for _epoch in range(num_epochs):
        for shape_key in sorted(by_shape):
            group = by_shape[shape_key]
            order = rng_np.permutation(len(group))
            for i0 in range(0, len(group), minibatch_size):
                mb = [group[j] for j in order[i0:i0 + minibatch_size]]
                feats = jnp.asarray(np.stack([eg.feats for eg in mb]))
                n_out = len(mb[0].targets)
                tgt = np.zeros((len(mb), n_out, num_pdfs), np.float32)
                for b, eg in enumerate(mb):
                    for t, fr in enumerate(eg.targets):
                        for p, w in fr:
                            tgt[b, t, p] += w
                params, batch_stats, opt_state, ce = step(
                    params, batch_stats, opt_state, feats,
                    jnp.asarray(tgt), int(mb[0].left_context),
                    int(n_out))
                objf = -float(ce)
                n_steps += 1
    graph = chain_tdnnf_to_nnet3(
        model, {"params": jax.device_get(params),
                "batch_stats": jax.device_get(batch_stats)})
    write_raw_nnet3(graph, model_out)
    return n_steps, objf
