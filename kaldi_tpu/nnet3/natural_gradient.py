"""Online natural-gradient preconditioning (capability parity:
nnet3/natural-gradient-online.h:414 OnlineNaturalGradient and its use
in NaturalGradientAffineComponent).

The reference maintains a low-rank online estimate of the Fisher
factors per affine component and multiplies gradients by the
approximate inverse Fisher, which is what stabilizes its
parallel-SGD + model-averaging scheme. Here the same whitening is an
optax gradient transformation: for each 2-D parameter we keep an EMA
of the gradient covariance over the smaller axis and precondition by
(F + alpha * tr/dim * I)^(-1/2), rescaling to preserve the update
norm (the reference's "renormalize so the trace is unchanged").
With data-parallel psum gradients this is optional — kept for parity
experiments and for its conditioning benefits.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax


class NGState(NamedTuple):
    fisher: Any   # pytree of per-param covariance EMAs (or None)
    count: Any


def online_natural_gradient(alpha: float = 4.0,
                            decay: float = 0.95,
                            eps: float = 1e-8) -> optax.GradientTransformation:
    def covariance_axis(shape):
        if len(shape) != 2:
            return None
        return 0 if shape[0] <= shape[1] else 1

    def init_fn(params):
        def make(p):
            ax = covariance_axis(p.shape)
            if ax is None:
                return None
            d = p.shape[ax]
            return jnp.zeros((d, d), jnp.float32)
        fisher = jax.tree.map(make, params,
                              is_leaf=lambda x: hasattr(x, "shape"))
        return NGState(fisher, jnp.zeros((), jnp.int32))

    def update_fn(grads, state, params=None):
        def precondition(g, f):
            if f is None or g.ndim != 2:
                return g, f
            ax = covariance_axis(g.shape)
            gm = g if ax == 0 else g.T           # (d, n)
            cov = gm @ gm.T / gm.shape[1]
            f = decay * f + (1 - decay) * cov
            d = f.shape[0]
            damp = alpha * jnp.trace(f) / d + eps
            # inverse square root via eigh
            vals, vecs = jnp.linalg.eigh(f + damp * jnp.eye(d))
            inv_sqrt = (vecs * jax.lax.rsqrt(vals)) @ vecs.T
            pg = inv_sqrt @ gm
            # preserve the update magnitude (trace renormalization)
            scale = jnp.sqrt(jnp.maximum(jnp.sum(gm * gm), eps)
                             / jnp.maximum(jnp.sum(pg * pg), eps))
            pg = pg * scale
            return (pg if ax == 0 else pg.T), f

        flat_g, treedef = jax.tree.flatten(grads)
        flat_f = treedef.flatten_up_to(state.fisher)
        outs = [precondition(g, f) for g, f in zip(flat_g, flat_f)]
        new_g = treedef.unflatten([o[0] for o in outs])
        new_f = treedef.unflatten([o[1] for o in outs])
        return new_g, NGState(new_f, state.count + 1)

    return optax.GradientTransformation(init_fn, update_fn)
