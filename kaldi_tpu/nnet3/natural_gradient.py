"""Online natural-gradient preconditioning (capability parity:
nnet3/natural-gradient-online.h:414 OnlineNaturalGradient and its use
in NaturalGradientAffineComponent).

The reference maintains a LOW-RANK online estimate of the Fisher
matrix per affine component, F ~= V diag(s) V^T + rho I with
rank R << D, and multiplies gradients by the smoothed inverse
(F + alpha tr(F)/D I)^{-1}, renormalized so the update magnitude is
unchanged — that preconditioning is what stabilizes its parallel-SGD +
model-averaging scheme. Here the same structure is an optax gradient
transformation:

  - the basis V (D, R) and eigenvalue estimates s track the top
    eigenpairs of the EMA gradient covariance by one subspace
    (power) iteration per step — O(R D n), the same order as the
    gradient computation itself (the reference's recursion has the
    same cost; its exact update solves a small R x R eigenproblem,
    ours orthonormalizes with a QR — a deliberate, documented
    simplification with the same fixed point);
  - rho tracks the residual (out-of-subspace) covariance mass;
  - the inverse is exact for that form via Woodbury:
      (rho' I + V S V^T)^{-1} g = (g - V c) / rho',
      c_i = s_i/(s_i + rho') (V^T g)_i
  - the preconditioned gradient is rescaled to preserve ||g||
    (the reference's trace renormalization).

rank=None (or rank >= D) falls back to the dense EMA + eigh path.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


class NGState(NamedTuple):
    fisher: Any   # pytree: per-param (V, s, rho) or dense cov or None
    count: Any


def online_natural_gradient(alpha: float = 4.0,
                            decay: float = 0.95,
                            rank: Optional[int] = 32,
                            eps: float = 1e-8
                            ) -> optax.GradientTransformation:
    def covariance_axis(shape):
        if len(shape) != 2:
            return None
        return 0 if shape[0] <= shape[1] else 1

    def use_lowrank(d):
        return rank is not None and rank < d

    def init_fn(params):
        def make(p):
            ax = covariance_axis(p.shape)
            if ax is None:
                return None
            d = p.shape[ax]
            if use_lowrank(d):
                # deterministic initial basis: first R coordinate axes
                v0 = jnp.eye(d, rank, dtype=jnp.float32)
                return (v0, jnp.zeros((rank,), jnp.float32),
                        jnp.zeros((), jnp.float32))
            return jnp.zeros((d, d), jnp.float32)
        fisher = jax.tree.map(make, params,
                              is_leaf=lambda x: hasattr(x, "shape"))
        return NGState(fisher, jnp.zeros((), jnp.int32))

    def precondition_lowrank(gm, st):
        """gm: (d, n) gradient with samples along columns."""
        V, s, rho = st
        d, n = gm.shape
        # EMA covariance action on the basis: one power-iteration step
        cov_V = gm @ (gm.T @ V) / n                      # (d, R)
        Y = decay * (V * s[None, :]) + (1 - decay) * cov_V
        Vn, Rr = jnp.linalg.qr(Y)                        # (d,R), (R,R)
        sn = jnp.abs(jnp.diagonal(Rr))
        tr_cov = jnp.sum(gm * gm) / n
        tr_est = decay * (jnp.sum(s) + rho * (d - s.shape[0])) \
            + (1 - decay) * tr_cov
        rho_n = jnp.maximum((tr_est - jnp.sum(sn))
                            / jnp.maximum(d - sn.shape[0], 1), 0.0)
        # smoothed inverse via Woodbury
        damp = alpha * tr_est / d + eps
        denom = rho_n + damp
        proj = Vn.T @ gm                                 # (R, n)
        coef = (sn / (sn + denom))[:, None] * proj
        pg = (gm - Vn @ coef) / denom
        scale = jnp.sqrt(jnp.maximum(jnp.sum(gm * gm), eps)
                         / jnp.maximum(jnp.sum(pg * pg), eps))
        return pg * scale, (Vn, sn, rho_n)

    def precondition_dense(gm, f):
        cov = gm @ gm.T / gm.shape[1]
        f = decay * f + (1 - decay) * cov
        d = f.shape[0]
        damp = alpha * jnp.trace(f) / d + eps
        vals, vecs = jnp.linalg.eigh(f + damp * jnp.eye(d))
        inv = (vecs / vals) @ vecs.T
        pg = inv @ gm
        scale = jnp.sqrt(jnp.maximum(jnp.sum(gm * gm), eps)
                         / jnp.maximum(jnp.sum(pg * pg), eps))
        return pg * scale, f

    def update_fn(grads, state, params=None):
        def precondition(g, f):
            if f is None or g.ndim != 2:
                return g, f
            ax = covariance_axis(g.shape)
            gm = g if ax == 0 else g.T           # (d, n)
            if isinstance(f, tuple):
                pg, f = precondition_lowrank(gm, f)
            else:
                pg, f = precondition_dense(gm, f)
            return (pg if ax == 0 else pg.T), f

        flat_g, treedef = jax.tree.flatten(grads)
        flat_f = treedef.flatten_up_to(state.fisher)
        outs = [precondition(g, f) for g, f in zip(flat_g, flat_f)]
        new_g = treedef.unflatten([o[0] for o in outs])
        new_f = treedef.unflatten([o[1] for o in outs])
        return new_g, NGState(new_f, state.count + 1)

    return optax.GradientTransformation(init_fn, update_fn)
