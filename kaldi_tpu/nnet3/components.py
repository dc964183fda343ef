"""nnet3 component zoo, re-designed as functional JAX modules.

Capability parity with the reference's Component classes (SURVEY.md
§2.6: nnet-simple-component.h, nnet-convolutional-component.h:450
TdnnComponent, nnet-combined-component.h:335 LstmNonlinearity,
nnet-general-component.h StatisticsExtraction/Pooling) — but NOT a
port of the nnet3 compiler/VM: XLA is the computation compiler here,
so components are ordinary jittable modules and time-offset Descriptors
become explicit slicing/convolution.

Key components:
  TdnnfLayer      — factorized TDNN (TDNN-F) block: constrained 2-tap
                    conv to a bottleneck, 2-tap conv back up, ReLU +
                    batchnorm + scaled residual, per run_tdnn_1d.sh
  LstmpLayer      — LSTM with recurrent/non-recurrent projection
                    (LSTMP), lax.scan over time
  StatisticsPooling — mean+stddev pooling (xvector stats layer)
  constrain_orthonormal — the semi-orthogonal update applied
                    periodically to TDNN-F first factors
                    (nnet-utils.cc ConstrainOrthonormal)
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def constrain_orthonormal(m: jnp.ndarray, scale: float = 1.0,
                          update_speed: float = 0.125) -> jnp.ndarray:
    """One step of the semi-orthogonal constraint on a (rows <= cols)
    matrix: pushes M M^T toward scale^2 * I (nnet-utils.cc
    ConstrainOrthonormalInternal; floating scale when scale <= 0)."""
    rows, cols = m.shape
    transposed = rows > cols
    if transposed:
        m = m.T
    p = m @ m.T
    if scale <= 0.0:
        # floating case: scale^2 = trace(P P^T)/trace(P)
        trace_p = jnp.trace(p)
        trace_pp = jnp.sum(p * p)
        scale2 = trace_pp / jnp.maximum(trace_p, 1e-20)
    else:
        scale2 = jnp.asarray(scale * scale, m.dtype)
    eye = jnp.eye(p.shape[0], dtype=m.dtype) * scale2
    m = m - (4.0 * update_speed / scale2) * ((p - eye) @ m)
    return m.T if transposed else m


class BatchNorm(nn.Module):
    """Kaldi-style batchnorm (no learned scale/offset by default —
    the reference's BatchNormComponent, nnet-normalize-component.h:159)."""
    use_running_average: bool = False
    momentum: float = 0.99
    epsilon: float = 1e-3

    @nn.compact
    def __call__(self, x):
        return nn.BatchNorm(use_running_average=self.use_running_average,
                            momentum=self.momentum, epsilon=self.epsilon,
                            use_bias=False, use_scale=False,
                            name="bn")(x)


class TdnnfLayer(nn.Module):
    """Factorized TDNN layer (TDNN-F): linear down-projection with a
    [t+left_offset, t] kernel (semi-orthogonal constrained), linear
    up-projection with [t, t+right_offset] kernel, ReLU + batchnorm,
    scaled bypass (nnet-convolutional-component.h:450 TdnnComponent
    pairs + xconfig tdnnf-layer semantics).

    Input/output: (B, T, dim). Time context shrinks by
    |left_offset| + right_offset frames unless padded=True.
    """
    dim: int = 1024
    bottleneck_dim: int = 128
    time_stride: int = 1          # offset magnitude (0 => 1x1 convs)
    bypass_scale: float = 0.66
    subsample: int = 1            # output time stride (frame subsampling)
    train: bool = True

    @nn.compact
    def __call__(self, x):
        B, T, D = x.shape
        ts = self.time_stride
        # factor 1: kernel over [t-ts, t] -> bottleneck
        w1 = self.param("linear", nn.initializers.glorot_uniform(),
                        (self.bottleneck_dim, (2 if ts else 1) * D))
        # factor 2: kernel over [t, t+ts] -> dim, with bias
        w2 = self.param("affine", nn.initializers.glorot_uniform(),
                        (self.dim, (2 if ts else 1) * self.bottleneck_dim))
        b2 = self.param("bias", nn.initializers.zeros, (self.dim,))

        if ts:
            # x shifted right by ts (edge replication): frame t sees t-ts
            left = jnp.concatenate([jnp.repeat(x[:, :1], ts, axis=1),
                                    x[:, :-ts]], axis=1)
            cat1 = jnp.concatenate([left, x], axis=-1)
        else:
            cat1 = x
        bottleneck = jnp.einsum("btd,od->bto", cat1, w1)
        if ts:
            # bottleneck shifted left by ts: frame t sees t+ts
            right = jnp.concatenate(
                [bottleneck[:, ts:],
                 jnp.repeat(bottleneck[:, -1:], ts, axis=1)], axis=1)
            cat2 = jnp.concatenate([bottleneck, right], axis=-1)
        else:
            cat2 = bottleneck
        y = jnp.einsum("bto,po->btp", cat2, w2) + b2
        y = nn.relu(y)
        y = BatchNorm(use_running_average=not self.train)(y)
        if D == self.dim:
            y = y + self.bypass_scale * x
        if self.subsample > 1:
            y = y[:, ::self.subsample]
        return y


class Prefinal(nn.Module):
    """prefinal-l / prefinal chain|xent blocks of run_tdnn_1d.sh:
    linear -> dense+relu+bn -> bottleneck linear + bn."""
    big_dim: int = 1024
    small_dim: int = 192
    train: bool = True

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.big_dim, name="affine")(x)
        x = nn.relu(x)
        x = BatchNorm(use_running_average=not self.train, name="bn1")(x)
        x = nn.Dense(self.small_dim, use_bias=False, name="linear")(x)
        x = BatchNorm(use_running_average=not self.train, name="bn2")(x)
        return x


class LstmpLayer(nn.Module):
    """LSTM with projection (LSTMP, the reference's
    LstmNonlinearityComponent + projection): returns (B, T, rp_dim)
    where output = [recurrent_proj, nonrecurrent_proj]."""
    cell_dim: int = 1024
    recurrent_dim: int = 256
    nonrecurrent_dim: int = 256

    @nn.compact
    def __call__(self, x, init_state=None):
        B, T, D = x.shape
        cd, rd, nd = self.cell_dim, self.recurrent_dim, self.nonrecurrent_dim
        w_all = self.param("w_ifco", nn.initializers.glorot_uniform(),
                           (4 * cd, D + rd))
        b_all = self.param("b_ifco", nn.initializers.zeros, (4 * cd,))
        w_proj = self.param("w_proj", nn.initializers.glorot_uniform(),
                            (rd + nd, cd))
        if init_state is None:
            c0 = jnp.zeros((B, cd), x.dtype)
            r0 = jnp.zeros((B, rd), x.dtype)
        else:
            c0, r0 = init_state

        def step(carry, xt):
            c, r = carry
            gates = jnp.concatenate([xt, r], axis=-1) @ w_all.T + b_all
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
            h = jax.nn.sigmoid(o) * jnp.tanh(c)
            proj = h @ w_proj.T
            r_new = proj[:, :rd]
            return (c, r_new), proj

        (c_fin, r_fin), ys = jax.lax.scan(step, (c0, r0),
                                          jnp.swapaxes(x, 0, 1))
        return jnp.swapaxes(ys, 0, 1), (c_fin, r_fin)


class StatisticsPooling(nn.Module):
    """Mean + stddev over time (xvector stats-pooling;
    nnet-general-component.h:201/337)."""
    epsilon: float = 1e-10

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None):
        if mask is not None:
            m = mask[..., None].astype(x.dtype)
            count = jnp.maximum(m.sum(axis=1), 1.0)
            mean = (x * m).sum(axis=1) / count
            var = (x * x * m).sum(axis=1) / count - mean ** 2
        else:
            mean = x.mean(axis=1)
            var = x.var(axis=1)
        std = jnp.sqrt(jnp.maximum(var, self.epsilon))
        return jnp.concatenate([mean, std], axis=-1)
