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
    # rescale so trace(P)/rows == scale2 first — keeps the fixed-point
    # update stable from arbitrary initializations (the reference
    # adapts update_speed for the same reason)
    rows = p.shape[0]
    ratio = jnp.trace(p) / jnp.maximum(rows * scale2, 1e-20)
    ratio = jnp.maximum(ratio, 1e-10)
    m = m * jax.lax.rsqrt(ratio)
    p = p / ratio
    eye = jnp.eye(rows, dtype=m.dtype) * scale2
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
            # Concat-free formulation (same math as the reference's
            # Append(Offset(x,-ts), x) pair): shifting a per-frame
            # matmul's OUTPUT equals shifting its input, so compute
            # both weight halves in one full-K matmul and roll the
            # half that looks at t-ts. Avoids materializing the
            # (B, T, 2D) concat — the layer was HBM-bound on it.
            bn = self.bottleneck_dim
            w1p = w1.reshape(bn, 2, D)
            w1cat = jnp.concatenate([w1p[:, 0], w1p[:, 1]], axis=0)
            xw = jnp.einsum("btd,od->bto", x, w1cat)     # (B, T, 2bn)
            xa, xb = xw[..., :bn], xw[..., bn:]
            # xa needs x[t-ts]: shift right with edge replication
            xa = jnp.concatenate([jnp.repeat(xa[:, :1], ts, axis=1),
                                  xa[:, :-ts]], axis=1)
            bottleneck = xa + xb
            w2p = w2.reshape(self.dim, 2, bn)
            w2cat = jnp.concatenate([w2p[:, 0], w2p[:, 1]], axis=0)
            yw = jnp.einsum("bto,po->btp", bottleneck, w2cat)
            ya, yb = yw[..., :self.dim], yw[..., self.dim:]
            # yb needs bottleneck[t+ts]: shift left, edge replication
            yb = jnp.concatenate([yb[:, ts:],
                                  jnp.repeat(yb[:, -1:], ts, axis=1)],
                                 axis=1)
            y = ya + yb + b2
        else:
            bottleneck = jnp.einsum("btd,od->bto", x, w1)
            y = jnp.einsum("bto,po->btp", bottleneck, w2) + b2
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


class GruLayer(nn.Module):
    """Projected GRU (the reference's norm-OGRU family,
    nnet-combined-component.h:713/979): standard GRU cell via lax.scan
    with an output projection."""
    cell_dim: int = 512
    projection_dim: int = 128

    @nn.compact
    def __call__(self, x, init_state=None):
        B, T, D = x.shape
        cd = self.cell_dim
        w_zr = self.param("w_zr", nn.initializers.glorot_uniform(),
                          (2 * cd, D + cd))
        b_zr = self.param("b_zr", nn.initializers.zeros, (2 * cd,))
        w_h = self.param("w_h", nn.initializers.glorot_uniform(),
                         (cd, D + cd))
        b_h = self.param("b_h", nn.initializers.zeros, (cd,))
        w_proj = self.param("w_proj", nn.initializers.glorot_uniform(),
                            (self.projection_dim, cd))
        h0 = (jnp.zeros((B, cd), x.dtype) if init_state is None
              else init_state)

        def step(h, xt):
            zr = jnp.concatenate([xt, h], axis=-1) @ w_zr.T + b_zr
            z, r = jnp.split(jax.nn.sigmoid(zr), 2, axis=-1)
            hb = jnp.tanh(jnp.concatenate([xt, r * h], axis=-1)
                          @ w_h.T + b_h)
            h_new = (1 - z) * h + z * hb
            return h_new, h_new @ w_proj.T

        h_fin, ys = jax.lax.scan(step, h0, jnp.swapaxes(x, 0, 1))
        return jnp.swapaxes(ys, 0, 1), h_fin


class RestrictedAttention(nn.Module):
    """Restricted self-attention (nnet-attention-component.h:106):
    dot-product attention where each frame attends to a bounded window
    [t - num_left_inputs, t + num_right_inputs], realized with static
    shifts (no data-dependent shapes)."""
    num_heads: int = 4
    key_dim: int = 40
    value_dim: int = 40
    num_left_inputs: int = 5
    num_right_inputs: int = 2
    time_stride: int = 1

    @nn.compact
    def __call__(self, x):
        B, T, D = x.shape
        H, K, V = self.num_heads, self.key_dim, self.value_dim
        q = nn.Dense(H * K, name="query")(x).reshape(B, T, H, K)
        k = nn.Dense(H * K, name="key")(x).reshape(B, T, H, K)
        v = nn.Dense(H * V, name="value")(x).reshape(B, T, H, V)
        offsets = [o * self.time_stride
                   for o in range(-self.num_left_inputs,
                                  self.num_right_inputs + 1)]
        logits = []
        values = []
        for off in offsets:
            if off == 0:
                ks, vs = k, v
            elif off > 0:
                pad_k = jnp.repeat(k[:, -1:], off, axis=1)
                ks = jnp.concatenate([k[:, off:], pad_k], axis=1)
                pad_v = jnp.repeat(v[:, -1:], off, axis=1)
                vs = jnp.concatenate([v[:, off:], pad_v], axis=1)
            else:
                o = -off
                pad_k = jnp.repeat(k[:, :1], o, axis=1)
                ks = jnp.concatenate([pad_k, k[:, :-o]], axis=1)
                pad_v = jnp.repeat(v[:, :1], o, axis=1)
                vs = jnp.concatenate([pad_v, v[:, :-o]], axis=1)
            logits.append(jnp.einsum("bthk,bthk->bth", q, ks)
                          / jnp.sqrt(K).astype(x.dtype))
            values.append(vs)
        att = jax.nn.softmax(jnp.stack(logits, axis=-1), axis=-1)  # B,T,H,W
        stacked = jnp.stack(values, axis=3)                        # B,T,H,W,V
        out = jnp.einsum("bthw,bthwv->bthv", att, stacked)
        return out.reshape(B, T, H * V)


def spec_augment(feats, rng_key, freq_mask_width: int = 10,
                 num_freq_masks: int = 2, time_mask_frac: float = 0.1,
                 num_time_masks: int = 2):
    """SpecAugment-style masking (the reference's
    SpecAugmentTimeMaskComponent + GeneralDropout freq masking,
    nnet-general-component.h:1017): zero random frequency bands and
    time spans. feats (B, T, D)."""
    B, T, D = feats.shape
    keys = jax.random.split(rng_key, 4)
    out = feats
    # frequency masks
    f0 = jax.random.randint(keys[0], (B, num_freq_masks), 0,
                            max(D - freq_mask_width, 1))
    widths = jax.random.randint(keys[1], (B, num_freq_masks), 0,
                                freq_mask_width + 1)
    d_idx = jnp.arange(D)[None, None, :]
    fmask = ((d_idx >= f0[..., None]) &
             (d_idx < (f0 + widths)[..., None])).any(axis=1)  # (B, D)
    out = out * (1.0 - fmask[:, None, :].astype(feats.dtype))
    # time masks
    max_w = max(int(T * time_mask_frac), 1)
    t0 = jax.random.randint(keys[2], (B, num_time_masks), 0,
                            max(T - max_w, 1))
    tw = jax.random.randint(keys[3], (B, num_time_masks), 0, max_w + 1)
    t_idx = jnp.arange(T)[None, None, :]
    tmask = ((t_idx >= t0[..., None]) &
             (t_idx < (t0 + tw)[..., None])).any(axis=1)  # (B, T)
    out = out * (1.0 - tmask[:, :, None].astype(feats.dtype))
    return out


class Pnorm(nn.Module):
    """PnormComponent (nnet-simple-component.h): group-wise p-norm
    nonlinearity, y_j = (sum_{i in group j} |x_i|^p)^(1/p)."""
    output_dim: int
    p: float = 2.0

    @nn.compact
    def __call__(self, x):
        D = x.shape[-1]
        if D % self.output_dim:
            raise ValueError(f"pnorm: {D} not divisible by "
                             f"{self.output_dim}")
        group = D // self.output_dim
        xg = x.reshape(x.shape[:-1] + (self.output_dim, group))
        return jnp.power(
            jnp.sum(jnp.power(jnp.abs(xg), self.p), axis=-1) + 1e-20,
            1.0 / self.p)


class ScaleAndOffset(nn.Module):
    """ScaleAndOffsetComponent: learned per-element scale + offset."""
    dim: int

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.dim,))
        offset = self.param("offset", nn.initializers.zeros, (self.dim,))
        return x * scale + offset


class SumBlock(nn.Module):
    """SumBlockComponent: sum consecutive blocks of the input."""
    output_dim: int
    scale: float = 1.0

    @nn.compact
    def __call__(self, x):
        D = x.shape[-1]
        if D % self.output_dim:
            raise ValueError("sum-block: dim mismatch")
        xg = x.reshape(x.shape[:-1] + (D // self.output_dim,
                                       self.output_dim))
        return self.scale * jnp.sum(xg, axis=-2)
