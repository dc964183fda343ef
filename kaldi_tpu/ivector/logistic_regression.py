"""Multinomial logistic regression on i-vectors (parity:
ivector/logistic-regression.{h,cc} — the language-id / speaker-id
backend of the lre07 recipes).

Training maximizes the L2-regularized multiclass log-likelihood with
full-batch Adam on the jitted objective (the reference uses L-BFGS;
the optimum is the same convex point).  Like the reference, training
can expand classes into multiple mixture components (--mix-up) whose
posteriors are summed at evaluation."""

from __future__ import annotations

from dataclasses import dataclass
from typing import BinaryIO, Optional

import numpy as np

from kaldi_tpu.base import io_funcs as iof
from kaldi_tpu.base.logging import log


@dataclass
class LogisticRegressionConfig:
    max_steps: int = 200
    normalizer: float = 0.0025       # L2 on the weights
    mix_up: int = 0                  # target #components (0 = #classes)
    power: float = 0.15              # occupancy power for mix-up
    learning_rate: float = 0.5


class LogisticRegression:
    def __init__(self, weights: Optional[np.ndarray] = None,
                 class_of: Optional[np.ndarray] = None):
        # weights: (C_components, D+1) — last column is the offset
        self.weights = weights
        # component -> class map (mix-up expands classes)
        self.class_of = class_of

    @property
    def num_classes(self) -> int:
        return int(self.class_of.max()) + 1

    def log_posteriors(self, x: np.ndarray) -> np.ndarray:
        """(N, D) -> (N, num_classes) log p(class | x)."""
        x = np.asarray(x, np.float64)
        z = x @ self.weights[:, :-1].T + self.weights[:, -1]  # (N, C)
        z = z - z.max(axis=1, keepdims=True)
        p = np.exp(z)
        p /= p.sum(axis=1, keepdims=True)
        C = self.num_classes
        out = np.zeros((x.shape[0], C))
        for comp, cls in enumerate(self.class_of):
            out[:, cls] += p[:, comp]
        return np.log(np.maximum(out, 1e-300))

    # -- I/O -----------------------------------------------------------

    def write(self, stream: BinaryIO, binary: bool = True) -> None:
        iof.write_token(stream, binary, "<LogisticRegression>")
        iof.write_token(stream, binary, "<weights>")
        iof.write_matrix(stream, binary, self.weights)
        iof.write_token(stream, binary, "<class-map>")
        iof.write_int_vector(stream, binary,
                             [int(c) for c in self.class_of])
        iof.write_token(stream, binary, "</LogisticRegression>")

    @classmethod
    def read(cls, stream: BinaryIO, binary: bool = True
             ) -> "LogisticRegression":
        iof.expect_token(stream, binary, "<LogisticRegression>")
        iof.expect_token(stream, binary, "<weights>")
        w = iof.read_matrix(stream, binary).astype(np.float64)
        iof.expect_token(stream, binary, "<class-map>")
        cmap = np.asarray(iof.read_int_vector(stream, binary), np.int32)
        iof.expect_token(stream, binary, "</LogisticRegression>")
        return cls(w, cmap)


def train_logistic_regression(x: np.ndarray, y: np.ndarray,
                              cfg: Optional[LogisticRegressionConfig]
                              = None) -> LogisticRegression:
    """x (N, D), y (N,) class ids -> trained model."""
    import jax
    import jax.numpy as jnp
    import optax
    cfg = cfg or LogisticRegressionConfig()
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.int32)
    N, D = x.shape
    C = int(y.max()) + 1
    class_of = np.arange(C, dtype=np.int32)
    if cfg.mix_up > C:
        # allocate extra components proportional to occupancy^power
        counts = np.bincount(y, minlength=C).astype(np.float64)
        wts = np.maximum(counts, 1.0) ** cfg.power
        alloc = np.maximum(1, np.floor(
            cfg.mix_up * wts / wts.sum()).astype(int))
        class_of = np.concatenate(
            [np.full(a, c, np.int32) for c, a in enumerate(alloc)])
    K = len(class_of)
    xb = jnp.asarray(np.concatenate([x, np.ones((N, 1))], axis=1),
                     jnp.float32)
    yj = jnp.asarray(y)
    cmap = jnp.asarray(class_of)
    rng = np.random.default_rng(0)
    w0 = jnp.asarray(0.01 * rng.normal(size=(K, D + 1)), jnp.float32)

    def objf(w):
        z = xb @ w.T                                   # (N, K)
        lse = jax.scipy.special.logsumexp(z, axis=1)
        # class posterior = sum over its components
        zc = jax.ops.segment_sum(
            jnp.exp(z - lse[:, None]).T, cmap, num_segments=C).T
        ll = jnp.log(jnp.maximum(zc[jnp.arange(N), yj], 1e-30))
        return ll.mean() - cfg.normalizer * jnp.sum(w * w)

    tx = optax.adam(cfg.learning_rate)
    opt = tx.init(w0)

    @jax.jit
    def step(w, opt):
        loss, g = jax.value_and_grad(lambda w: -objf(w))(w)
        upd, opt = tx.update(g, opt)
        return optax.apply_updates(w, upd), opt, loss

    w = w0
    for i in range(cfg.max_steps):
        w, opt, loss = step(w, opt)
    log(f"logistic regression: {N} examples, {C} classes, {K} "
        f"components, final objf {-float(loss):.4f}")
    return LogisticRegression(np.asarray(w, np.float64), class_of)
