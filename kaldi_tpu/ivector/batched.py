"""Batched device i-vector extraction — the TPU equivalent of the
reference's batched GPU online i-vectors
(/root/reference/src/cudafeat/feature-online-batched-ivector-cuda.h:44,
used by the production batched pipelines via
online-batched-feature-pipeline-cuda.h:44 and consumed by the TDNN-F
per egs/librispeech/s5/local/chain/tuning/run_tdnn_1d.sh:171-190).

Where the reference runs per-lane CUDA kernels (UBM posteriors, stats
accumulation, batched Cholesky solve), everything here is one jitted
XLA program over the whole lane batch: posteriors are a (B*T, G)
matmul against the diagonal UBM, stats are masked einsums, and the
per-lane R x R solve is a batched jnp.linalg.solve — all MXU work.

Two modes:
  * extract_batch: whole-utterance i-vectors for the OFFLINE batched
    pipeline (one solve per lane);
  * init_state / acc_chunk / ivector: carried (linear, quadratic)
    online-estimation state for the ONLINE batched pipeline, the
    device port of OnlineIvectorEstimationStats
    (ivector/ivector-extractor.h:314).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


class BatchedIvectorExtractor:
    """Device wrapper of a trained IvectorExtractor with a DIAGONAL
    UBM (the reference's batched path also requires a diag UBM,
    cudafeat/feature-online-batched-ivector-cuda.h)."""

    def __init__(self, extractor):
        import jax.numpy as jnp
        if extractor.full_cov:
            raise ValueError("batched i-vectors need a diagonal UBM")
        self.R = extractor.R
        self.prior_offset = float(extractor.prior_offset)
        ubm = extractor.ubm
        means = ubm.get_means().astype(np.float32)          # (G, D)
        inv_vars = ubm.inv_vars.astype(np.float32)          # (G, D)
        # diag-GMM loglikes: gconst + x @ (m*iv)^T - 0.5 x^2 @ iv^T
        gconst = (np.log(np.maximum(ubm.weights, 1e-30))
                  + 0.5 * np.log(inv_vars).sum(axis=1)
                  - 0.5 * ubm.dim * np.log(2 * np.pi)
                  - 0.5 * (means ** 2 * inv_vars).sum(axis=1))
        self._gconst = jnp.asarray(gconst.astype(np.float32))
        self._lin_w = jnp.asarray((means * inv_vars).T.copy())  # (D,G)
        self._quad_w = jnp.asarray(inv_vars.T.copy())           # (D,G)
        MS = extractor._ms().astype(np.float32)             # (G, D, R)
        self._MS = jnp.asarray(MS)
        U = np.einsum("gdr,gds->grs", MS,
                      extractor.M).astype(np.float32)
        self._U = jnp.asarray(U)
        self._jit = {}

    # ------------------------------------------------------------------
    def _posteriors(self, feats):
        """(B, T, D) -> (B, T, G) UBM component posteriors.

        Precision note: the loglike needs the f32 mantissa — the
        quadratic term x^2 @ inv_vars is O(1e4-1e6) for raw MFCCs
        (c0 dominates) while the logit differences that pick the
        component are O(1), so the TPU's default bf16 matmul passes
        destroy the posteriors (measured: i-vector norms 3-4x off vs
        the host extractor, WER 93% on the scale bench)."""
        import jax
        import jax.numpy as jnp
        hi = jax.lax.Precision.HIGHEST
        ll = (jnp.einsum("btd,dg->btg", feats, self._lin_w,
                         precision=hi)
              - 0.5 * jnp.einsum("btd,dg->btg", feats ** 2,
                                 self._quad_w, precision=hi)
              + self._gconst[None, None, :])
        return jax.nn.softmax(ll, axis=-1)

    def _stats(self, feats, mask):
        """gamma (B, G), x (B, G, D) with frame mask (B, T)."""
        import jax
        import jax.numpy as jnp
        post = self._posteriors(feats) * mask[:, :, None]
        gamma = post.sum(axis=1)
        x = jnp.einsum("btg,btd->bgd", post, feats,
                       precision=jax.lax.Precision.HIGHEST)
        return gamma, x

    def _solve(self, quad, lin):
        import jax.numpy as jnp
        iv = jnp.linalg.solve(quad, lin[..., None])[..., 0]
        return iv.at[:, 0].add(-self.prior_offset)

    # ------------------------------------------------------------------
    def extract_batch(self, feats, lengths=None):
        """Whole-utterance i-vectors: feats (B, T, D) device array,
        lengths (B,) valid frame counts.  Returns (B, R) with the
        prior offset removed (the nnet3 input convention)."""
        import jax
        import jax.numpy as jnp
        B, T, Dd = feats.shape
        key = ("off", B, T, int(Dd))
        if key not in self._jit:
            def run(feats, lens):
                hi = jax.lax.Precision.HIGHEST
                mask = (jnp.arange(T)[None, :]
                        < lens[:, None]).astype(jnp.float32)
                gamma, x = self._stats(feats.astype(jnp.float32), mask)
                quad = (jnp.eye(self.R)[None]
                        + jnp.einsum("bg,grs->brs", gamma, self._U,
                                     precision=hi))
                lin = jnp.einsum("gdr,bgd->br", self._MS, x,
                                 precision=hi)
                lin = lin.at[:, 0].add(self.prior_offset)
                return self._solve(quad, lin)
            self._jit[key] = jax.jit(run)
        lens = jnp.asarray(np.asarray(
            lengths if lengths is not None else [T] * B, np.int32))
        return self._jit[key](feats, lens)

    # ------------------------------------------------------------------
    # online (carried) estimation for the batched online pipeline
    def init_state(self, B: int):
        import jax.numpy as jnp
        lin = jnp.zeros((B, self.R), jnp.float32
                        ).at[:, 0].set(self.prior_offset)
        quad = jnp.broadcast_to(jnp.eye(self.R, dtype=jnp.float32),
                                (B, self.R, self.R))
        return (lin, quad)

    def acc_chunk(self, state, feats, mask, weights=None):
        """Accumulate one chunk: feats (B, C, D), mask (B, C) valid
        frames, optional weights (B, C) (silence weighting)."""
        import jax
        import jax.numpy as jnp
        key = ("acc", feats.shape)
        if key not in self._jit:
            def run(state, feats, mask, w):
                hi = jax.lax.Precision.HIGHEST
                lin, quad = state
                m = mask.astype(jnp.float32) * w
                gamma, x = self._stats(feats.astype(jnp.float32), m)
                quad = quad + jnp.einsum("bg,grs->brs", gamma,
                                         self._U, precision=hi)
                lin = lin + jnp.einsum("gdr,bgd->br", self._MS, x,
                                       precision=hi)
                return (lin, quad)
            self._jit[key] = jax.jit(run)
        if weights is None:
            import jax.numpy as jnp
            weights = jnp.ones(feats.shape[:2], jnp.float32)
        return self._jit[key](state, feats, mask, weights)

    def ivector(self, state):
        """Current per-lane i-vectors from carried state: (B, R)."""
        import jax
        key = ("solve", state[0].shape[0])
        if key not in self._jit:
            self._jit[key] = jax.jit(self._solve)
        return self._jit[key](state[1], state[0])

    def reset_lanes(self, state, done):
        """Reset the online state of lanes flagged in `done` (B,) —
        the channel-rebinding hook for endpointed lanes (cudadecoder
        channel reuse, cuda-decoder.h:174-232)."""
        import jax
        import jax.numpy as jnp
        key = ("reset", state[0].shape[0])
        if key not in self._jit:
            def run(state, done):
                lin, quad = state
                lin0 = jnp.zeros_like(lin).at[:, 0].set(
                    self.prior_offset)
                quad0 = jnp.broadcast_to(
                    jnp.eye(self.R, dtype=jnp.float32), quad.shape)
                return (jnp.where(done[:, None], lin0, lin),
                        jnp.where(done[:, None, None], quad0, quad))
            self._jit[key] = jax.jit(run)
        return self._jit[key](state, done)


def train_bench_extractor(feats_dict, num_gauss: int = 64,
                          ivector_dim: int = 32, seed: int = 0,
                          num_em_iters: int = 4,
                          max_frames: int = 200_000):
    """UBM + T-matrix training for the bench corpus: diag UBM from
    pooled frames (gmm-global-init-from-feats semantics) then the
    extractor EM (ivector/extractor.py).  Deterministic in `seed`."""
    from kaldi_tpu.gmm.diag_gmm import DiagGmm
    from kaldi_tpu.gmm.mle import (AccumDiagGmm, MleDiagGmmOptions,
                                   mle_diag_gmm_update)
    from kaldi_tpu.ivector.extractor import (IvectorExtractorOptions,
                                             train_ivector_extractor)
    feats_list = [np.asarray(feats_dict[u], np.float32)
                  for u in sorted(feats_dict)]
    pooled = np.concatenate(feats_list)[:max_frames]
    rng = np.random.default_rng(seed)
    G = min(num_gauss, len(pooled))
    gmm = DiagGmm(G, pooled.shape[1])
    sel = pooled[rng.choice(len(pooled), G, replace=False)]
    gmm.set_from_means_and_vars(
        np.ones(G) / G, sel,
        np.tile(np.maximum(pooled.var(0), 1e-4), (G, 1)))
    for _ in range(num_em_iters):
        acc = AccumDiagGmm(gmm.num_gauss, gmm.dim)
        acc.accumulate_from_gmm(gmm, pooled)
        mle_diag_gmm_update(
            MleDiagGmmOptions(min_gaussian_occupancy=1.0), acc, gmm)
    ex = train_ivector_extractor(
        gmm, feats_list,
        IvectorExtractorOptions(ivector_dim=ivector_dim, num_iters=5))
    return ex
