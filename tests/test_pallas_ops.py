"""Padded-arc Viterbi relaxation: jnp vs naive and vs the Pallas kernel
(interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from kaldi_tpu.ops.pallas_viterbi import (INF, build_incoming_table,
                                          pallas_relax, relax_padded)


def make_problem(seed=0, B=4, S=12, A=40, P=6):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, S, A).astype(np.int32)
    dst = rng.integers(0, S, A).astype(np.int32)
    w = rng.uniform(0, 2, A).astype(np.float32)
    pdf = rng.integers(0, P, A).astype(np.int32)
    cost = rng.uniform(0, 5, (B, S + 1)).astype(np.float32)
    cost[:, S] = INF
    ll = rng.normal(size=(B, P)).astype(np.float32)
    return src, dst, w, pdf, cost, ll, S


def naive(cost, src, dst, w, pdf, ll, S, scale):
    B = cost.shape[0]
    out = np.full((B, S), INF, np.float32)
    for b in range(B):
        for a in range(len(src)):
            c = cost[b, src[a]] + w[a] - scale * ll[b, pdf[a]]
            out[b, dst[a]] = min(out[b, dst[a]], c)
    return out


class TestPaddedRelax:
    def test_matches_naive(self):
        src, dst, w, pdf, cost, ll, S = make_problem()
        in_src, in_w, in_pdf, K = build_incoming_table(S, src, dst, w, pdf)
        got = np.asarray(relax_padded(jnp.asarray(cost), jnp.asarray(in_src),
                                      jnp.asarray(in_w), jnp.asarray(in_pdf),
                                      jnp.asarray(ll), 0.5))
        want = naive(cost, src, dst, w, pdf, ll, S, 0.5)
        mask = want < INF / 2
        np.testing.assert_allclose(got[mask], want[mask], rtol=1e-5)
        assert (got[~mask] > INF / 2).all()

    def test_pallas_matches_jnp(self):
        src, dst, w, pdf, cost, ll, S = make_problem(seed=1, S=20, A=70)
        in_src, in_w, in_pdf, K = build_incoming_table(S, src, dst, w, pdf)
        ref = np.asarray(relax_padded(jnp.asarray(cost), jnp.asarray(in_src),
                                      jnp.asarray(in_w), jnp.asarray(in_pdf),
                                      jnp.asarray(ll), 1.0))
        got = np.asarray(pallas_relax(jnp.asarray(cost), jnp.asarray(in_src),
                                      jnp.asarray(in_w), jnp.asarray(in_pdf),
                                      jnp.asarray(ll), 1.0, state_block=8,
                                      interpret=True))
        mask = ref < INF / 2
        np.testing.assert_allclose(got[mask], ref[mask], rtol=1e-5)
