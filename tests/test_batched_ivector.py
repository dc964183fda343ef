"""Batched device i-vector leg (ivector/batched.py): device-vs-host
equivalence, online-chunk accumulation == whole-utterance extraction,
lane reset (channel rebinding), and extractor persistence — the TPU
port of the reference's batched GPU i-vectors
(cudafeat/feature-online-batched-ivector-cuda.h:44)."""

import numpy as np
import pytest

from kaldi_tpu.ivector.batched import (BatchedIvectorExtractor,
                                       train_bench_extractor)


@pytest.fixture(scope="module")
def system():
    rng = np.random.default_rng(7)
    D, R = 8, 6
    # three "speakers" with distinct offsets so i-vectors carry signal
    feats = {}
    for i in range(9):
        mean = rng.normal(scale=2.0, size=D) * (i % 3 + 1)
        feats[f"u{i}"] = (mean + rng.normal(
            size=(40 + 5 * i, D))).astype(np.float32)
    ex = train_bench_extractor(feats, num_gauss=5, ivector_dim=R,
                               num_em_iters=2)
    return ex, feats


def test_device_matches_host(system):
    ex, feats = system
    bex = BatchedIvectorExtractor(ex)
    utts = sorted(feats)
    T = max(f.shape[0] for f in feats.values())
    batch = np.zeros((len(utts), T, feats[utts[0]].shape[1]),
                     np.float32)
    lens = []
    for i, u in enumerate(utts):
        batch[i, :feats[u].shape[0]] = feats[u]
        lens.append(feats[u].shape[0])
    import jax.numpy as jnp
    got = np.asarray(bex.extract_batch(jnp.asarray(batch), lens))
    for i, u in enumerate(utts):
        ref = ex.extract_offset_removed(
            np.asarray(feats[u], np.float64))
        np.testing.assert_allclose(got[i], ref, rtol=2e-3, atol=2e-3)


def test_online_chunks_match_offline(system):
    ex, feats = system
    bex = BatchedIvectorExtractor(ex)
    import jax.numpy as jnp
    utts = sorted(feats)[:4]
    T = max(feats[u].shape[0] for u in utts)
    T = -(-T // 16) * 16
    batch = np.zeros((len(utts), T, feats[utts[0]].shape[1]),
                     np.float32)
    lens = []
    for i, u in enumerate(utts):
        batch[i, :feats[u].shape[0]] = feats[u]
        lens.append(feats[u].shape[0])
    lens = np.asarray(lens)
    state = bex.init_state(len(utts))
    C = 16
    for c0 in range(0, T, C):
        chunk = jnp.asarray(batch[:, c0:c0 + C])
        mask = jnp.asarray(
            (np.arange(c0, c0 + C)[None, :] < lens[:, None]))
        state = bex.acc_chunk(state, chunk, mask)
    online = np.asarray(bex.ivector(state))
    offline = np.asarray(bex.extract_batch(jnp.asarray(batch), lens))
    np.testing.assert_allclose(online, offline, rtol=2e-3, atol=2e-3)


def test_reset_lanes(system):
    ex, feats = system
    bex = BatchedIvectorExtractor(ex)
    import jax.numpy as jnp
    u = sorted(feats)[0]
    f = feats[u][None]
    state = bex.init_state(2)
    mask = jnp.ones(f.shape[:2], bool)
    state = bex.acc_chunk(state, jnp.asarray(np.repeat(f, 2, 0)),
                          jnp.concatenate([mask, mask], 0))
    state = bex.reset_lanes(state, jnp.asarray([False, True]))
    iv = np.asarray(bex.ivector(state))
    assert np.abs(iv[0]).sum() > 1e-3          # lane 0 kept its stats
    np.testing.assert_allclose(iv[1], 0.0, atol=1e-5)  # lane 1 reset


def test_weighted_frames(system):
    """Zero-weighted frames (silence weighting) do not contribute."""
    ex, feats = system
    bex = BatchedIvectorExtractor(ex)
    import jax.numpy as jnp
    u = sorted(feats)[1]
    f = feats[u]
    n = f.shape[0] // 2
    # corrupt the tail, then zero-weight it: must match clean-half
    f2 = f.copy()
    f2[n:] = 100.0
    state = bex.init_state(1)
    w = np.ones((1, f.shape[0]), np.float32)
    w[0, n:] = 0.0
    state = bex.acc_chunk(state, jnp.asarray(f2[None]),
                          jnp.ones((1, f.shape[0]), bool),
                          jnp.asarray(w))
    got = np.asarray(bex.ivector(state))[0]
    ref = np.asarray(bex.extract_batch(
        jnp.asarray(f[None, :n]), [n]))[0]
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_extractor_roundtrip(tmp_path, system):
    ex, feats = system
    from kaldi_tpu.recipes.bench_corpus import (load_ivector_extractor,
                                                save_ivector_extractor)
    p = str(tmp_path / "ex.npz")
    save_ivector_extractor(p, ex)
    ex2 = load_ivector_extractor(p)
    u = sorted(feats)[2]
    a = ex.extract_offset_removed(np.asarray(feats[u], np.float64))
    b = ex2.extract_offset_removed(np.asarray(feats[u], np.float64))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)
