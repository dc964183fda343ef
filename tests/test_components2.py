"""Perturbation + newer nnet3 components (GRU, restricted attention,
SpecAugment, semi-orthogonal constraint)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kaldi_tpu.feat.perturb import (add_noise, reverberate, speed_perturb,
                                    volume_perturb)
from kaldi_tpu.nnet3.components import (GruLayer, RestrictedAttention,
                                        constrain_orthonormal, spec_augment)


class TestPerturb:
    def test_speed_changes_length_and_pitch(self):
        fs = 8000
        t = np.arange(8000) / fs
        wave = np.sin(2 * np.pi * 400 * t).astype(np.float32)
        fast = speed_perturb(wave, fs, 1.1)
        slow = speed_perturb(wave, fs, 0.9)
        assert len(fast) < len(wave) < len(slow)
        assert abs(len(fast) - len(wave) / 1.1) < 20

    def test_volume(self):
        w = np.ones(10, np.float32)
        np.testing.assert_allclose(volume_perturb(w, 0.5), 0.5)

    def test_reverb_preserves_power(self):
        rng = np.random.default_rng(0)
        wave = rng.normal(size=4000).astype(np.float32)
        rir = np.zeros(200)
        rir[0] = 1.0
        rir[100] = 0.5
        out = reverberate(wave, rir)
        assert out.shape == wave.shape
        assert (out ** 2).mean() == pytest.approx((wave ** 2).mean(),
                                                  rel=1e-3)

    def test_add_noise_snr(self):
        rng = np.random.default_rng(1)
        sig = rng.normal(size=8000)
        noise = rng.normal(size=3000)
        out = add_noise(sig, noise, snr_db=10.0)
        resid = out - sig
        snr = 10 * np.log10((sig ** 2).mean() / (resid ** 2).mean())
        assert snr == pytest.approx(10.0, abs=0.5)


class TestNewComponents:
    def test_gru_runs_and_streams(self):
        m = GruLayer(cell_dim=32, projection_dim=8)
        x = jnp.ones((2, 12, 16))
        v = m.init(jax.random.PRNGKey(0), x)
        y, h = m.apply(v, x)
        assert y.shape == (2, 12, 8) and h.shape == (2, 32)
        # streaming: two halves with carried state == full pass
        y1, h1 = m.apply(v, x[:, :6])
        y2, h2 = m.apply(v, x[:, 6:], init_state=h1)
        np.testing.assert_allclose(np.asarray(jnp.concatenate([y1, y2], 1)),
                                   np.asarray(y), atol=1e-5)

    def test_restricted_attention(self):
        m = RestrictedAttention(num_heads=2, key_dim=8, value_dim=8,
                                num_left_inputs=2, num_right_inputs=1)
        x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 10, 16)),
                        jnp.float32)
        v = m.init(jax.random.PRNGKey(0), x)
        y = m.apply(v, x)
        assert y.shape == (1, 10, 16)
        assert np.isfinite(np.asarray(y)).all()

    def test_spec_augment_masks(self):
        x = jnp.ones((3, 50, 24))
        y = spec_augment(x, jax.random.PRNGKey(0))
        arr = np.asarray(y)
        assert arr.min() == 0.0  # something was masked
        assert arr.mean() > 0.5  # but most survives

    def test_constrain_orthonormal_converges(self):
        rng = np.random.default_rng(2)
        m = jnp.asarray(rng.normal(size=(16, 64)) * 0.5, jnp.float32)
        for _ in range(40):
            m = constrain_orthonormal(m)
        p = np.asarray(m @ m.T)
        np.testing.assert_allclose(p, np.eye(16), atol=0.05)


class TestZooAdditions:
    def test_pnorm(self):
        import jax
        from kaldi_tpu.nnet3.components import Pnorm
        x = jnp.asarray(np.random.default_rng(0).normal(
            size=(2, 5, 12)).astype(np.float32))
        p = Pnorm(output_dim=4)
        y = p.apply(p.init(jax.random.PRNGKey(0), x), x)
        xn = np.asarray(x).reshape(2, 5, 4, 3)
        np.testing.assert_allclose(np.asarray(y),
                                   np.sqrt((xn ** 2).sum(-1)), atol=1e-4)

    def test_scale_and_offset(self):
        import jax
        from kaldi_tpu.nnet3.components import ScaleAndOffset
        x = jnp.ones((1, 3, 6))
        so = ScaleAndOffset(dim=6)
        v = so.init(jax.random.PRNGKey(0), x)
        v = jax.tree.map(lambda a: a + 1.0, v)  # scale=2, offset=1
        np.testing.assert_allclose(np.asarray(so.apply(v, x)),
                                   3.0 * np.ones((1, 3, 6)))

    def test_sum_block(self):
        import jax
        from kaldi_tpu.nnet3.components import SumBlock
        x = jnp.asarray(np.arange(12, dtype=np.float32)[None, None])
        sb = SumBlock(output_dim=4)
        y = sb.apply(sb.init(jax.random.PRNGKey(0), x), x)
        np.testing.assert_allclose(
            np.asarray(y)[0, 0],
            np.arange(12.0).reshape(3, 4).sum(0))
