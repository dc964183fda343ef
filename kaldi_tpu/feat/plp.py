"""PLP feature pieces (parity: feat/feature-plp.cc, mel-computations.cc
Durbin:267 / Lpc2Cepstrum:300 / GetEqualLoudnessVector:311,
feature-functions.cc InitIdftBases:188).

The per-frame scalar Durbin/cepstrum recursions become order-indexed
static loops of vectorized ops over the whole (batch, frames) tensor —
the LPC order is ~12 so the unrolled loops jit cleanly.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from kaldi_tpu.feat import mel as melmod
from kaldi_tpu.feat import window as win


@dataclass
class PlpOptions:
    frame_opts: win.FrameExtractionOptions = field(default_factory=win.FrameExtractionOptions)
    mel_opts: melmod.MelBanksOptions = field(default_factory=lambda: melmod.MelBanksOptions(23))
    lpc_order: int = field(default=12, metadata={"doc": "Order of LPC analysis in PLP computation"})
    num_ceps: int = field(default=13, metadata={"doc": "Number of cepstra in PLP computation (including C0)"})
    use_energy: bool = field(default=True, metadata={"doc": "Use energy (not C0) for zeroth PLP feature"})
    energy_floor: float = field(default=0.0, metadata={"doc": "Floor on energy (absolute, not relative) in PLP computation"})
    raw_energy: bool = field(default=True, metadata={"doc": "If true, compute energy before preemphasis and windowing"})
    compress_factor: float = field(default=0.33333, metadata={"doc": "Compression factor in PLP computation"})
    cepstral_lifter: float = field(default=22.0, metadata={"doc": "Constant that controls scaling of PLPs"})
    cepstral_scale: float = field(default=1.0, metadata={"doc": "Scaling constant in PLP computation"})
    htk_compat: bool = field(default=False, metadata={"doc": "If true, put energy or C0 last"})

    feature_type = "plp"

    def dim(self) -> int:
        return self.num_ceps


def equal_loudness_vector(center_freqs: np.ndarray) -> np.ndarray:
    fsq = center_freqs.astype(np.float64) ** 2
    fsub = fsq / (fsq + 1.6e5)
    return (fsub * fsub * ((fsq + 1.44e6) / (fsq + 9.61e6))).astype(np.float32)


def idft_bases(n_bases: int, dimension: int) -> np.ndarray:
    angle = np.pi / (dimension - 1)
    scale = 1.0 / (2.0 * (dimension - 1))
    i = np.arange(n_bases, dtype=np.float64)[:, None]
    j = np.arange(dimension, dtype=np.float64)[None, :]
    m = 2.0 * scale * np.cos(angle * i * j)
    m[:, 0] = scale
    m[:, -1] = scale * np.cos(angle * i[:, 0] * (dimension - 1))
    return m.astype(np.float32)


def durbin_batch(autocorr: jnp.ndarray, order: int
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Vectorized Levinson-Durbin: autocorr (..., order+1) ->
    (lpc (..., order), residual energy (...,))."""
    E = autocorr[..., 0]
    lpc = [jnp.zeros_like(E) for _ in range(order)]
    for i in range(order):
        ki = autocorr[..., i + 1]
        for j in range(i):
            ki = ki + lpc[j] * autocorr[..., i - j]
        ki = ki / E
        c = jnp.maximum(1.0 - ki * ki, 1.0e-5)
        E = E * c
        new = [None] * (i + 1)
        new[i] = -ki
        for j in range(i):
            new[j] = lpc[j] - ki * lpc[i - j - 1]
        for j in range(i + 1):
            lpc[j] = new[j]
    return jnp.stack(lpc, axis=-1), E


def lpc_to_cepstrum_batch(lpc: jnp.ndarray, order: int) -> jnp.ndarray:
    """Vectorized Lpc2Cepstrum."""
    ceps = []
    for i in range(order):
        s = jnp.zeros_like(lpc[..., 0])
        for j in range(i):
            s = s + (i - j) * lpc[..., j] * ceps[i - j - 1]
        ceps.append(-lpc[..., i] - s / (i + 1))
    return jnp.stack(ceps, axis=-1)
