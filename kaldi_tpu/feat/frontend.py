"""Batched, fused feature extraction (MFCC / fbank / spectrogram).

Behavioral parity with the reference's OfflineFeatureTpl pipeline
(feat/feature-common.h:111 + feature-mfcc.cc:28, feature-fbank.cc:72,
feature-spectrogram.cc:47), re-designed TPU-first: instead of a
per-frame scalar loop, the whole utterance batch is framed with one
gather, and dither→DC→energy→preemphasis→window→FFT→mel→DCT run as a
single jitted XLA program over a (batch, frames, window) tensor — the
mel and DCT stages are MXU matmuls. This is also the design of the
reference's GPU batch frontend (cudafeat/feature-online-batched-
spectral-cuda.h:44), with XLA fusion replacing the hand-fused kernels.

Shapes are bucketed (power-of-two frame counts) so each bucket compiles
once and is reused across utterances.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from kaldi_tpu.feat import window as win
from kaldi_tpu.feat import mel as melmod

_FLT_EPS = float(np.finfo(np.float32).eps)


@jax.jit
def _widen_i16(x):
    return x.astype(jnp.float32)


_MU = 255.0


def mulaw_encode(wave: np.ndarray) -> np.ndarray:
    """8-bit mu-law companding (ITU G.711-style continuous law) of
    int16-range audio — HALVES the wire size again vs int16 for
    tunnel/network-bound ingest.  Decode happens on device
    (_widen_mulaw); round trip is audio-transparent for ASR at
    telephony-standard fidelity."""
    x = np.asarray(wave, np.float32) / 32768.0
    y = np.sign(x) * np.log1p(_MU * np.abs(x)) / np.log1p(_MU)
    return np.clip(np.rint((y + 1.0) * 127.5), 0, 255).astype(np.uint8)


@jax.jit
def _widen_mulaw(u8):
    y = u8.astype(jnp.float32) / 127.5 - 1.0
    x = jnp.sign(y) * jnp.expm1(jnp.abs(y) * np.log1p(_MU)) / _MU
    return x * 32768.0
_FLT_MIN_LOG = float(np.log(np.finfo(np.float32).tiny))


@dataclass
class MfccOptions:
    frame_opts: win.FrameExtractionOptions = field(default_factory=win.FrameExtractionOptions)
    mel_opts: melmod.MelBanksOptions = field(default_factory=lambda: melmod.MelBanksOptions(23))
    num_ceps: int = field(default=13, metadata={"doc": "Number of cepstra in MFCC computation (including C0)"})
    use_energy: bool = field(default=True, metadata={"doc": "Use energy (not C0) in MFCC computation"})
    energy_floor: float = field(default=0.0, metadata={"doc": "Floor on energy (absolute) in MFCC computation"})
    raw_energy: bool = field(default=True, metadata={"doc": "If true, compute energy before preemphasis and windowing"})
    cepstral_lifter: float = field(default=22.0, metadata={"doc": "Constant that controls scaling of MFCCs"})
    htk_compat: bool = field(default=False, metadata={"doc": "Put energy or C0 last and use a factor of sqrt(2) on C0"})

    feature_type = "mfcc"

    def dim(self) -> int:
        return self.num_ceps


@dataclass
class FbankOptions:
    frame_opts: win.FrameExtractionOptions = field(default_factory=win.FrameExtractionOptions)
    mel_opts: melmod.MelBanksOptions = field(default_factory=lambda: melmod.MelBanksOptions(23))
    use_energy: bool = field(default=False, metadata={"doc": "Add an extra dimension with energy to the FBANK output"})
    energy_floor: float = field(default=0.0, metadata={"doc": "Floor on energy (absolute) in FBANK computation"})
    raw_energy: bool = field(default=True, metadata={"doc": "If true, compute energy before preemphasis and windowing"})
    htk_compat: bool = field(default=False, metadata={"doc": "If true, put energy last"})
    use_log_fbank: bool = field(default=True, metadata={"doc": "If true, produce log-filterbank, else linear"})
    use_power: bool = field(default=True, metadata={"doc": "If true, use power, else magnitude"})

    feature_type = "fbank"

    def dim(self) -> int:
        return self.mel_opts.num_bins + (1 if self.use_energy else 0)


@dataclass
class SpectrogramOptions:
    frame_opts: win.FrameExtractionOptions = field(default_factory=win.FrameExtractionOptions)
    energy_floor: float = field(default=0.0, metadata={"doc": "Floor on energy in Spectrogram computation"})
    raw_energy: bool = field(default=True, metadata={"doc": "If true, compute energy before preemphasis and windowing"})
    return_raw_fft: bool = False

    feature_type = "spectrogram"

    def dim(self) -> int:
        return self.frame_opts.padded_window_size() // 2 + 1


def _bucket(n: int, minimum: int = 16) -> int:
    b = minimum
    while b < n:
        b *= 2
    return b


class OfflineFeature:
    """Batched offline feature extractor.

    compute(wave)                → (num_frames, dim) for one utterance
    compute_batch(waves)         → list of per-utterance feature arrays

    `waves` are raw sample-valued float arrays (Kaldi convention:
    int16-range values, not normalized).
    """

    def __init__(self, opts):
        self.opts = opts
        fo = opts.frame_opts
        self.window_fn = win.feature_window_function(fo)
        self.type = opts.feature_type
        if self.type in ("mfcc", "fbank", "plp"):
            self.mel_cache: Dict[float, tuple] = {}
        if self.type == "mfcc":
            nb = opts.mel_opts.num_bins
            if opts.num_ceps > nb:
                raise ValueError("num-ceps cannot be larger than num-mel-bins")
            self.dct = melmod.compute_dct_matrix(opts.num_ceps, nb)
            self.lifter = (melmod.compute_lifter_coeffs(opts.cepstral_lifter,
                                                        opts.num_ceps)
                           if opts.cepstral_lifter != 0.0 else None)
        if self.type == "plp":
            from kaldi_tpu.feat.plp import idft_bases
            assert opts.num_ceps <= opts.lpc_order + 1
            self.idft = idft_bases(opts.lpc_order + 1,
                                   opts.mel_opts.num_bins + 2)
            self.lifter = (melmod.compute_lifter_coeffs(opts.cepstral_lifter,
                                                        opts.num_ceps)
                           if opts.cepstral_lifter != 0.0 else None)
        self._rng = np.random.default_rng(0)

    def dim(self) -> int:
        return self.opts.dim()

    # -- host-side helpers ---------------------------------------------------

    def _mel_weights(self, vtln_warp: float) -> np.ndarray:
        return self._mel_pair(vtln_warp)[0]

    def _mel_pair(self, vtln_warp: float):
        if vtln_warp not in self.mel_cache:
            self.mel_cache[vtln_warp] = melmod.mel_banks_matrix(
                self.opts.mel_opts, self.opts.frame_opts, vtln_warp)
        return self.mel_cache[vtln_warp]

    # -- the fused device program ---------------------------------------------

    @functools.partial(jax.jit, static_argnums=(0, 3))
    def _compute_frames(self, frames, params, use_dither_key):
        """frames: (B, F, window_size) raw windowed segments (already
        gathered); params: dict of device constants. Returns (B, F, dim)."""
        opts = self.opts
        fo = opts.frame_opts
        frame_length = fo.window_size()
        padded = fo.padded_window_size()
        x = frames.astype(jnp.float32)

        if use_dither_key:
            noise = jax.random.normal(params["key"], x.shape, dtype=jnp.float32)
            x = x + noise * fo.dither

        if fo.remove_dc_offset:
            x = x - jnp.mean(x, axis=-1, keepdims=True)

        raw_log_energy = jnp.log(jnp.maximum(jnp.sum(x * x, axis=-1), _FLT_EPS))

        if fo.preemph_coeff != 0.0:
            shifted = jnp.concatenate([x[..., :1], x[..., :-1]], axis=-1)
            x = x - fo.preemph_coeff * shifted

        x = x * params["window_fn"]

        windowed_log_energy = jnp.log(
            jnp.maximum(jnp.sum(x * x, axis=-1), _FLT_EPS))

        if padded > frame_length:
            pad = [(0, 0)] * (x.ndim - 1) + [(0, padded - frame_length)]
            x = jnp.pad(x, pad)

        spectrum = jnp.fft.rfft(x, axis=-1)
        power = (spectrum.real ** 2 + spectrum.imag ** 2).astype(jnp.float32)

        raw = getattr(opts, "raw_energy", True)
        log_energy = raw_log_energy if raw else windowed_log_energy

        if self.type == "spectrogram":
            feat = jnp.log(jnp.maximum(power, _FLT_EPS))
            if opts.energy_floor > 0.0:
                log_energy = jnp.maximum(log_energy,
                                         float(np.log(opts.energy_floor)))
            feat = feat.at[..., 0].set(log_energy)
            return feat

        use_power = getattr(opts, "use_power", True)
        ps = power[..., :padded // 2]
        if not use_power:
            ps = jnp.sqrt(ps)
        # mel projection: MXU matmul (num_fft_bins × num_bins). HIGHEST
        # precision: feature parity needs true f32, not bf16 passes.
        mel_energies = jnp.einsum("...f,mf->...m", ps, params["mel"],
                                  precision=jax.lax.Precision.HIGHEST,
                                  preferred_element_type=jnp.float32)

        if self.type == "plp":
            from kaldi_tpu.feat.plp import durbin_batch, lpc_to_cepstrum_batch
            order = opts.lpc_order
            m = mel_energies * params["equal_loudness"]
            m = jnp.power(jnp.maximum(m, _FLT_EPS), opts.compress_factor)
            # duplicate first and last bins (feature-plp.cc:152)
            dup = jnp.concatenate([m[..., :1], m, m[..., -1:]], axis=-1)
            autocorr = jnp.einsum("...d,od->...o", dup, params["idft"],
                                  precision=jax.lax.Precision.HIGHEST)
            lpc, resid = durbin_batch(autocorr, order)
            # quirk preserved from feature-plp.cc:162: the residual LOG
            # energy is floored at FLT_MIN (≈0), not at log of a floor
            resid_log = jnp.maximum(jnp.log(jnp.maximum(resid, 1e-37)),
                                    float(np.finfo(np.float32).tiny))
            ceps = lpc_to_cepstrum_batch(lpc, order)
            feat = jnp.concatenate([resid_log[..., None],
                                    ceps[..., :opts.num_ceps - 1]], axis=-1)
            if self.lifter is not None:
                feat = feat * params["lifter"]
            if opts.cepstral_scale != 1.0:
                feat = feat * opts.cepstral_scale
            if opts.use_energy:
                if opts.energy_floor > 0.0:
                    log_energy = jnp.maximum(log_energy,
                                             float(np.log(opts.energy_floor)))
                feat = feat.at[..., 0].set(log_energy)
            if opts.htk_compat:
                feat = jnp.concatenate([feat[..., 1:], feat[..., :1]],
                                       axis=-1)
            return feat

        if self.type == "fbank":
            if opts.use_log_fbank:
                mel_energies = jnp.log(jnp.maximum(mel_energies, _FLT_EPS))
            if opts.use_energy:
                if opts.energy_floor > 0.0:
                    log_energy = jnp.maximum(log_energy,
                                             float(np.log(opts.energy_floor)))
                e = log_energy[..., None]
                if opts.htk_compat:
                    return jnp.concatenate([mel_energies, e], axis=-1)
                return jnp.concatenate([e, mel_energies], axis=-1)
            return mel_energies

        # mfcc
        mel_log = jnp.log(jnp.maximum(mel_energies, _FLT_EPS))
        feat = jnp.einsum("...m,cm->...c", mel_log, params["dct"],
                          precision=jax.lax.Precision.HIGHEST,
                          preferred_element_type=jnp.float32)
        if self.lifter is not None:
            feat = feat * params["lifter"]
        if opts.use_energy:
            if opts.energy_floor > 0.0:
                log_energy = jnp.maximum(log_energy,
                                         float(np.log(opts.energy_floor)))
            feat = feat.at[..., 0].set(log_energy)
        if opts.htk_compat:
            c0 = feat[..., :1]
            if not opts.use_energy:
                c0 = c0 * np.sqrt(2.0, dtype=np.float32)
            feat = jnp.concatenate([feat[..., 1:], c0], axis=-1)
        return feat

    # -- framing ---------------------------------------------------------------

    def _gather_frames(self, wave_batch: jnp.ndarray, lengths: np.ndarray,
                       max_frames: int) -> jnp.ndarray:
        """wave_batch: (B, T) zero-padded; lengths: (B,) true lengths.
        Returns (B, max_frames, window_size)."""
        fo = self.opts.frame_opts
        idx = jnp.asarray(win.frame_indices(max_frames, wave_batch.shape[1], fo))
        if fo.snip_edges:
            idx = jnp.clip(idx, 0, wave_batch.shape[1] - 1)
            return wave_batch[:, idx]
        n = jnp.asarray(lengths, jnp.int32)[:, None, None]
        ref = win.reflect_indices(idx[None, :, :], n)
        return jax.vmap(lambda w, i: w[i])(wave_batch, ref)

    # -- public API --------------------------------------------------------------

    def compute(self, wave: np.ndarray, vtln_warp: float = 1.0,
                seed: Optional[int] = None) -> np.ndarray:
        return self.compute_batch([wave], vtln_warp, seed)[0]

    def compute_batch(self, waves: Sequence[np.ndarray],
                      vtln_warp: float = 1.0,
                      seed: Optional[int] = None) -> List[np.ndarray]:
        feats, nframes = self.compute_batch_device(waves, vtln_warp,
                                                   seed)
        feats = np.asarray(feats)
        return [feats[i, :nframes[i]] for i in range(len(waves))]

    def stage_batch(self, waves: Sequence[np.ndarray]):
        """Host-side staging only: pad the wave batch to its bucket
        and pick the wire dtype.  Returns (batch (B, T) numpy, lengths,
        nframes, bucket_f) — hand `jax.device_put(batch)` plus the
        metadata to compute_batch_device(staged=...) to overlap the
        host->device transfer with earlier waves' compute (the tunnel
        link transfers DO overlap device compute; BASELINE.md)."""
        fo = self.opts.frame_opts
        lengths = np.array([len(w) for w in waves], dtype=np.int32)
        nframes = np.array([win.num_frames(int(n), fo) for n in lengths],
                           dtype=np.int32)
        max_f = int(nframes.max(initial=0))
        if max_f == 0:
            return (np.zeros((len(waves), 1), np.float32), lengths,
                    nframes, 0)
        bucket_f = _bucket(max_f)
        # padded sample budget covering bucket_f frames; reflection
        # maps any out-of-range index back into [0, true_length)
        need = win.first_sample_of_frame(bucket_f - 1, fo) + \
            fo.window_size()
        T = max(need, int(lengths.max(initial=1)))
        dtypes = {np.asarray(w).dtype for w in waves}
        if dtypes == {np.dtype(np.uint8)}:        # mu-law wire
            wire_dtype = np.uint8
        elif dtypes == {np.dtype(np.int16)}:
            wire_dtype = np.int16
        else:
            wire_dtype = np.float32
        batch = np.zeros((len(waves), T), dtype=wire_dtype)
        for i, w in enumerate(waves):
            batch[i, :len(w)] = np.asarray(w, dtype=wire_dtype)
        return batch, lengths, nframes, bucket_f

    def compute_batch_device(self, waves: Sequence[np.ndarray] = (),
                             vtln_warp: float = 1.0,
                             seed: Optional[int] = None,
                             staged=None):
        """Device-resident variant: returns (feats (B, F_bucket, dim)
        ON DEVICE, nframes (B,) numpy).  Rows past nframes[i] are
        garbage (reflection-gathered) — consumers mask by length.
        int16 input waves are uploaded as int16 and widened on device,
        halving the host->device transfer (the tunnel link is the
        bottleneck of the offline pipeline; see BASELINE.md).
        staged: the (batch, lengths, nframes, bucket_f) of
        stage_batch(), where batch may already live on device."""
        fo = self.opts.frame_opts
        if staged is not None:
            batch, lengths, nframes, bucket_f = staged
        else:
            batch, lengths, nframes, bucket_f = self.stage_batch(waves)
        if bucket_f == 0:
            return (jnp.zeros((batch.shape[0], 0, self.dim()),
                              jnp.float32), nframes)

        params = {"window_fn": jnp.asarray(self.window_fn)}
        if self.type in ("mfcc", "fbank", "plp"):
            params["mel"] = jnp.asarray(self._mel_weights(vtln_warp))
        if self.type == "mfcc":
            params["dct"] = jnp.asarray(self.dct)
            if self.lifter is not None:
                params["lifter"] = jnp.asarray(self.lifter)
        if self.type == "plp":
            from kaldi_tpu.feat.plp import equal_loudness_vector
            _, center = self._mel_pair(vtln_warp)
            params["equal_loudness"] = jnp.asarray(
                equal_loudness_vector(center))
            params["idft"] = jnp.asarray(self.idft)
            if self.lifter is not None:
                params["lifter"] = jnp.asarray(self.lifter)
        use_dither = fo.dither != 0.0
        if use_dither:
            if seed is None:
                seed = int(self._rng.integers(2 ** 31 - 1))
            params["key"] = jax.random.PRNGKey(seed)

        wb = jnp.asarray(batch)
        if wb.dtype == jnp.uint8:
            # mu-law wire: quarter the float32 transfer; expand on
            # device back to int16-range float
            wb = _widen_mulaw(wb)
        elif wb.dtype == jnp.int16:
            # widen on device FIRST: the wire stays int16 (half the
            # transfer) but the gather/FFT programs stay float32 —
            # int16 gathers hit TPU compiler pathologies
            wb = _widen_i16(wb)
        frames = self._gather_frames(wb, lengths, bucket_f)
        feats = self._compute_frames(frames, params, use_dither)
        return feats, nframes


def make_feature_computer(feature_type: str, opts=None) -> OfflineFeature:
    if opts is None:
        from kaldi_tpu.feat.plp import PlpOptions
        opts = {"mfcc": MfccOptions, "fbank": FbankOptions,
                "spectrogram": SpectrogramOptions,
                "plp": PlpOptions}[feature_type]()
    return OfflineFeature(opts)
