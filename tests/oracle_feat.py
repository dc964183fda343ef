"""Reference-faithful per-frame numpy oracle for feature extraction.

Implements the algorithms of feat/feature-window.cc, feature-mfcc.cc,
feature-fbank.cc, feature-spectrogram.cc literally (one frame at a
time, same op ordering) as an independent check of the fused batched
TPU implementation — the same role the matrix-vs-cudamatrix
equivalence tests play in the reference (SURVEY.md §4.4).
"""

import numpy as np

from kaldi_tpu.feat import mel as melmod
from kaldi_tpu.feat import window as win

EPS = np.float32(np.finfo(np.float32).eps)


def extract_window(wave, f, opts):
    frame_length = opts.window_size()
    start = win.first_sample_of_frame(f, opts)
    n = len(wave)
    idx = np.arange(start, start + frame_length)
    for _ in range(2):
        idx = np.where(idx < 0, -idx - 1, idx)
        idx = np.where(idx >= n, 2 * n - 1 - idx, idx)
    return wave[np.clip(idx, 0, n - 1)].astype(np.float32)


def process_window(frame, opts, window_fn):
    frame = frame.copy()
    if opts.remove_dc_offset:
        frame -= frame.mean()
    log_energy = np.log(max(np.dot(frame, frame), EPS))
    if opts.preemph_coeff != 0.0:
        out = frame.copy()
        out[1:] -= opts.preemph_coeff * frame[:-1]
        out[0] -= opts.preemph_coeff * frame[0]
        frame = out
    frame *= window_fn
    return frame, np.float32(log_energy)


def frame_pipeline(wave, opts):
    """Yields (windowed_padded_frame, raw_log_energy, windowed_log_energy)."""
    window_fn = win.feature_window_function(opts)
    nf = win.num_frames(len(wave), opts)
    padded = opts.padded_window_size()
    for f in range(nf):
        frame = extract_window(np.asarray(wave, np.float32), f, opts)
        # raw energy is measured after DC removal, before preemph/window
        # (ProcessWindow, feature-window.cc:141-158)
        work = frame.copy()
        if opts.remove_dc_offset:
            work -= work.mean()
        raw_energy = np.float32(np.log(max(np.dot(work, work), EPS)))
        proc, _ = process_window(frame, opts, window_fn)
        wlog = np.float32(np.log(max(np.dot(proc, proc), EPS)))
        buf = np.zeros(padded, np.float32)
        buf[:len(proc)] = proc
        yield buf, raw_energy, wlog


def mfcc(wave, opts):
    fo = opts.frame_opts
    melw, _ = melmod.mel_banks_matrix(opts.mel_opts, fo, 1.0)
    dct = melmod.compute_dct_matrix(opts.num_ceps, opts.mel_opts.num_bins)
    lifter = (melmod.compute_lifter_coeffs(opts.cepstral_lifter, opts.num_ceps)
              if opts.cepstral_lifter != 0.0 else None)
    rows = []
    for buf, raw_e, win_e in frame_pipeline(wave, fo):
        spec = np.fft.rfft(buf)
        power = (spec.real ** 2 + spec.imag ** 2).astype(np.float32)
        mel_e = melw @ power[:len(buf) // 2]
        mel_log = np.log(np.maximum(mel_e, EPS))
        feat = dct @ mel_log
        if lifter is not None:
            feat *= lifter
        if opts.use_energy:
            feat[0] = raw_e if opts.raw_energy else win_e
        if opts.htk_compat:
            c0 = feat[0] * (np.sqrt(2.0, dtype=np.float32)
                            if not opts.use_energy else 1.0)
            feat = np.concatenate([feat[1:], [c0]])
        rows.append(feat)
    return np.array(rows, np.float32).reshape(-1, opts.num_ceps)


def fbank(wave, opts):
    fo = opts.frame_opts
    melw, _ = melmod.mel_banks_matrix(opts.mel_opts, fo, 1.0)
    rows = []
    for buf, raw_e, win_e in frame_pipeline(wave, fo):
        spec = np.fft.rfft(buf)
        power = (spec.real ** 2 + spec.imag ** 2).astype(np.float32)
        ps = power[:len(buf) // 2]
        if not opts.use_power:
            ps = np.sqrt(ps)
        mel_e = melw @ ps
        if opts.use_log_fbank:
            mel_e = np.log(np.maximum(mel_e, EPS))
        if opts.use_energy:
            e = raw_e if opts.raw_energy else win_e
            mel_e = (np.concatenate([mel_e, [e]]) if opts.htk_compat
                     else np.concatenate([[e], mel_e]))
        rows.append(mel_e)
    return np.array(rows, np.float32).reshape(-1, opts.dim())


def spectrogram(wave, opts):
    fo = opts.frame_opts
    rows = []
    for buf, raw_e, win_e in frame_pipeline(wave, fo):
        spec = np.fft.rfft(buf)
        power = (spec.real ** 2 + spec.imag ** 2).astype(np.float32)
        feat = np.log(np.maximum(power, EPS))
        feat[0] = raw_e if opts.raw_energy else win_e
        rows.append(feat)
    return np.array(rows, np.float32).reshape(-1, opts.dim())
