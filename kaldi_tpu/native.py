"""Loader for the native C++ fast paths (native/kt_native.cpp).

Compiled on demand with g++ into the package build dir and loaded via
ctypes; every caller must degrade gracefully to the Python
implementation when no toolchain is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

from kaldi_tpu.base.logging import vlog, warn

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native", "kt_native.cpp")


def _build_dir() -> str:
    d = os.path.join(os.path.dirname(_SRC), "build")
    os.makedirs(d, exist_ok=True)
    return d


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    so = os.path.join(_build_dir(), "libkt_native.so")
    try:
        if (not os.path.exists(so)
                or os.path.getmtime(so) < os.path.getmtime(_SRC)):
            cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                   _SRC, "-o", so]
            subprocess.run(cmd, check=True, capture_output=True)
        lib = ctypes.CDLL(so)
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        lib.beam_viterbi.restype = ctypes.c_int
        lib.beam_viterbi.argtypes = [
            i32p, i32p, i32p, i32p, i32p, f32p, ctypes.c_int64,   # emitting
            i32p, i32p, i32p, f32p, ctypes.c_int64, ctypes.c_int32,  # eps
            ctypes.c_int32, ctypes.c_int32, f32p,                 # S,start,final
            f32p, ctypes.c_int64, ctypes.c_int64,                 # ll,T,P
            ctypes.c_float, ctypes.c_float,                       # scale,beam
            i32p, ctypes.c_int32, ctypes.POINTER(ctypes.c_int32),
            i32p, ctypes.c_int32, ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float),
        ]
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        i8p = np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS")
        lib.ark_scan_matrices.restype = ctypes.c_int
        lib.ark_scan_matrices.argtypes = [
            ctypes.c_char_p,
            ctypes.c_char_p, ctypes.c_int64,
            i64p, i32p, i32p, i8p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
        ]
        _LIB = lib
        vlog(1, f"loaded native library {so}")
    except Exception as e:  # pragma: no cover - toolchain-dependent
        warn(f"native fast path unavailable ({e}); using Python paths")
        _LIB = None
    return _LIB


class NativeViterbi:
    """Native beam Viterbi over a packed DeviceGraph."""

    def __init__(self, graph):
        from kaldi_tpu.decoder.batched_viterbi import DeviceGraph, pack_graph
        if not isinstance(graph, DeviceGraph):
            graph = pack_graph(graph)
        self.g = graph
        self.lib = get_lib()

    @property
    def available(self) -> bool:
        return self.lib is not None

    def decode(self, loglikes: np.ndarray, tid_to_pdf: np.ndarray,
               acoustic_scale: float = 1.0, beam: float = 1e9):
        g = self.g
        lib = self.lib
        ll = np.ascontiguousarray(loglikes, np.float32)
        T, P = ll.shape
        e_pdf = np.ascontiguousarray(
            np.asarray(tid_to_pdf)[np.clip(g.e_ilabel, 0,
                                           len(tid_to_pdf) - 1)], np.int32)
        # word-labeled epsilon chains make words unbounded by T, so
        # the native side takes capacities and returns -3 when they
        # are exceeded; retry with bigger buffers before giving up.
        words_cap = T + g.num_states + 1
        for _attempt in range(3):
            out_ali = np.zeros(T + 1, np.int32)
            out_words = np.zeros(words_cap, np.int32)
            ali_len = ctypes.c_int32()
            words_len = ctypes.c_int32()
            cost = ctypes.c_float()
            rc = lib.beam_viterbi(
                np.ascontiguousarray(g.e_src), np.ascontiguousarray(g.e_dst),
                e_pdf, np.ascontiguousarray(g.e_ilabel),
                np.ascontiguousarray(g.e_olabel),
                np.ascontiguousarray(g.e_weight), len(g.e_src),
                np.ascontiguousarray(g.ne_src),
                np.ascontiguousarray(g.ne_dst),
                np.ascontiguousarray(g.ne_olabel),
                np.ascontiguousarray(g.ne_weight), len(g.ne_src),
                max(g.eps_depth, 3),
                g.num_states, g.start,
                np.ascontiguousarray(g.final, np.float32),
                ll, T, P, acoustic_scale, beam,
                out_ali, len(out_ali), ctypes.byref(ali_len),
                out_words, len(out_words), ctypes.byref(words_len),
                ctypes.byref(cost))
            if rc == -3:
                words_cap *= 8
                continue
            if rc != 0:
                return None
            return (out_ali[:ali_len.value].tolist(),
                    out_words[:words_len.value].tolist(), float(cost.value))
        return None


def ark_matrix_entries(path: str):
    """Native bulk scan of a plain binary matrix archive.  Returns
    [(key, offset, rows, cols, np.dtype)] or None when the native
    library is unavailable or the file is not a supported plain
    binary FM/DM ark (caller falls back to the Python reader)."""
    lib = get_lib()
    if lib is None:
        return None
    try:
        size = os.path.getsize(path)
    except OSError:
        return None
    max_entries = max(64, min(size // 32 + 8, 50_000_000))
    keys_cap = max(4096, min(size + 16, 1 << 31))
    while True:
        keys_buf = ctypes.create_string_buffer(int(keys_cap))
        offsets = np.zeros(max_entries, np.int64)
        rows = np.zeros(max_entries, np.int32)
        cols = np.zeros(max_entries, np.int32)
        dtypes = np.zeros(max_entries, np.int8)
        n = ctypes.c_int64()
        klen = ctypes.c_int64()
        rc = lib.ark_scan_matrices(
            path.encode(), keys_buf, int(keys_cap), offsets, rows,
            cols, dtypes, int(max_entries), ctypes.byref(n),
            ctypes.byref(klen))
        if rc == -3:
            max_entries *= 4
            keys_cap *= 4
            continue
        if rc != 0:
            return None
        keys = keys_buf.raw[:klen.value].split(b"\0")[:-1]
        out = []
        for i in range(n.value):
            dt = np.dtype("<f4") if dtypes[i] == 0 else np.dtype("<f8")
            out.append((keys[i].decode("utf-8"), int(offsets[i]),
                        int(rows[i]), int(cols[i]), dt))
        return out


def iter_ark_matrices(path: str):
    """Yield (key, matrix) pairs via the native scan + one mmap; None
    if the fast path does not apply."""
    entries = ark_matrix_entries(path)
    if entries is None:
        return None
    data = np.memmap(path, dtype=np.uint8, mode="r")

    def gen():
        for key, off, r, c, dt in entries:
            flat = data[off:off + r * c * dt.itemsize].view(dt)
            yield key, np.ascontiguousarray(flat.reshape(r, c))
    return gen()
