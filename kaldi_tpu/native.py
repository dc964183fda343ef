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
