"""Timing/profiling utilities (parity: base/timer.h Timer +
CuDevice::AccuProfile/PrintProfile per-op time accounting,
cu-device.h:197-202, and the RTF reporting of online2/online-timing.h).

For deep device profiles use jax.profiler traces; this module keeps the
reference's lightweight accumulate-by-name report for host-visible
spans."""

from __future__ import annotations

import atexit
import time
from collections import defaultdict
from contextlib import contextmanager
from typing import Dict

from kaldi_tpu.base.logging import get_verbose_level, log

_profile: Dict[str, float] = defaultdict(float)
_counts: Dict[str, int] = defaultdict(int)


class Timer:
    def __init__(self):
        self.reset()

    def reset(self):
        self._start = time.perf_counter()

    def elapsed(self) -> float:
        return time.perf_counter() - self._start


@contextmanager
def profile(name: str):
    """Accumulate wall time under `name` (AccuProfile)."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        _profile[name] += time.perf_counter() - t0
        _counts[name] += 1


def print_profile(top: int = 20) -> None:
    """PrintProfile: per-name accumulated times, largest first."""
    items = sorted(_profile.items(), key=lambda kv: -kv[1])[:top]
    total = sum(_profile.values())
    log("-----[Profile]-----")
    for name, t in items:
        log(f"{name}\t{t:.3f}s\t({_counts[name]} calls)")
    log(f"total profiled time: {total:.3f}s")


def maybe_print_profile_at_exit():
    """Like the reference: print the profile at process exit when
    --verbose >= 1."""
    def _report():
        if get_verbose_level() >= 1 and _profile:
            print_profile()
    atexit.register(_report)


class OnlineTimer:
    """RTF reporting for streaming decoding (online2/online-timing.h):
    tracks wall time vs audio time."""

    def __init__(self, utterance_id: str = ""):
        self.utt = utterance_id
        self._start = time.perf_counter()
        self.audio_seconds = 0.0

    def wait_until(self, audio_seconds: float) -> None:
        """Simulate real-time arrival (sleeps if ahead of real time)."""
        self.audio_seconds = audio_seconds
        elapsed = time.perf_counter() - self._start
        if elapsed < audio_seconds:
            time.sleep(audio_seconds - elapsed)

    def compute_now(self, audio_seconds: float) -> None:
        self.audio_seconds = audio_seconds

    def real_time_factor(self) -> float:
        elapsed = time.perf_counter() - self._start
        return elapsed / max(self.audio_seconds, 1e-9)


class TaskSequencer:
    """Ordered parallel task execution (util/kaldi-thread.h:175): tasks
    run concurrently but results are consumed in submission order."""

    def __init__(self, num_threads: int = 4):
        from concurrent.futures import ThreadPoolExecutor
        self._pool = ThreadPoolExecutor(max_workers=max(num_threads, 1))
        self._queue = []

    def run(self, fn, *args, callback=None):
        fut = self._pool.submit(fn, *args)
        self._queue.append((fut, callback))

    def wait(self):
        """Drain in order, invoking callbacks; returns ordered results."""
        out = []
        for fut, cb in self._queue:
            res = fut.result()
            if cb is not None:
                cb(res)
            out.append(res)
        self._queue.clear()
        return out

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.wait()
        self._pool.shutdown()
