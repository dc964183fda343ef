"""Streaming neural inference (parity: nnet3's looped computations —
nnet-compile-looped.h / decodable-online-looped.h:135 AdvanceChunk).

The reference compiles a program whose tail jumps back (kGotoLabel) so
recurrent/TDNN history persists across chunks. The scan/shift modules
here are pure functions of a bounded input window, so streaming is a
rolling input buffer: each advance runs the jitted forward on
[left_context | chunk | lookahead] and emits the chunk's outputs —
O(1) state, identical results to the offline forward away from
utterance edges (exact when contexts cover the model's receptive
field)."""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np


class OnlineNnetScorer:
    """Wraps a jitted forward fn(feats (1, T, D)) -> (1, T', P) with
    chunked streaming. frame_subsampling_factor must divide chunk
    sizes; outputs are emitted once lookahead frames are available."""

    def __init__(self, forward: Callable, left_context: int = 20,
                 right_context: int = 20, subsample: int = 1):
        self.forward = forward
        self.left = left_context
        self.right = right_context
        self.sub = subsample
        self._buf: Optional[np.ndarray] = None  # all input frames so far
        self._emitted = 0   # output frames emitted
        self.finished = False

    def accept_features(self, feats: np.ndarray) -> np.ndarray:
        """Add (T, D) input frames; returns newly-ready output frames."""
        feats = np.asarray(feats, np.float32)
        self._buf = (feats if self._buf is None
                     else np.concatenate([self._buf, feats]))
        return self._advance()

    def finish(self) -> np.ndarray:
        self.finished = True
        return self._advance()

    def _advance(self) -> np.ndarray:
        if self._buf is None:
            return np.zeros((0, 0), np.float32)
        T = self._buf.shape[0]
        # output frames computable: those whose lookahead is in-buffer
        ready_in = T if self.finished else max(0, T - self.right)
        ready_out = ready_in // self.sub
        if ready_out <= self._emitted:
            return np.zeros((0, 0), np.float32)
        # run on a window covering [emit_start - left, ready_in + right]
        emit_start_in = self._emitted * self.sub
        lo = max(0, emit_start_in - self.left)
        hi = min(T, ready_in + self.right) if not self.finished else T
        window = self._buf[lo:hi]
        out = np.asarray(self.forward(window[None]))[0]
        # output frame j corresponds to input frame lo + j*sub
        start_j = (emit_start_in - lo) // self.sub
        end_j = start_j + (ready_out - self._emitted)
        end_j = min(end_j, out.shape[0])
        result = out[start_j:end_j]
        self._emitted += result.shape[0]
        return result
