"""nnet2 training-example containers + extraction, reference wire
format (nnet2/nnet-example.cc:NnetExample::Write — <Lab1> simple /
<Lab2> generic labels, CompressedMatrix input frames, <LeftContext>,
<SpkInfo>; DiscriminativeNnetExample::Write — weight, num_ali,
CompactLattice den_lat).  Extraction mirrors nnet2bin/nnet-get-egs.cc
(frame-by-frame with edge-replicated context, frames-per-eg packing,
const-feat-dim split into spk_info)."""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from kaldi_tpu.base import io_funcs as iof
from kaldi_tpu.base.logging import KaldiTpuError
from kaldi_tpu.matrix.compressed import write_compressed_matrix


class NnetExample:
    """One or more labeled frames + context rows (nnet-example.h:36)."""

    def __init__(self, labels: List[List[Tuple[int, float]]],
                 input_frames: np.ndarray, left_context: int,
                 spk_info: Optional[np.ndarray] = None):
        self.labels = labels
        self.input_frames = np.asarray(input_frames, np.float32)
        self.left_context = int(left_context)
        self.spk_info = (np.zeros(0, np.float32) if spk_info is None
                         else np.asarray(spk_info, np.float32))

    @property
    def num_frames(self) -> int:
        return len(self.labels)

    @property
    def right_context(self) -> int:
        return (self.input_frames.shape[0] - len(self.labels)
                - self.left_context)

    def has_simple_labels(self) -> bool:
        return all(len(f) == 1 and f[0][1] == 1.0 for f in self.labels)

    @classmethod
    def read(cls, stream, binary) -> "NnetExample":
        iof.expect_token(stream, binary, "<NnetExample>")
        tok = iof.read_token(stream, binary)
        if tok == "<Lab1>":
            simple = iof.read_int_vector(stream, binary)
            labels = [[(int(p), 1.0)] for p in simple]
        elif tok == "<Lab2>":
            nf = iof.read_int32(stream, binary)
            labels = []
            for _ in range(nf):
                sz = iof.read_int32(stream, binary)
                labels.append([(iof.read_int32(stream, binary),
                                iof.read_float(stream, binary))
                               for _ in range(sz)])
        elif tok == "<Labels>":       # pre-2014 single-frame format
            sz = iof.read_int32(stream, binary)
            labels = [[(iof.read_int32(stream, binary),
                        iof.read_float(stream, binary))
                       for _ in range(sz)]]
        else:
            raise KaldiTpuError(f"NnetExample: bad label token {tok}")
        iof.expect_token(stream, binary, "<InputFrames>")
        frames = iof.read_matrix(stream, binary)
        iof.expect_token(stream, binary, "<LeftContext>")
        lc = iof.read_int32(stream, binary)
        iof.expect_token(stream, binary, "<SpkInfo>")
        spk = iof.read_vector(stream, binary)
        iof.expect_token(stream, binary, "</NnetExample>")
        return cls(labels, frames, lc, spk)

    def write(self, stream, binary) -> None:
        iof.write_token(stream, binary, "<NnetExample>")
        if self.has_simple_labels():
            iof.write_token(stream, binary, "<Lab1>")
            iof.write_int_vector(stream, binary,
                                 [f[0][0] for f in self.labels])
        else:
            iof.write_token(stream, binary, "<Lab2>")
            iof.write_int32(stream, binary, len(self.labels))
            for f in self.labels:
                iof.write_int32(stream, binary, len(f))
                for pdf, w in f:
                    iof.write_int32(stream, binary, int(pdf))
                    iof.write_float(stream, binary, float(w))
        iof.write_token(stream, binary, "<InputFrames>")
        if binary:
            write_compressed_matrix(stream, self.input_frames)
        else:
            iof.write_matrix(stream, binary, self.input_frames)
        iof.write_token(stream, binary, "<LeftContext>")
        iof.write_int32(stream, binary, self.left_context)
        iof.write_token(stream, binary, "<SpkInfo>")
        iof.write_vector(stream, binary, self.spk_info)
        iof.write_token(stream, binary, "</NnetExample>")

    def subrange(self, start_frame: int, num_frames: int,
                 left_context: int = -1,
                 right_context: int = -1) -> "NnetExample":
        """Extract labeled frames [start, start+num) with (possibly
        truncated) context — the splitting constructor
        (nnet-example.cc:NnetExample(input, start, ...))."""
        nf = len(self.labels)
        start = max(0, min(start_frame, nf - 1))
        num = min(num_frames if num_frames > 0 else nf - start,
                  nf - start)
        lc = self.left_context if left_context < 0 else \
            min(left_context, self.left_context + start)
        rc = self.right_context if right_context < 0 else \
            min(right_context, self.right_context + nf - start - num)
        row0 = self.left_context + start - lc
        rows = lc + num + rc
        return NnetExample(self.labels[start:start + num],
                           self.input_frames[row0:row0 + rows],
                           lc, self.spk_info)


class DiscriminativeNnetExample:
    """Numerator alignment + denominator lattice + input frames
    (nnet-example.h:136)."""

    def __init__(self, weight: float, num_ali: List[int], den_lat,
                 input_frames: np.ndarray, left_context: int,
                 spk_info: Optional[np.ndarray] = None):
        self.weight = float(weight)
        self.num_ali = [int(t) for t in num_ali]
        self.den_lat = den_lat                      # CompactLattice
        self.input_frames = np.asarray(input_frames, np.float32)
        self.left_context = int(left_context)
        self.spk_info = (np.zeros(0, np.float32) if spk_info is None
                         else np.asarray(spk_info, np.float32))

    @classmethod
    def read(cls, stream, binary) -> "DiscriminativeNnetExample":
        from kaldi_tpu.lat.kaldi_lattice import read_compact_lattice
        iof.expect_token(stream, binary, "<DiscriminativeNnetExample>")
        iof.expect_token(stream, binary, "<Weight>")
        weight = iof.read_float(stream, binary)
        iof.expect_token(stream, binary, "<NumAli>")
        num_ali = iof.read_int_vector(stream, binary)
        den_lat = read_compact_lattice(stream, binary)
        iof.expect_token(stream, binary, "<InputFrames>")
        frames = iof.read_matrix(stream, binary)
        iof.expect_token(stream, binary, "<LeftContext>")
        lc = iof.read_int32(stream, binary)
        iof.expect_token(stream, binary, "<SpkInfo>")
        spk = iof.read_vector(stream, binary)
        iof.expect_token(stream, binary, "</DiscriminativeNnetExample>")
        return cls(weight, num_ali, den_lat, frames, lc, spk)

    def write(self, stream, binary) -> None:
        from kaldi_tpu.lat.kaldi_lattice import write_compact_lattice
        iof.write_token(stream, binary, "<DiscriminativeNnetExample>")
        iof.write_token(stream, binary, "<Weight>")
        iof.write_float(stream, binary, self.weight)
        iof.write_token(stream, binary, "<NumAli>")
        iof.write_int_vector(stream, binary, self.num_ali)
        write_compact_lattice(stream, binary, self.den_lat)
        iof.write_token(stream, binary, "<InputFrames>")
        if binary:
            write_compressed_matrix(stream, self.input_frames)
        else:
            iof.write_matrix(stream, binary, self.input_frames)
        iof.write_token(stream, binary, "<LeftContext>")
        iof.write_int32(stream, binary, self.left_context)
        iof.write_token(stream, binary, "<SpkInfo>")
        iof.write_vector(stream, binary, self.spk_info)
        iof.write_token(stream, binary, "</DiscriminativeNnetExample>")

    def hash_value(self) -> int:
        """Structure hash for nnet-compare-hash-discriminative: stable
        across compression round-trips (quantized features, alignment,
        lattice arc multiset)."""
        h = len(self.num_ali) * 1000003 + len(self.den_lat.arcs)
        for t in self.num_ali:
            h = (h * 131 + t) & 0x7FFFFFFF
        q = np.round(self.input_frames * 16.0).astype(np.int64)
        h = (h * 131 + int(q.sum()) + int((q * q).sum() % 1000003)) \
            & 0x7FFFFFFF
        for s in range(self.den_lat.num_states):
            for a in self.den_lat.arcs[s]:
                h = (h * 31 + a.ilabel * 7 + a.nextstate) & 0x7FFFFFFF
        return h


def extract_egs(feats: np.ndarray, post, left_context: int,
                right_context: int, frames_per_eg: int = 1,
                const_feat_dim: int = 0,
                frame_weights: Optional[np.ndarray] = None,
                keep_proportion: float = 1.0,
                rng: Optional[np.random.RandomState] = None
                ) -> List[NnetExample]:
    """nnet-get-egs.cc: one example per `frames_per_eg` labeled frames
    with edge-replicated context rows; the last `const_feat_dim`
    feature columns (e.g. appended i-vectors) are averaged into
    spk_info.  `post` is a pdf-level Posterior (list per frame of
    (pdf, weight)); frame_weights scales label weights and drops
    zero-weight frames (nnet-get-weighted-egs.cc)."""
    feats = np.asarray(feats, np.float32)
    T = min(feats.shape[0], len(post))
    var = feats[:, :feats.shape[1] - const_feat_dim]
    spk = (feats[:, feats.shape[1] - const_feat_dim:].mean(axis=0)
           if const_feat_dim > 0 else None)
    padded = np.concatenate(
        [np.repeat(var[:1], left_context, axis=0), var[:T],
         np.repeat(var[T - 1:T], right_context, axis=0)])
    out = []
    for start in range(0, T, frames_per_eg):
        num = min(frames_per_eg, T - start)
        labels = []
        for t in range(start, start + num):
            w = 1.0 if frame_weights is None else float(frame_weights[t])
            labels.append([(int(p), float(pw) * w)
                           for p, pw in post[t] if pw * w != 0.0])
        if all(not f for f in labels):
            continue
        if keep_proportion < 1.0 and rng is not None and \
                rng.uniform() > keep_proportion:
            continue
        rows = padded[start:start + num + left_context + right_context]
        out.append(NnetExample(labels, rows, left_context, spk))
    return out
