"""nnet1 component zoo + Nnet container (reference src/nnet/nnet-component.cc,
nnet-nnet.cc).

Wire format (nnet-component.cc:233-267): optional "<Nnet>", then per
component: marker token, out-dim, in-dim (note: OUT first), component
data tokens, parameter matrices/vectors, "<!EndOfComponent>"; a
"</Nnet>" token terminates.  Marker matching is case-insensitive
(nnet-component.cc:94-103).

Forward/backprop run in numpy: nnet1 is the legacy compat surface (the
TPU path is the nnet3 stack), and the models are small feedforward
stacks where host evaluation matches the reference's per-utterance
semantics exactly.
"""

from __future__ import annotations

import io as _io
import math
from typing import BinaryIO, List, Optional

import numpy as np

from kaldi_tpu.base import io_funcs as iof


def _softmax(x: np.ndarray) -> np.ndarray:
    m = x.max(axis=-1, keepdims=True)
    e = np.exp(x - m)
    return e / e.sum(axis=-1, keepdims=True)


# Shared init RNG, reseedable via the --seed CLI option so each layer in a
# prototype draws distinct values from one seeded stream (the reference
# seeds srand once in nnet-initialize.cc and every layer consumes it).
_RNG = np.random.default_rng(777)


def seed_init_rng(s: int) -> None:
    global _RNG
    _RNG = np.random.default_rng(s & 0x7FFFFFFF)


def _peek_marker(stream: BinaryIO, binary: bool) -> str:
    """Peek the next token, skipping pending whitespace first (text-format
    writes leave a '\\n' before option/end tokens; the reference's Read
    does `is >> std::ws` — nnet-component.cc:233).  Returns "" when the
    upcoming bytes are not a UTF-8 token (binary parameter data)."""
    try:
        return iof.peek_token(stream, binary)
    except UnicodeDecodeError:
        return ""


class Component:
    """Base: marker registry + wire framing (nnet-component.cc:210-267)."""

    MARKERS: tuple = ()          # first marker is the canonical write form
    UPDATABLE = False
    _REGISTRY: dict = {}

    def __init__(self, in_dim: int, out_dim: int):
        self.in_dim = int(in_dim)
        self.out_dim = int(out_dim)

    # -- registry ---------------------------------------------------------
    def __init_subclass__(cls, **kw):
        super().__init_subclass__(**kw)
        for m in cls.MARKERS:
            Component._REGISTRY[m.lower()] = cls

    @staticmethod
    def lookup(marker: str):
        cls = Component._REGISTRY.get(marker.lower())
        if cls is None:
            raise ValueError(f"Unknown nnet1 component marker {marker!r}")
        return cls

    # -- wire I/O ----------------------------------------------------------
    @staticmethod
    def read(stream: BinaryIO, binary: bool) -> Optional["Component"]:
        b = iof.peek_byte(stream)
        if not b:
            return None
        token = iof.read_token(stream, binary)
        if token == "<Nnet>":
            token = iof.read_token(stream, binary)
        if token == "</Nnet>" or token == "":
            return None
        out_dim = iof.read_int32(stream, binary)
        in_dim = iof.read_int32(stream, binary)
        comp = Component.lookup(token)(in_dim, out_dim)
        comp.read_data(stream, binary)
        # eat the separator if read_data left it
        if _peek_marker(stream, binary) == "<!EndOfComponent>":
            iof.expect_token(stream, binary, "<!EndOfComponent>")
        return comp

    def write(self, stream: BinaryIO, binary: bool) -> None:
        iof.write_token(stream, binary, self.MARKERS[0])
        iof.write_int32(stream, binary, self.out_dim)
        iof.write_int32(stream, binary, self.in_dim)
        if not binary:
            stream.write(b"\n")
        self.write_data(stream, binary)
        iof.write_token(stream, binary, "<!EndOfComponent>")
        if not binary:
            stream.write(b"\n")

    # -- per-type hooks ----------------------------------------------------
    def read_data(self, stream: BinaryIO, binary: bool) -> None:
        pass

    def write_data(self, stream: BinaryIO, binary: bool) -> None:
        pass

    def init_data(self, tokens: List[str]) -> None:
        if tokens:
            raise ValueError(f"{self.MARKERS[0]}: unexpected init tokens "
                             f"{tokens}")

    def propagate(self, x: np.ndarray) -> np.ndarray:
        raise NotImplementedError

    def backprop(self, x: np.ndarray, y: np.ndarray,
                 dy: np.ndarray) -> np.ndarray:
        raise NotImplementedError

    def update(self, x: np.ndarray, dy: np.ndarray, lr: float,
               momentum: float = 0.0, l2: float = 0.0) -> None:
        pass

    def num_params(self) -> int:
        return 0

    def info(self) -> str:
        return ""


def _read_opt_tokens(stream: BinaryIO, binary: bool, spec: dict) -> dict:
    """Read optional '<Token> value' pairs in arbitrary order until a
    non-'<' byte (the parameter data) appears; '<!EndOfComponent>' and
    unknown tokens stop the scan by raising."""
    out = {}
    while True:
        tok = _peek_marker(stream, binary)
        if not tok.startswith("<"):
            break
        if tok not in spec:
            break
        iof.expect_token(stream, binary, tok)
        kind = spec[tok]
        if kind == "float":
            out[tok] = iof.read_float(stream, binary)
        elif kind == "int":
            out[tok] = iof.read_int32(stream, binary)
        else:
            raise ValueError(kind)
    return out


def _parse_build_vector(tokens: List[str]) -> np.ndarray:
    """<BuildVector> 1:1:1000 1 2 3 1:10 </BuildVector> (nnet-various.h:65):
    colon specs are start[:step]:end inclusive."""
    vals: List[float] = []
    for t in tokens:
        if ":" in t:
            parts = [float(p) for p in t.split(":")]
            if len(parts) == 2:
                start, step, end = parts[0], 1.0, parts[1]
            else:
                start, step, end = parts
            v = start
            while (step > 0 and v <= end + 1e-9) or \
                  (step < 0 and v >= end - 1e-9):
                vals.append(v)
                v += step
        else:
            vals.append(float(t))
    return np.asarray(vals, np.float32)


def _init_vector_tokens(tokens: List[str]) -> Optional[np.ndarray]:
    """Handle <ReadVector> file / <BuildVector> ... </BuildVector>."""
    if not tokens:
        return None
    if tokens[0] == "<ReadVector>":
        from kaldi_tpu.util import kaldi_io
        return kaldi_io.read_kaldi_object(iof.read_vector, tokens[1])
    if tokens[0] == "<BuildVector>":
        end = tokens.index("</BuildVector>")
        return _parse_build_vector(tokens[1:end])
    return None


class AffineTransform(Component):
    """nnet-affine-transform.h:75-119."""
    MARKERS = ("<AffineTransform>",)
    UPDATABLE = True

    def __init__(self, in_dim, out_dim):
        super().__init__(in_dim, out_dim)
        self.linearity = np.zeros((out_dim, in_dim), np.float32)
        self.bias = np.zeros(out_dim, np.float32)
        self.learn_rate_coef = 1.0
        self.bias_learn_rate_coef = 1.0
        self.max_norm = 0.0
        self._mom_w = None
        self._mom_b = None

    def read_data(self, stream, binary):
        opts = _read_opt_tokens(stream, binary, {
            "<LearnRateCoef>": "float", "<BiasLearnRateCoef>": "float",
            "<MaxNorm>": "float"})
        self.learn_rate_coef = opts.get("<LearnRateCoef>", 1.0)
        self.bias_learn_rate_coef = opts.get("<BiasLearnRateCoef>", 1.0)
        self.max_norm = opts.get("<MaxNorm>", 0.0)
        self.linearity = iof.read_matrix(stream, binary)
        self.bias = iof.read_vector(stream, binary)

    def write_data(self, stream, binary):
        iof.write_token(stream, binary, "<LearnRateCoef>")
        iof.write_float(stream, binary, self.learn_rate_coef)
        iof.write_token(stream, binary, "<BiasLearnRateCoef>")
        iof.write_float(stream, binary, self.bias_learn_rate_coef)
        iof.write_token(stream, binary, "<MaxNorm>")
        iof.write_float(stream, binary, self.max_norm)
        if not binary:
            stream.write(b"\n")
        iof.write_matrix(stream, binary, self.linearity)
        iof.write_vector(stream, binary, self.bias)

    def init_data(self, tokens):
        param_stddev, bias_mean, bias_range = 0.1, -2.0, 2.0
        i = 0
        while i < len(tokens):
            t, v = tokens[i], tokens[i + 1]
            if t == "<ParamStddev>":
                param_stddev = float(v)
            elif t == "<BiasMean>":
                bias_mean = float(v)
            elif t == "<BiasRange>":
                bias_range = float(v)
            elif t == "<LearnRateCoef>":
                self.learn_rate_coef = float(v)
            elif t == "<BiasLearnRateCoef>":
                self.bias_learn_rate_coef = float(v)
            elif t == "<MaxNorm>":
                self.max_norm = float(v)
            else:
                raise ValueError(f"AffineTransform init: {t}")
            i += 2
        rng = _RNG
        self.linearity = (param_stddev * rng.standard_normal(
            (self.out_dim, self.in_dim))).astype(np.float32)
        self.bias = (bias_mean + bias_range *
                     (rng.random(self.out_dim) - 0.5)).astype(np.float32)

    def propagate(self, x):
        return x @ self.linearity.T + self.bias

    def backprop(self, x, y, dy):
        return dy @ self.linearity

    def update(self, x, dy, lr, momentum=0.0, l2=0.0):
        n = x.shape[0]
        gw = dy.T @ x
        gb = dy.sum(axis=0)
        if momentum != 0.0:
            self._mom_w = gw + (momentum * self._mom_w
                                if self._mom_w is not None else 0.0)
            self._mom_b = gb + (momentum * self._mom_b
                                if self._mom_b is not None else 0.0)
            gw, gb = self._mom_w, self._mom_b
        if l2 != 0.0:
            self.linearity *= 1.0 - lr * l2 * n
        self.linearity -= lr * self.learn_rate_coef * gw
        self.bias -= lr * self.bias_learn_rate_coef * gb
        if self.max_norm > 0.0:
            norms = np.linalg.norm(self.linearity, axis=1, keepdims=True)
            scale = np.minimum(1.0, self.max_norm / np.maximum(norms, 1e-20))
            self.linearity *= scale

    def num_params(self):
        return self.linearity.size + self.bias.size

    def info(self):
        return (f"linearity {self.linearity.shape}, "
                f"bias {self.bias.shape}")


class LinearTransform(Component):
    """nnet-linear-transform.h."""
    MARKERS = ("<LinearTransform>",)
    UPDATABLE = True

    def __init__(self, in_dim, out_dim):
        super().__init__(in_dim, out_dim)
        self.linearity = np.zeros((out_dim, in_dim), np.float32)
        self.learn_rate_coef = 1.0

    def read_data(self, stream, binary):
        opts = _read_opt_tokens(stream, binary, {"<LearnRateCoef>": "float"})
        self.learn_rate_coef = opts.get("<LearnRateCoef>", 1.0)
        self.linearity = iof.read_matrix(stream, binary)

    def write_data(self, stream, binary):
        iof.write_token(stream, binary, "<LearnRateCoef>")
        iof.write_float(stream, binary, self.learn_rate_coef)
        if not binary:
            stream.write(b"\n")
        iof.write_matrix(stream, binary, self.linearity)

    def init_data(self, tokens):
        i = 0
        param_stddev = 0.1
        while i < len(tokens):
            t = tokens[i]
            if t == "<ParamStddev>":
                param_stddev = float(tokens[i + 1])
                i += 2
            elif t == "<ReadMatrix>":
                from kaldi_tpu.util import kaldi_io
                self.linearity = kaldi_io.read_kaldi_object(
                    iof.read_matrix, tokens[i + 1])
                i += 2
            elif t == "<LearnRateCoef>":
                self.learn_rate_coef = float(tokens[i + 1])
                i += 2
            else:
                raise ValueError(f"LinearTransform init: {t}")
        if not self.linearity.any():
            rng = _RNG
            self.linearity = (param_stddev * rng.standard_normal(
                (self.out_dim, self.in_dim))).astype(np.float32)

    def propagate(self, x):
        return x @ self.linearity.T

    def backprop(self, x, y, dy):
        return dy @ self.linearity

    def update(self, x, dy, lr, momentum=0.0, l2=0.0):
        self.linearity -= lr * self.learn_rate_coef * (dy.T @ x)

    def num_params(self):
        return self.linearity.size


class Splice(Component):
    """nnet-various.h:89 — frame_offsets as int vector."""
    MARKERS = ("<Splice>",)

    def __init__(self, in_dim, out_dim):
        super().__init__(in_dim, out_dim)
        self.frame_offsets = np.zeros(0, np.int32)

    def read_data(self, stream, binary):
        self.frame_offsets = np.asarray(
            iof.read_int_vector(stream, binary), np.int32)

    def write_data(self, stream, binary):
        iof.write_int_vector(stream, binary, self.frame_offsets.tolist())

    def init_data(self, tokens):
        v = _init_vector_tokens(tokens)
        if v is None:
            raise ValueError("Splice init needs <ReadVector>/<BuildVector>")
        self.frame_offsets = v.astype(np.int32)

    def propagate(self, x):
        T = x.shape[0]
        cols = []
        for off in self.frame_offsets:
            idx = np.clip(np.arange(T) + int(off), 0, T - 1)
            cols.append(x[idx])
        return np.concatenate(cols, axis=1)

    def backprop(self, x, y, dy):
        T = x.shape[0]
        dx = np.zeros_like(x)
        for k, off in enumerate(self.frame_offsets):
            idx = np.clip(np.arange(T) + int(off), 0, T - 1)
            np.add.at(dx, idx,
                      dy[:, k * self.in_dim:(k + 1) * self.in_dim])
        return dx


class Copy(Component):
    """nnet-various.h:199 — 1-based indices on the wire."""
    MARKERS = ("<Copy>",)

    def __init__(self, in_dim, out_dim):
        super().__init__(in_dim, out_dim)
        self.indices = np.zeros(0, np.int32)   # 0-based in memory

    def read_data(self, stream, binary):
        self.indices = np.asarray(
            iof.read_int_vector(stream, binary), np.int32) - 1

    def write_data(self, stream, binary):
        iof.write_int_vector(stream, binary, (self.indices + 1).tolist())

    def init_data(self, tokens):
        v = _init_vector_tokens(tokens)
        if v is None:
            raise ValueError("Copy init needs <ReadVector>/<BuildVector>")
        self.indices = v.astype(np.int32) - 1

    def propagate(self, x):
        return x[:, self.indices]

    def backprop(self, x, y, dy):
        dx = np.zeros_like(x)
        np.add.at(dx.T, self.indices, dy.T)
        return dx


class Sigmoid(Component):
    MARKERS = ("<Sigmoid>",)

    def propagate(self, x):
        return 1.0 / (1.0 + np.exp(-x))

    def backprop(self, x, y, dy):
        return dy * y * (1.0 - y)


class Tanh(Component):
    MARKERS = ("<Tanh>",)

    def propagate(self, x):
        return np.tanh(x)

    def backprop(self, x, y, dy):
        return dy * (1.0 - y * y)


class Softmax(Component):
    MARKERS = ("<Softmax>",)

    def propagate(self, x):
        return _softmax(x)

    def backprop(self, x, y, dy):
        # the trainers feed (posterior - target) straight through
        # (nnet-activation.h: Softmax backprop copies the diff)
        return dy


class HiddenSoftmax(Softmax):
    MARKERS = ("<HiddenSoftmax>",)

    def backprop(self, x, y, dy):
        s = (dy * y).sum(axis=1, keepdims=True)
        return y * (dy - s)


class BlockSoftmax(Component):
    """nnet-activation.h:146 — int vector of block dims."""
    MARKERS = ("<BlockSoftmax>",)

    def __init__(self, in_dim, out_dim):
        super().__init__(in_dim, out_dim)
        self.block_dims = np.zeros(0, np.int32)

    def read_data(self, stream, binary):
        self.block_dims = np.asarray(
            iof.read_int_vector(stream, binary), np.int32)

    def write_data(self, stream, binary):
        iof.write_int_vector(stream, binary, self.block_dims.tolist())

    def init_data(self, tokens):
        v = _init_vector_tokens(tokens)
        if v is None:
            raise ValueError("BlockSoftmax init needs vector spec")
        self.block_dims = v.astype(np.int32)

    def propagate(self, x):
        out = np.empty_like(x)
        o = 0
        for d in self.block_dims:
            out[:, o:o + d] = _softmax(x[:, o:o + d])
            o += d
        return out

    def backprop(self, x, y, dy):
        # Zero blocks whose signed diff row-sum is 1.0 (no target in that
        # block, so diff == posterior); keep blocks summing to 0.  The
        # reference scales rows by (1 - row_sum) — nnet-activation.h
        # BlockSoftmax::BackpropagateFnc.
        out = dy.copy()
        o = 0
        for d in self.block_dims:
            blk = out[:, o:o + d]
            out[:, o:o + d] = blk * (1.0 - blk.sum(axis=1, keepdims=True))
            o += d
        return out


class ParametricRelu(Component):
    """nnet-parametric-relu.h:73-107."""
    MARKERS = ("<ParametricRelu>",)
    UPDATABLE = True

    def __init__(self, in_dim, out_dim):
        super().__init__(in_dim, out_dim)
        self.alpha = np.ones(out_dim, np.float32)
        self.beta = np.zeros(out_dim, np.float32)
        self.alpha_coef = 1.0
        self.beta_coef = 1.0

    def read_data(self, stream, binary):
        opts = _read_opt_tokens(stream, binary, {
            "<AlphaLearnRateCoef>": "float",
            "<BetaLearnRateCoef>": "float"})
        self.alpha_coef = opts.get("<AlphaLearnRateCoef>", 1.0)
        self.beta_coef = opts.get("<BetaLearnRateCoef>", 1.0)
        self.alpha = iof.read_vector(stream, binary)
        self.beta = iof.read_vector(stream, binary)

    def write_data(self, stream, binary):
        iof.write_token(stream, binary, "<AlphaLearnRateCoef>")
        iof.write_float(stream, binary, self.alpha_coef)
        iof.write_token(stream, binary, "<BetaLearnRateCoef>")
        iof.write_float(stream, binary, self.beta_coef)
        if not binary:
            stream.write(b"\n")
        iof.write_vector(stream, binary, self.alpha)
        iof.write_vector(stream, binary, self.beta)

    def propagate(self, x):
        return np.where(x >= 0, x * self.alpha, x * self.beta)

    def backprop(self, x, y, dy):
        return np.where(x >= 0, dy * self.alpha, dy * self.beta)

    def num_params(self):
        return self.alpha.size + self.beta.size


class Dropout(Component):
    MARKERS = ("<Dropout>",)

    def __init__(self, in_dim, out_dim):
        super().__init__(in_dim, out_dim)
        self.dropout_rate = 0.5

    def read_data(self, stream, binary):
        while True:
            tok = _peek_marker(stream, binary)
            if not tok.startswith("<") or tok == "<!EndOfComponent>":
                break
            if tok == "<DropoutRate>":
                iof.expect_token(stream, binary, tok)
                self.dropout_rate = iof.read_float(stream, binary)
            elif tok == "<DropoutRetention>":   # bwd compat
                iof.expect_token(stream, binary, tok)
                self.dropout_rate = 1.0 - iof.read_float(stream, binary)
            else:
                break

    def write_data(self, stream, binary):
        iof.write_token(stream, binary, "<DropoutRate>")
        iof.write_float(stream, binary, self.dropout_rate)

    def init_data(self, tokens):
        i = 0
        while i < len(tokens):
            if tokens[i] == "<DropoutRate>":
                self.dropout_rate = float(tokens[i + 1])
            i += 2

    def propagate(self, x):
        return x       # inference: identity (rate applied in training only)

    def backprop(self, x, y, dy):
        return dy


class LengthNorm(Component):
    MARKERS = ("<LengthNormComponent>",)

    def propagate(self, x):
        norm = np.sqrt((x * x).sum(axis=1, keepdims=True) / x.shape[1])
        return x / np.maximum(norm, 1e-20)

    def backprop(self, x, y, dy):
        return dy   # reference treats it as pass-through for the diff


class AddShift(Component):
    """nnet-various.h:321."""
    MARKERS = ("<AddShift>",)
    UPDATABLE = True

    def __init__(self, in_dim, out_dim):
        super().__init__(in_dim, out_dim)
        self.shift = np.zeros(out_dim, np.float32)
        self.learn_rate_coef = 0.0

    def read_data(self, stream, binary):
        opts = _read_opt_tokens(stream, binary, {"<LearnRateCoef>": "float"})
        self.learn_rate_coef = opts.get("<LearnRateCoef>", 0.0)
        self.shift = iof.read_vector(stream, binary)

    def write_data(self, stream, binary):
        iof.write_token(stream, binary, "<LearnRateCoef>")
        iof.write_float(stream, binary, self.learn_rate_coef)
        iof.write_vector(stream, binary, self.shift)

    def init_data(self, tokens):
        i = 0
        while i < len(tokens):
            if tokens[i] == "<InitParam>":
                self.shift = np.full(self.out_dim, float(tokens[i + 1]),
                                     np.float32)
                i += 2
            elif tokens[i] == "<LearnRateCoef>":
                self.learn_rate_coef = float(tokens[i + 1])
                i += 2
            else:
                v = _init_vector_tokens(tokens[i:])
                if v is not None:
                    self.shift = v.astype(np.float32)
                    break
                raise ValueError(f"AddShift init: {tokens[i]}")

    def propagate(self, x):
        return x + self.shift

    def backprop(self, x, y, dy):
        return dy

    def num_params(self):
        return self.shift.size


class Rescale(Component):
    """nnet-various.h (Rescale)."""
    MARKERS = ("<Rescale>",)
    UPDATABLE = True

    def __init__(self, in_dim, out_dim):
        super().__init__(in_dim, out_dim)
        self.scale = np.ones(out_dim, np.float32)
        self.learn_rate_coef = 0.0

    def read_data(self, stream, binary):
        opts = _read_opt_tokens(stream, binary, {"<LearnRateCoef>": "float"})
        self.learn_rate_coef = opts.get("<LearnRateCoef>", 0.0)
        self.scale = iof.read_vector(stream, binary)

    def write_data(self, stream, binary):
        iof.write_token(stream, binary, "<LearnRateCoef>")
        iof.write_float(stream, binary, self.learn_rate_coef)
        iof.write_vector(stream, binary, self.scale)

    def init_data(self, tokens):
        i = 0
        while i < len(tokens):
            if tokens[i] == "<InitParam>":
                self.scale = np.full(self.out_dim, float(tokens[i + 1]),
                                     np.float32)
                i += 2
            elif tokens[i] == "<LearnRateCoef>":
                self.learn_rate_coef = float(tokens[i + 1])
                i += 2
            else:
                v = _init_vector_tokens(tokens[i:])
                if v is not None:
                    self.scale = v.astype(np.float32)
                    break
                raise ValueError(f"Rescale init: {tokens[i]}")

    def propagate(self, x):
        return x * self.scale

    def backprop(self, x, y, dy):
        return dy * self.scale

    def num_params(self):
        return self.scale.size


class Rbm(Component):
    """nnet-rbm.h:182-215: vis/hid type tokens + W(out,in) + vis_bias(in)
    + hid_bias(out)."""
    MARKERS = ("<Rbm>",)

    def __init__(self, in_dim, out_dim):
        super().__init__(in_dim, out_dim)
        self.vis_type = "bern"
        self.hid_type = "bern"
        self.vis_hid = np.zeros((out_dim, in_dim), np.float32)
        self.vis_bias = np.zeros(in_dim, np.float32)
        self.hid_bias = np.zeros(out_dim, np.float32)

    def read_data(self, stream, binary):
        self.vis_type = iof.read_token(stream, binary)
        self.hid_type = iof.read_token(stream, binary)
        self.vis_hid = iof.read_matrix(stream, binary)
        self.vis_bias = iof.read_vector(stream, binary)
        self.hid_bias = iof.read_vector(stream, binary)

    def write_data(self, stream, binary):
        iof.write_token(stream, binary, self.vis_type)
        iof.write_token(stream, binary, self.hid_type)
        iof.write_matrix(stream, binary, self.vis_hid)
        iof.write_vector(stream, binary, self.vis_bias)
        iof.write_vector(stream, binary, self.hid_bias)

    def init_data(self, tokens):
        i = 0
        param_stddev = 0.1
        while i < len(tokens):
            t = tokens[i]
            if t == "<VisibleType>":
                self.vis_type = tokens[i + 1]
            elif t == "<HiddenType>":
                self.hid_type = tokens[i + 1]
            elif t == "<ParamStddev>":
                param_stddev = float(tokens[i + 1])
            else:
                raise ValueError(f"Rbm init: {t}")
            i += 2
        rng = _RNG
        self.vis_hid = (param_stddev * rng.standard_normal(
            (self.out_dim, self.in_dim))).astype(np.float32)

    def propagate(self, x):
        h = x @ self.vis_hid.T + self.hid_bias
        if self.hid_type == "bern":
            h = 1.0 / (1.0 + np.exp(-h))
        return h

    def reconstruct(self, h: np.ndarray) -> np.ndarray:
        v = h @ self.vis_hid + self.vis_bias
        if self.vis_type == "bern":
            v = 1.0 / (1.0 + np.exp(-v))
        return v

    def to_feedforward(self) -> "AffineTransform":
        """rbm-convert-to-nnet: W,b of the up-direction + Sigmoid."""
        aff = AffineTransform(self.in_dim, self.out_dim)
        aff.linearity = self.vis_hid.copy()
        aff.bias = self.hid_bias.copy()
        return aff

    def num_params(self):
        return self.vis_hid.size + self.vis_bias.size + self.hid_bias.size


class LstmProjected(Component):
    """nnet-lstm-projected.h:107-179: single-stream forward only (the
    trainers for recurrent nnet1 nets are out of scope; decode-side
    nnet-forward works)."""
    MARKERS = ("<LstmProjected>", "<LstmProjectedStreams>")

    def __init__(self, in_dim, out_dim):
        super().__init__(in_dim, out_dim)
        self.cell_dim = 0
        self.learn_rate_coef = 1.0
        self.bias_learn_rate_coef = 1.0
        self.cell_clip = 50.0
        self.diff_clip = 1.0
        self.cell_diff_clip = 0.0
        self.grad_clip = 250.0
        self.w_gifo_x = None
        self.w_gifo_r = None
        self.bias = None
        self.peephole_i_c = None
        self.peephole_f_c = None
        self.peephole_o_c = None
        self.w_r_m = None

    def read_data(self, stream, binary):
        while True:
            tok = _peek_marker(stream, binary)
            if not tok.startswith("<") or tok == "<!EndOfComponent>":
                break
            if tok in ("<CellDim>",):
                iof.expect_token(stream, binary, tok)
                self.cell_dim = iof.read_int32(stream, binary)
            elif tok in ("<CellClip>", "<CellDiffClip>", "<ClipGradient>",
                         "<LearnRateCoef>", "<BiasLearnRateCoef>",
                         "<DiffClip>", "<GradClip>"):
                iof.expect_token(stream, binary, tok)
                v = iof.read_float(stream, binary)
                attr = {"<CellClip>": "cell_clip",
                        "<CellDiffClip>": "cell_diff_clip",
                        "<ClipGradient>": "grad_clip",
                        "<LearnRateCoef>": "learn_rate_coef",
                        "<BiasLearnRateCoef>": "bias_learn_rate_coef",
                        "<DiffClip>": "diff_clip",
                        "<GradClip>": "grad_clip"}[tok]
                setattr(self, attr, v)
            else:
                break
        if self.cell_dim == 0:
            raise ValueError("LstmProjected: missing <CellDim>")
        self.w_gifo_x = iof.read_matrix(stream, binary)
        self.w_gifo_r = iof.read_matrix(stream, binary)
        self.bias = iof.read_vector(stream, binary)
        self.peephole_i_c = iof.read_vector(stream, binary)
        self.peephole_f_c = iof.read_vector(stream, binary)
        self.peephole_o_c = iof.read_vector(stream, binary)
        self.w_r_m = iof.read_matrix(stream, binary)

    def write_data(self, stream, binary):
        iof.write_token(stream, binary, "<CellDim>")
        iof.write_int32(stream, binary, self.cell_dim)
        iof.write_token(stream, binary, "<LearnRateCoef>")
        iof.write_float(stream, binary, self.learn_rate_coef)
        iof.write_token(stream, binary, "<BiasLearnRateCoef>")
        iof.write_float(stream, binary, self.bias_learn_rate_coef)
        iof.write_token(stream, binary, "<CellClip>")
        iof.write_float(stream, binary, self.cell_clip)
        iof.write_token(stream, binary, "<DiffClip>")
        iof.write_float(stream, binary, self.diff_clip)
        iof.write_token(stream, binary, "<CellDiffClip>")
        iof.write_float(stream, binary, self.cell_diff_clip)
        iof.write_token(stream, binary, "<GradClip>")
        iof.write_float(stream, binary, self.grad_clip)
        if not binary:
            stream.write(b"\n")
        iof.write_matrix(stream, binary, self.w_gifo_x)
        iof.write_matrix(stream, binary, self.w_gifo_r)
        iof.write_vector(stream, binary, self.bias)
        iof.write_vector(stream, binary, self.peephole_i_c)
        iof.write_vector(stream, binary, self.peephole_f_c)
        iof.write_vector(stream, binary, self.peephole_o_c)
        iof.write_matrix(stream, binary, self.w_r_m)

    def propagate(self, x):
        T = x.shape[0]
        c_dim, p_dim = self.cell_dim, self.out_dim
        sig = lambda v: 1.0 / (1.0 + np.exp(-v))
        r = np.zeros(p_dim, np.float32)
        c = np.zeros(c_dim, np.float32)
        out = np.zeros((T, p_dim), np.float32)
        pre_x = x @ self.w_gifo_x.T + self.bias
        for t in range(T):
            pre = pre_x[t] + r @ self.w_gifo_r.T
            g = np.tanh(pre[:c_dim])
            i = sig(pre[c_dim:2 * c_dim] + self.peephole_i_c * c)
            f = sig(pre[2 * c_dim:3 * c_dim] + self.peephole_f_c * c)
            c = f * c + i * g
            if self.cell_clip > 0:
                c = np.clip(c, -self.cell_clip, self.cell_clip)
            o = sig(pre[3 * c_dim:] + self.peephole_o_c * c)
            m = o * np.tanh(c)
            r = m @ self.w_r_m.T
            out[t] = r
        return out

    def num_params(self):
        return sum(a.size for a in (
            self.w_gifo_x, self.w_gifo_r, self.bias, self.peephole_i_c,
            self.peephole_f_c, self.peephole_o_c, self.w_r_m))


class Nnet:
    """nnet-nnet.{h,cc}: an ordered component stack."""

    def __init__(self, components: Optional[List[Component]] = None):
        self.components: List[Component] = components or []

    # -- dims ---------------------------------------------------------------
    @property
    def input_dim(self) -> int:
        return self.components[0].in_dim if self.components else 0

    @property
    def output_dim(self) -> int:
        return self.components[-1].out_dim if self.components else 0

    def num_params(self) -> int:
        return sum(c.num_params() for c in self.components)

    # -- I/O ------------------------------------------------------------------
    @staticmethod
    def read(stream: BinaryIO, binary: bool) -> "Nnet":
        net = Nnet()
        while True:
            comp = Component.read(stream, binary)
            if comp is None:
                break
            net.components.append(comp)
        return net

    def write(self, stream: BinaryIO, binary: bool) -> None:
        iof.write_token(stream, binary, "<Nnet>")
        if not binary:
            stream.write(b"\n")
        for c in self.components:
            c.write(stream, binary)
        iof.write_token(stream, binary, "</Nnet>")
        if not binary:
            stream.write(b"\n")

    # -- compute ---------------------------------------------------------------
    def propagate(self, x: np.ndarray,
                  keep: bool = False):
        """Forward; with keep=True also returns per-layer inputs."""
        acts = [np.asarray(x, np.float32)]
        for c in self.components:
            acts.append(c.propagate(acts[-1]))
        return (acts[-1], acts) if keep else acts[-1]

    def backprop_update(self, acts: List[np.ndarray], dy: np.ndarray,
                        lr: float, momentum: float = 0.0,
                        l2: float = 0.0) -> None:
        for k in range(len(self.components) - 1, -1, -1):
            c = self.components[k]
            x, y = acts[k], acts[k + 1]
            dx = c.backprop(x, y, dy)
            if c.UPDATABLE:
                c.update(x, dy, lr, momentum=momentum, l2=l2)
            dy = dx

    def info(self) -> str:
        lines = [f"num-components {len(self.components)}",
                 f"input-dim {self.input_dim}",
                 f"output-dim {self.output_dim}",
                 f"number-of-parameters {self.num_params() / 1e6:.4f} "
                 "millions"]
        for i, c in enumerate(self.components):
            extra = c.info()
            lines.append(f"component {i + 1} : {c.MARKERS[0]}, "
                         f"input-dim {c.in_dim}, output-dim {c.out_dim}"
                         + (f", {extra}" if extra else ""))
        return "\n".join(lines)


def component_from_proto_line(line: str) -> Component:
    """Component::Init (nnet-component.cc:203): marker <InputDim> n
    <OutputDim> m [init tokens...]."""
    toks = line.split()
    marker = toks[0]
    if toks[1] != "<InputDim>" or toks[3] != "<OutputDim>":
        raise ValueError(f"bad proto line: {line}")
    in_dim, out_dim = int(toks[2]), int(toks[4])
    comp = Component.lookup(marker)(in_dim, out_dim)
    comp.init_data(toks[5:])
    return comp


def nnet_from_proto(text: str) -> Nnet:
    """nnet-initialize.cc: prototype file -> randomly initialized Nnet."""
    net = Nnet()
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        if line in ("<NnetProto>", "</NnetProto>"):
            continue
        net.components.append(component_from_proto_line(line))
    return net
