"""nnet2 model import/export + inference (THIN coverage of the legacy
p-norm stack for recipe archaeology — VERDICT r4 missing #6).

Wire format: nnet2/nnet-nnet.cc:160 Nnet::Write (<Nnet> <NumComponents>
<Components> comp... </Components> </Nnet>), am-nnet.cc:31 AmNnet::Write
(nnet then priors vector, no header), component field layouts from
nnet2/nnet-component.cc (NonlinearComponent:390, AffineComponent:1232,
AffineComponentPreconditionedOnline:1773, PnormComponent:547,
SpliceComponent:2796, FixedAffineComponent:3322, SumGroupComponent:2434).

Inference reproduces NnetComputation (nnet2/nnet-compute.cc): splice
layers consume context (the input is optionally edge-padded by the
model's total left/right context, pad_input=true of nnet-am-compute);
everything else is row-wise.  Training the nnet2 stack is deliberately
out of scope — capability-once lives in nnet3 (SURVEY §2.10)."""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from kaldi_tpu.base import io_funcs as iof
from kaldi_tpu.base.logging import KaldiTpuError, log

# reuse the token-driven field machinery (the two generations share
# the <Token> value conventions)
from kaldi_tpu.nnet3.mdl_io import _TOKEN_KINDS, _read_fields

_TOKEN_KINDS.setdefault("<ValueSum>", "vector")
_TOKEN_KINDS.setdefault("<DerivSum>", "vector")
_TOKEN_KINDS.setdefault("<P>", "float")
_TOKEN_KINDS.setdefault("<ConstComponentDim>", "int")
_TOKEN_KINDS.setdefault("<MaxChangePerSample>", "float")
_TOKEN_KINDS.setdefault("<MaxChange>", "float")

KNORM_FLOOR = 2.0 ** -66


class Nnet2Component:
    TYPE = "Component"
    WRITE_ORDER: Sequence[str] = ()

    def __init__(self, **fields):
        self.fields = fields

    @classmethod
    def read(cls, stream, binary):
        return cls(**_read_fields(stream, binary, f"</{cls.TYPE}>"))

    def write(self, stream, binary):
        iof.write_token(stream, binary, f"<{self.TYPE}>")
        for key in self.WRITE_ORDER:
            if key not in self.fields:
                continue
            val = self.fields[key]
            tok = f"<{key}>"
            kind = _TOKEN_KINDS[tok]
            iof.write_token(stream, binary, tok)
            if kind == "float":
                iof.write_float(stream, binary, float(val))
            elif kind == "double":
                iof.write_double(stream, binary, float(val))
            elif kind == "int":
                iof.write_int32(stream, binary, int(val))
            elif kind == "bool":
                iof.write_bool(stream, binary, bool(val))
            elif kind == "ints":
                iof.write_int_vector(stream, binary, list(val))
            elif kind == "vector":
                iof.write_vector(stream, binary,
                                 np.asarray(val, np.float32))
            elif kind == "matrix":
                iof.write_matrix(stream, binary,
                                 np.asarray(val, np.float32))
        iof.write_token(stream, binary, f"</{self.TYPE}>")

    # context consumed by this component (splice only)
    def left_context(self) -> int:
        return 0

    def right_context(self) -> int:
        return 0

    def forward(self, x: np.ndarray) -> np.ndarray:
        raise NotImplementedError(self.TYPE)

    def output_dim(self, input_dim: int) -> int:
        return input_dim


class SpliceComponent(Nnet2Component):
    TYPE = "SpliceComponent"
    WRITE_ORDER = ("InputDim", "Context", "ConstComponentDim")

    def left_context(self):
        return -min(self.fields["Context"])

    def right_context(self):
        return max(self.fields["Context"])

    def output_dim(self, input_dim):
        c = int(self.fields.get("ConstComponentDim", 0))
        var = int(self.fields["InputDim"]) - c
        return var * len(self.fields["Context"]) + c

    def forward(self, x):
        ctx = list(self.fields["Context"])
        c = int(self.fields.get("ConstComponentDim", 0))
        D = x.shape[1]
        var = D - c
        T_out = x.shape[0] - (max(ctx) - min(ctx))
        if T_out <= 0:
            raise KaldiTpuError("splice: not enough context rows")
        parts = [x[o - min(ctx):o - min(ctx) + T_out, :var]
                 for o in ctx]
        if c:
            # const part rides along from the central (offset-0) frame
            parts.append(x[-min(ctx):-min(ctx) + T_out, var:])
        return np.concatenate(parts, axis=1)


class _Affine(Nnet2Component):
    def output_dim(self, input_dim):
        return self.fields["LinearParams"].shape[0]

    def forward(self, x):
        W = np.asarray(self.fields["LinearParams"], np.float32)
        b = np.asarray(self.fields["BiasParams"], np.float32)
        return x @ W.T + b


class AffineComponent(_Affine):
    TYPE = "AffineComponent"
    WRITE_ORDER = ("LearningRate", "LinearParams", "BiasParams",
                   "IsGradient")


class AffineComponentPreconditioned(_Affine):
    TYPE = "AffineComponentPreconditioned"
    WRITE_ORDER = ("LearningRate", "LinearParams", "BiasParams",
                   "Alpha", "MaxChange")


class AffineComponentPreconditionedOnline(_Affine):
    TYPE = "AffineComponentPreconditionedOnline"
    WRITE_ORDER = ("LearningRate", "LinearParams", "BiasParams",
                   "RankIn", "RankOut", "UpdatePeriod",
                   "NumSamplesHistory", "Alpha", "MaxChangePerSample")


class FixedAffineComponent(_Affine):
    TYPE = "FixedAffineComponent"
    WRITE_ORDER = ("LinearParams", "BiasParams")


class FixedLinearComponent(Nnet2Component):
    TYPE = "FixedLinearComponent"
    WRITE_ORDER = ("CuMatrix",)

    def output_dim(self, input_dim):
        return self.fields["CuMatrix"].shape[0]

    def forward(self, x):
        return x @ np.asarray(self.fields["CuMatrix"], np.float32).T


class FixedScaleComponent(Nnet2Component):
    TYPE = "FixedScaleComponent"
    WRITE_ORDER = ("Scales",)

    def forward(self, x):
        return x * np.asarray(self.fields["Scales"], np.float32)


class FixedBiasComponent(Nnet2Component):
    TYPE = "FixedBiasComponent"
    WRITE_ORDER = ("Bias",)

    def forward(self, x):
        return x + np.asarray(self.fields["Bias"], np.float32)


class _Nonlinear(Nnet2Component):
    WRITE_ORDER = ("Dim", "ValueSum", "DerivSum", "Count")

    @classmethod
    def read(cls, stream, binary):
        self = cls(**_read_fields(stream, binary, f"</{cls.TYPE}>"))
        self.fields.setdefault("ValueSum", np.zeros(0, np.float32))
        self.fields.setdefault("DerivSum", np.zeros(0, np.float32))
        self.fields.setdefault("Count", 0.0)
        return self


class TanhComponent(_Nonlinear):
    TYPE = "TanhComponent"

    def forward(self, x):
        return np.tanh(x)


class SigmoidComponent(_Nonlinear):
    TYPE = "SigmoidComponent"

    def forward(self, x):
        return 1.0 / (1.0 + np.exp(-x))


class RectifiedLinearComponent(_Nonlinear):
    TYPE = "RectifiedLinearComponent"

    def forward(self, x):
        return np.maximum(x, 0.0)


class SoftmaxComponent(_Nonlinear):
    TYPE = "SoftmaxComponent"

    def forward(self, x):
        m = x.max(axis=1, keepdims=True)
        e = np.exp(x - m)
        return e / e.sum(axis=1, keepdims=True)


class LogSoftmaxComponent(_Nonlinear):
    TYPE = "LogSoftmaxComponent"

    def forward(self, x):
        m = x.max(axis=1, keepdims=True)
        return x - m - np.log(np.exp(x - m).sum(axis=1, keepdims=True))


class NormalizeComponent(_Nonlinear):
    TYPE = "NormalizeComponent"

    def forward(self, x):
        p = np.maximum((x * x).mean(axis=1, keepdims=True), KNORM_FLOOR)
        return x / np.sqrt(p)


class PnormComponent(Nnet2Component):
    TYPE = "PnormComponent"
    WRITE_ORDER = ("InputDim", "OutputDim", "P")

    def output_dim(self, input_dim):
        return int(self.fields["OutputDim"])

    def forward(self, x):
        din, dout = int(self.fields["InputDim"]), \
            int(self.fields["OutputDim"])
        p = float(self.fields["P"])
        g = x.reshape(x.shape[0], dout, din // dout)
        return (np.abs(g) ** p).sum(axis=2) ** (1.0 / p)


class DropoutComponent(Nnet2Component):
    TYPE = "DropoutComponent"
    WRITE_ORDER = ("Dim", "DropoutProportion")

    def forward(self, x):            # test mode: identity scaling
        return x


class SumGroupComponent(Nnet2Component):
    TYPE = "SumGroupComponent"
    WRITE_ORDER = ("Sizes",)

    def output_dim(self, input_dim):
        return len(self.fields["Sizes"])

    def forward(self, x):
        sizes = list(self.fields["Sizes"])
        off = np.concatenate([[0], np.cumsum(sizes)])
        return np.stack([x[:, off[i]:off[i + 1]].sum(axis=1)
                         for i in range(len(sizes))], axis=1)


_COMPONENTS = {c.TYPE: c for c in (
    SpliceComponent, AffineComponent, AffineComponentPreconditioned,
    AffineComponentPreconditionedOnline, FixedAffineComponent,
    FixedLinearComponent, FixedScaleComponent, FixedBiasComponent,
    TanhComponent, SigmoidComponent, RectifiedLinearComponent,
    SoftmaxComponent, LogSoftmaxComponent, NormalizeComponent,
    PnormComponent, DropoutComponent, SumGroupComponent)}


class Nnet2:
    """A raw nnet2 net: ordered component list."""

    def __init__(self, components: Optional[List[Nnet2Component]] = None):
        self.components = components or []

    @classmethod
    def read(cls, stream, binary) -> "Nnet2":
        iof.expect_token(stream, binary, "<Nnet>")
        iof.expect_token(stream, binary, "<NumComponents>")
        n = iof.read_int32(stream, binary)
        iof.expect_token(stream, binary, "<Components>")
        comps = []
        for _ in range(n):
            tok = iof.read_token(stream, binary)
            t = tok[1:-1]
            if t not in _COMPONENTS:
                raise KaldiTpuError(f"nnet2 import: component {t} not "
                                    f"supported (extend nnet2/model.py)")
            comps.append(_COMPONENTS[t].read(stream, binary))
        iof.expect_token(stream, binary, "</Components>")
        iof.expect_token(stream, binary, "</Nnet>")
        return cls(comps)

    def write(self, stream, binary) -> None:
        iof.write_token(stream, binary, "<Nnet>")
        iof.write_token(stream, binary, "<NumComponents>")
        iof.write_int32(stream, binary, len(self.components))
        iof.write_token(stream, binary, "<Components>")
        for c in self.components:
            c.write(stream, binary)
            if not binary:
                stream.write(b"\n")
        iof.write_token(stream, binary, "</Components>")
        iof.write_token(stream, binary, "</Nnet>")

    def left_context(self) -> int:
        return sum(c.left_context() for c in self.components)

    def right_context(self) -> int:
        return sum(c.right_context() for c in self.components)

    def input_dim(self) -> int:
        for c in self.components:
            if "InputDim" in c.fields:
                return int(c.fields["InputDim"])
            if "LinearParams" in c.fields:
                return c.fields["LinearParams"].shape[1]
            if "Dim" in c.fields:
                return int(c.fields["Dim"])
        raise KaldiTpuError("nnet2: cannot infer input dim")

    def output_dim(self) -> int:
        d = self.input_dim()
        for c in self.components:
            d = c.output_dim(d)
        return d

    def forward(self, feats: np.ndarray,
                pad_input: bool = True) -> np.ndarray:
        """NnetComputation (nnet2/nnet-compute.cc): with pad_input the
        features are edge-replicated by the net's left/right context so
        output rows == input rows."""
        x = np.asarray(feats, np.float32)
        if pad_input:
            lc, rc = self.left_context(), self.right_context()
            if lc or rc:
                x = np.concatenate(
                    [np.repeat(x[:1], lc, axis=0), x,
                     np.repeat(x[-1:], rc, axis=0)])
        for c in self.components:
            x = c.forward(x)
        return x

    def info(self) -> str:
        lines = [f"num-components {len(self.components)}",
                 f"left-context {self.left_context()}",
                 f"right-context {self.right_context()}",
                 f"input-dim {self.input_dim()}",
                 f"output-dim {self.output_dim()}"]
        for i, c in enumerate(self.components):
            extras = []
            for k in ("InputDim", "OutputDim", "Dim", "P", "Context"):
                if k in c.fields:
                    extras.append(f"{k.lower()}={c.fields[k]}")
            if "LinearParams" in c.fields:
                W = c.fields["LinearParams"]
                extras.append(f"input-dim={W.shape[1]}, "
                              f"output-dim={W.shape[0]}")
            lines.append(f"component {i} : {c.TYPE}, "
                         + ", ".join(str(e) for e in extras))
        return "\n".join(lines)


class AmNnet2:
    """nnet2 acoustic model: raw net + pdf priors (am-nnet.h)."""

    def __init__(self, nnet: Nnet2, priors: Optional[np.ndarray] = None):
        self.nnet = nnet
        self.priors = (np.zeros(0, np.float32) if priors is None
                       else np.asarray(priors, np.float32))

    @classmethod
    def read(cls, stream, binary) -> "AmNnet2":
        nnet = Nnet2.read(stream, binary)
        priors = iof.read_vector(stream, binary)
        return cls(nnet, priors)

    def write(self, stream, binary) -> None:
        self.nnet.write(stream, binary)
        iof.write_vector(stream, binary, self.priors)


# -- file-level helpers (the .mdl carries a TransitionModel first) ----

def read_raw_nnet2(path: str) -> Nnet2:
    from kaldi_tpu.util import kaldi_io
    return kaldi_io.read_kaldi_object(Nnet2.read, path)


def write_raw_nnet2(nnet: Nnet2, path: str, binary: bool = True) -> None:
    from kaldi_tpu.util import kaldi_io
    kaldi_io.write_kaldi_object(nnet.write, path, binary)


def read_nnet2_am(path: str):
    """-> (TransitionModel, AmNnet2)."""
    from kaldi_tpu.hmm.transition_model import TransitionModel
    from kaldi_tpu.util import kaldi_io

    def rd(stream, binary):
        tm = TransitionModel.read(stream, binary)
        return tm, AmNnet2.read(stream, binary)

    return kaldi_io.read_kaldi_object(rd, path)


def write_nnet2_am(path: str, tm, am: AmNnet2,
                   binary: bool = True) -> None:
    from kaldi_tpu.util import kaldi_io

    def wr(stream, b):
        tm.write(stream, b)
        am.write(stream, b)

    kaldi_io.write_kaldi_object(wr, path, binary)
