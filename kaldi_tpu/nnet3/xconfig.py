"""xconfig model DSL importer (parity: steps/libs/nnet3/xconfig/
basic_layers.py:20 and friends — the layer language used by every
modern reference recipe).

Supported layer types (the set used by the librispeech/swbd chain
recipes): input, fixed-affine-layer (learned here), relu-batchnorm-
layer, batchnorm-component, no-op-component, linear-component,
tdnnf-layer, lstm-layer/lstmp-layer (fast variants included),
conv-relu-batchnorm-layer (CNN front-ends), gru-layer,
attention-relu-renorm-layer, stats-layer, prefinal-layer,
output-layer.

Descriptors supported in input=: bare names, Append(...), Offset(x,k),
ReplaceIndex(x, t, 0), Sum(a, b), Scale(s, x). Offsets are realized as
time shifts with edge replication — the explicit-slicing equivalent of
the reference's Descriptor machinery (nnet-descriptor.h:95).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field as dfield
from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from kaldi_tpu.base.logging import KaldiTpuError, warn
from kaldi_tpu.nnet3.components import (BatchNorm, GruLayer, LstmpLayer,
                                        Prefinal, RestrictedAttention,
                                        StatisticsPooling, TdnnfLayer)


# ---------------------------------------------------------------------------
# parsing

@dataclass
class XLayer:
    layer_type: str
    name: str
    opts: Dict[str, str]

    def get(self, key, default=None):
        return self.opts.get(key, default)

    def get_int(self, key, default=None):
        v = self.opts.get(key)
        return int(v) if v is not None else default

    def get_float(self, key, default=None):
        v = self.opts.get(key)
        return float(v) if v is not None else default


def parse_xconfig(text: str,
                  substitutions: Optional[Dict[str, str]] = None) -> List[XLayer]:
    layers = []
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        if substitutions:
            for k, v in substitutions.items():
                line = line.replace(f"${k}", str(v))
        parts = _split_opts(line)
        ltype = parts[0]
        opts: Dict[str, str] = {}
        for p in parts[1:]:
            if "=" not in p:
                raise KaldiTpuError(f"bad xconfig option {p!r} in: {raw}")
            k, v = p.split("=", 1)
            opts[k] = v
        name = opts.get("name")
        if name is None:
            raise KaldiTpuError(f"xconfig line missing name=: {raw}")
        layers.append(XLayer(ltype, name, opts))
    return layers


def _split_opts(line: str) -> List[str]:
    """Split on spaces not inside parentheses (Append(-1,0,1) stays whole)."""
    out, depth, cur = [], 0, []
    for ch in line:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == " " and depth == 0:
            if cur:
                out.append("".join(cur))
                cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur))
    return out


# ---------------------------------------------------------------------------
# descriptor evaluation

def _shift(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Time-shift with edge replication: output[t] = input[t+k]."""
    if k == 0:
        return x
    if k > 0:
        return jnp.concatenate([x[:, k:], jnp.repeat(x[:, -1:], k, axis=1)],
                               axis=1)
    k = -k
    return jnp.concatenate([jnp.repeat(x[:, :1], k, axis=1), x[:, :-k]],
                           axis=1)


def _eval_descriptor(desc: str, tensors: Dict[str, jnp.ndarray],
                     default: str) -> jnp.ndarray:
    desc = desc.strip()
    if not desc:
        desc = default
    return _eval_expr(desc, tensors)


def _split_args(s: str) -> List[str]:
    out, depth, cur = [], 0, []
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur).strip())
    return out


def _eval_expr(expr: str, tensors: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    expr = expr.strip()
    m = re.match(r"^(\w[\w-]*)\((.*)\)$", expr, re.S)
    if not m:
        # plain name, possibly with @offset ("tdnn1@-3")
        if "@" in expr:
            name, off = expr.split("@")
            return _shift(tensors[name], int(off))
        if expr not in tensors:
            raise KaldiTpuError(f"unknown descriptor input {expr!r}")
        return tensors[expr]
    func, argstr = m.group(1), m.group(2)
    args = _split_args(argstr)
    if func == "Append":
        parts = []
        for a in args:
            if re.fullmatch(r"-?\d+", a):
                parts.append(_shift(tensors["__prev__"], int(a)))
            else:
                parts.append(_eval_expr(a, tensors))
        return jnp.concatenate(parts, axis=-1)
    if func == "Offset":
        x = _eval_expr(args[0], tensors)
        return _shift(x, int(args[1]))
    if func == "ReplaceIndex":
        # ReplaceIndex(ivector, t, 0): constant-over-time input
        x = _eval_expr(args[0], tensors)
        return x
    if func == "Sum":
        acc = _eval_expr(args[0], tensors)
        for a in args[1:]:
            acc = acc + _eval_expr(a, tensors)
        return acc
    if func == "Scale":
        return float(args[0]) * _eval_expr(args[1], tensors)
    if func == "IfDefined":
        try:
            return _eval_expr(args[0], tensors)
        except KaldiTpuError:
            return jnp.zeros_like(tensors["__prev__"])
    raise KaldiTpuError(f"unsupported descriptor function {func!r}")


# ---------------------------------------------------------------------------
# model

class XconfigModel(nn.Module):
    """Sequential evaluation of parsed xconfig layers. Inputs are given
    as a dict name->(B, T, dim) ((B, dim) inputs are broadcast over
    time, e.g. ivectors). Returns dict of output-layer results."""
    layers: Tuple
    train: bool = True

    @nn.compact
    def __call__(self, inputs: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        tensors: Dict[str, jnp.ndarray] = {}
        T = max(v.shape[1] for v in inputs.values() if v.ndim == 3)
        for k, v in inputs.items():
            if v.ndim == 2:
                v = jnp.repeat(v[:, None, :], T, axis=1)
            tensors[k] = v
        outputs: Dict[str, jnp.ndarray] = {}
        prev_name = None
        for layer in self.layers:
            lt, name = layer.layer_type, layer.name
            if prev_name is not None:
                tensors["__prev__"] = tensors[prev_name]
            if lt == "input":
                if name not in tensors:
                    raise KaldiTpuError(f"missing input {name}")
                prev_name = name
                continue
            x = _eval_descriptor(layer.get("input", ""), tensors,
                                 default=prev_name)
            if lt in ("relu-batchnorm-layer", "relu-batchnorm-dropout-layer",
                      "relu-renorm-layer"):
                dim = layer.get_int("dim")
                x = nn.Dense(dim, name=f"{name}_affine")(x)
                x = nn.relu(x)
                x = BatchNorm(use_running_average=not self.train,
                              name=f"{name}_bn")(x)
            elif lt in ("fixed-affine-layer", "affine-layer"):
                dim = layer.get_int("dim", x.shape[-1])
                x = nn.Dense(dim, name=f"{name}_affine")(x)
            elif lt == "linear-component":
                dim = layer.get_int("dim")
                x = nn.Dense(dim, use_bias=False, name=f"{name}_linear")(x)
            elif lt == "batchnorm-component":
                x = BatchNorm(use_running_average=not self.train,
                              name=f"{name}_bn")(x)
            elif lt in ("no-op-component",):
                pass
            elif lt == "tdnnf-layer":
                x = TdnnfLayer(dim=layer.get_int("dim"),
                               bottleneck_dim=layer.get_int("bottleneck-dim"),
                               time_stride=layer.get_int("time-stride", 1),
                               bypass_scale=layer.get_float("bypass-scale",
                                                            0.66),
                               subsample=layer.get_int("subsample", 1),
                               train=self.train, name=name)(x)
            elif lt in ("lstm-layer", "lstmp-layer", "fast-lstm-layer",
                        "fast-lstmp-layer"):
                cell = layer.get_int("cell-dim")
                rec = layer.get_int("recurrent-projection-dim",
                                    max(cell // 4, 1))
                nonrec = layer.get_int("non-recurrent-projection-dim", rec)
                x, _ = LstmpLayer(cell_dim=cell, recurrent_dim=rec,
                                  nonrecurrent_dim=nonrec, name=name)(x)
            elif lt in ("conv-relu-batchnorm-layer", "cnn-layer"):
                # 2D convolution over (time, height): the feature dim is
                # height-in x channels-in (nnet-convolutional-component's
                # ConvolutionComponent, CNN-TDNN family)
                hin = layer.get_int("height-in", x.shape[-1])
                cin = x.shape[-1] // hin
                nf = layer.get_int("num-filters-out")
                tk = layer.get_int("time-kernel", 3)
                hk = layer.get_int("height-kernel", 3)
                hsub = layer.get_int("height-subsample-out", 1)
                B, T = x.shape[0], x.shape[1]
                x4 = x.reshape(B, T, hin, cin)
                y = nn.Conv(nf, (tk, hk), strides=(1, hsub),
                            padding="SAME", name=f"{name}_conv")(x4)
                y = nn.relu(y)
                hout = y.shape[2]
                x = y.reshape(B, T, hout * nf)
                x = BatchNorm(use_running_average=not self.train,
                              name=f"{name}_bn")(x)
            elif lt == "gru-layer":
                x, _ = GruLayer(
                    cell_dim=layer.get_int("cell-dim"),
                    projection_dim=layer.get_int(
                        "recurrent-projection-dim",
                        max(layer.get_int("cell-dim") // 4, 1)),
                    name=name)(x)
            elif lt in ("attention-relu-renorm-layer", "attention-layer"):
                x = RestrictedAttention(
                    num_heads=layer.get_int("num-heads", 4),
                    key_dim=layer.get_int("key-dim", 40),
                    value_dim=layer.get_int("value-dim", 40),
                    num_left_inputs=layer.get_int("num-left-inputs", 5),
                    num_right_inputs=layer.get_int("num-right-inputs", 2),
                    time_stride=layer.get_int("time-stride", 1),
                    name=name)(x)
                x = nn.relu(x)
                x = BatchNorm(use_running_average=not self.train,
                              name=f"{name}_bn")(x)
            elif lt == "stats-layer":
                pooled = StatisticsPooling(name=name)(x)
                x = jnp.repeat(pooled[:, None, :], x.shape[1], axis=1)
            elif lt == "prefinal-layer":
                x = Prefinal(layer.get_int("big-dim", 1024),
                             layer.get_int("small-dim", 192),
                             train=self.train, name=name)(x)
            elif lt == "output-layer":
                dim = layer.get_int("dim")
                y = nn.Dense(dim, name=f"{name}_affine")(x)
                if layer.get("include-log-softmax", "true") == "true":
                    y = jax.nn.log_softmax(y, axis=-1)
                outputs[name] = y
                tensors[name] = y
                prev_name = name
                continue
            else:
                raise KaldiTpuError(f"unsupported xconfig layer type {lt!r}")
            tensors[name] = x
            prev_name = name
        return outputs


def build_xconfig_model(text: str,
                        substitutions: Optional[Dict[str, str]] = None,
                        train: bool = True) -> XconfigModel:
    return XconfigModel(tuple(parse_xconfig(text, substitutions)),
                        train=train)
