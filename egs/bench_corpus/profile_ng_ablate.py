#!/usr/bin/env python
"""In-scan cost attribution for NgramLexDecoder._make_step: compiles
the REAL forward scan with individual blocks stubbed out (shapes and
dtypes preserved) and reports the delta vs the full step.  Throwaway
profiling tool; the authoritative step lives in decoder/lexchain_ng.py.

Run ALONE on the real chip: python egs/bench_corpus/profile_ng_ablate.py
"""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, REPO)
ART = os.path.join(REPO, "egs", "bench_corpus")

BIG = 1e10
INF = np.float32(3.0e38) / 4


def make_step_ablate(dec, B, K, beam, ablate):
    """Copy of NgramLexDecoder._make_step forward with block toggles:
    ablate is a set of {'slotfold','foldtree','topk','entscatter',
    'rows','roots','sil','packbits'}."""
    import jax
    import jax.numpy as jnp
    g = dec.g
    lm = g.lm
    V, SP, U, Nr, S = g.V, lm.SP, g.U, g.Nr, g.S
    c = dec._c
    use_sil = g.use_sil
    D = dec.VC_D
    K = int(min(K, dec.VC))
    vc_src, vc_dst, vc_cost = dec._vc_src, dec._vc_dst, dec._vc_cost
    NB = Nr // 8
    UB = -(-(U + 1) // 8)
    UB = (UB + 0)
    UB = ((U + 1 + 7) // 8)
    fold_perm = dec._fold_perm
    fold_levels = dec._fold_levels
    fold_fin = dec._fold_fin
    SOFF = jnp.int32(0x40000000)
    SBIG = jnp.int32(0x7F000000)
    SBIG_F = jax.lax.bitcast_convert_type(SBIG, jnp.float32)
    from kaldi_tpu.decoder.lexchain_ng import _round_up
    UB = _round_up(U + 1, 8) // 8

    def pack_bits(dec_, npad):
        if "packbits" in ablate:
            return jnp.zeros((npad, B), jnp.uint8)
        d = jnp.pad(dec_.astype(jnp.uint8),
                    ((0, npad * 8 - dec_.shape[0]), (0, 0)))
        d3 = d.reshape(npad, 8, B)
        w8 = (jnp.uint8(1) << jax.lax.broadcasted_iota(
            jnp.uint8, (1, 8, 1), 1))
        return (d3 * w8).sum(axis=1, dtype=jnp.uint8)

    def frame(carry, x):
        cost, roots, sil = carry
        am_t, act = x
        lane = jnp.arange(B)
        radj = roots + c["nosil"]
        if use_sil:
            rmin = jnp.minimum(radj, sil)
            pick_sil = sil < radj
        else:
            rmin = radj
            pick_sil = jnp.zeros_like(radj, bool)
        slot_iota = jnp.arange(U + 1, dtype=jnp.int32)[:, None]
        enc_iota = slot_iota * 2 + pick_sil.astype(jnp.int32)
        if "slotfold" in ablate:
            # cheap stand-in with the right shapes
            sval = jnp.full((S, B), INF, jnp.float32).at[:U + 1].set(
                rmin[:S if U + 1 > S else U + 1][:min(U + 1, S)])
            sarg = jnp.full((S, B), -1, jnp.int32).at[:U + 1].set(
                enc_iota[:min(U + 1, S)])
        else:
            sval = jnp.full((S, B), INF, jnp.float32).at[
                c["hist_ext"]].min(rmin)
            sarg = jnp.full((S, B), -1, jnp.int32).at[
                c["hist_ext"]].max(jnp.where(
                    rmin == sval[c["hist_ext"]], enc_iota, -1))
        uni_direct = sval[SP:]
        if SP and "foldtree" not in ablate:
            pv = sval[:SP] if fold_perm is None else sval[:SP][fold_perm]
            ps = sarg[:SP] if fold_perm is None else sarg[:SP][fold_perm]
            plane = jnp.concatenate(
                [jnp.concatenate([pv + c["bo2_sorted"],
                                  jax.lax.bitcast_convert_type(
                                      ps + SOFF, jnp.float32)], 1),
                 jnp.concatenate(
                     [jnp.full((1, B), INF, jnp.float32),
                      jnp.full((1, B), SBIG_F, jnp.float32)], 1)], 0)
            for lv in fold_levels:
                v2 = plane[lv]
                v, s = v2[:, :, :B], v2[:, :, B:]
                vmin = v.min(axis=1)
                smin = jnp.min(jnp.where(v == vmin[:, None, :], s,
                                         SBIG_F), axis=1)
                plane = jnp.concatenate(
                    [jnp.concatenate([vmin, smin], 1),
                     jnp.concatenate(
                         [jnp.full((1, B), INF, jnp.float32),
                          jnp.full((1, B), SBIG_F, jnp.float32)], 1)],
                    0)
            fin2 = plane[fold_fin]
            pair_val_w = fin2[:, :B]
            pair_slot_w = jax.lax.bitcast_convert_type(
                fin2[:, B:], jnp.int32) - SOFF
            take_pair = pair_val_w < uni_direct
            unival = jnp.where(take_pair, pair_val_w, uni_direct)
            uslot = jnp.where(take_pair, pair_slot_w, sarg[SP:])
        else:
            unival = uni_direct
            uslot = sarg[SP:]
        nv_cand = unival + c["bo1"][:, None]
        nval = jnp.min(nv_cand, axis=0)
        narg_u = jnp.argmin(nv_cand, axis=0).astype(jnp.int32)
        nslot = jnp.take_along_axis(uslot, narg_u[None, :], axis=0)[0]
        sval_ext = jnp.concatenate(
            [sval[:SP], unival, jnp.full((1, B), INF, jnp.float32)], 0)
        vvals = sval_ext[vc_src]
        cutoff = jnp.min(rmin, axis=0) + beam
        vm = jnp.where(vvals <= cutoff[None, :], vvals, INF)
        if "topk" in ablate:
            ids = jnp.broadcast_to(
                jnp.arange(K, dtype=jnp.int32)[None], (B, K))
            vals = vm.T[:, :K]
        else:
            vals, ids = jax.lax.approx_min_k(vm.T, K)
            ids = ids.astype(jnp.int32)
        if "entscatter" in ablate:
            ent_all = jnp.full((SP + V, B), INF, jnp.float32).at[
                :K].min(vals.T)
            psrc = vc_src[ids]
            pslot = jnp.zeros((B, K), jnp.int32)
        else:
            dsts = vc_dst[ids]
            cand = vals[:, :, None] + vc_cost[ids]
            ent_all = jnp.full((SP + V, B), INF, jnp.float32).at[
                dsts, lane[:, None, None]].min(cand)
            psrc = vc_src[ids]
            is_pair_src = psrc < SP
            pslot = jnp.where(
                is_pair_src,
                sarg[jnp.clip(psrc, 0, S - 1), lane[:, None]],
                uslot[jnp.clip(psrc - SP, 0, V), lane[:, None]])
        ent_uni_w = jnp.minimum(nval[None, :] + c["uni"][:, None],
                                ent_all[SP:])
        ent_unit = jnp.where(
            c["unit_is_pair"][:, None],
            ent_all[c["unit_pair"]],
            ent_uni_w[c["unit_uni_word"]]) + c["unit_pron_cost"]
        if "rows" in ablate:
            new_cost = cost + am_t[0]
            take_fwd = cost < jnp.float32(1.0)
        else:
            amf = am_t[c["pdf_fwd_row"]] + c["fwd_extra"]
            ams = am_t[c["pdf_self_row"]] + c["self_extra"]
            rolled = jnp.roll(cost, 1, axis=0)
            fwd_src = jnp.where(c["first"][:, None],
                                ent_unit[c["row_unit"]], rolled)
            fwd_cand = fwd_src + amf
            self_cand = cost + ams
            take_fwd = fwd_cand < self_cand
            new_cost = jnp.where(take_fwd, fwd_cand, self_cand)
        row_bits = pack_bits(take_fwd, NB)
        if "roots" in ablate:
            roots_new = roots
            take_end = jnp.zeros((U, B), bool)
        else:
            am_end = am_t[c["pdf_end"]] + c["tr_end"]
            end_src = jnp.where(c["end_is_row"], cost[c["end_row"]],
                                ent_unit)
            end_cand = end_src + am_end
            self_r = roots[:U] + am_t[c["pdf_root_self"]] + \
                c["tr_root_self"]
            take_end = end_cand < self_r
            roots_new = jnp.concatenate(
                [jnp.where(take_end, end_cand, self_r),
                 jnp.full((1, B), INF, jnp.float32)], axis=0)
        end_bits = pack_bits(take_end, UB)
        if use_sil and "sil" not in ablate:
            sil_in = roots + g.sil_cost + g.sil_tr_fwd + \
                am_t[g.sil_pdf_fwd][None, :]
            sil_self = sil + g.sil_tr_self + am_t[g.sil_pdf_self][None, :]
            sil_take = sil_in < sil_self
            sil_new = jnp.where(sil_take, sil_in, sil_self)
        else:
            sil_take = jnp.zeros_like(roots, bool)
            sil_new = sil
        sil_bits = pack_bits(sil_take, UB)
        new_cost = jnp.where(act[None, :], new_cost, cost)
        roots_new = jnp.where(act[None, :], roots_new, roots)
        sil_new = jnp.where(act[None, :], sil_new, sil)
        ys = (row_bits, end_bits, sil_bits, ids, vals, pslot, nval,
              nslot)
        return (new_cost, roots_new, sil_new), ys

    import jax as _jax

    def forward(cost0, roots0, sil0, am, active):
        (cost, roots, sil), ys = _jax.lax.scan(
            frame, (cost0, roots0, sil0), (am, active))
        return cost, roots, sil, ys

    return _jax.jit(forward, donate_argnums=(0,))


def main():
    import jax
    import jax.numpy as jnp
    from kaldi_tpu.config import enable_compilation_cache
    enable_compilation_cache()
    from kaldi_tpu.decoder.lexchain_ng import NgramLexDecoder
    from kaldi_tpu.hmm.transition_model import TransitionModel
    from kaldi_tpu.recipes.bench_corpus import (bench_scale_spec,
                                                build_decode_graph_ng,
                                                make_corpus)
    from kaldi_tpu.tree.context_dep import ContextDependency
    from kaldi_tpu.util import kaldi_io

    spec = bench_scale_spec()
    lexicon, _tr, _trw, _tt, _tw, lm_text = make_corpus(
        spec, train_audio=False)
    tm = kaldi_io.read_kaldi_object(
        TransitionModel.read, os.path.join(ART, "flagship_ng.tm"))
    tree = kaldi_io.read_kaldi_object(
        ContextDependency.read, os.path.join(ART, "flagship_ng.tree"))
    graph = build_decode_graph_ng(lexicon, lm_text, tm, tree,
                                  prune_bi=2, prune_tri=3)
    dec = NgramLexDecoder(graph)
    g = graph
    B, K, T = 128, 128, 64
    rng = np.random.RandomState(0)
    am = jnp.asarray(rng.rand(T, g.num_pdfs, B).astype(np.float32))
    active = jnp.ones((T, B), bool)
    Nr, U = g.Nr, g.U

    variants = [
        ("full", set()),
        ("-slotfold", {"slotfold"}),
        ("-foldtree", {"foldtree"}),
        ("-topk", {"topk"}),
        ("-entscatter", {"entscatter"}),
        ("-rows", {"rows"}),
        ("-roots", {"roots"}),
        ("-sil", {"sil"}),
        ("-packbits", {"packbits"}),
        ("minimal", {"slotfold", "foldtree", "topk", "entscatter",
                     "rows", "roots", "sil", "packbits"}),
    ]
    base = None
    for name, abl in variants:
        fwd = make_step_ablate(dec, B, K, 16.0, abl)
        times = []
        for it in range(4):
            cost0 = jnp.full((Nr, B), INF, jnp.float32)
            roots0 = jnp.full((U + 1, B), INF, jnp.float32).at[U].set(0.)
            sil0 = jnp.full((U + 1, B), INF, jnp.float32)
            t0 = time.time()
            out = fwd(cost0, roots0, sil0, am, active)
            np.asarray(out[1][0, 0])
            times.append(time.time() - t0)
        med = sorted(times[1:])[1]
        per_frame = med / T * 1e3
        if name == "full":
            base = per_frame
        delta = "" if base is None or name == "full" else \
            f"  (delta {base - per_frame:+.2f})"
        print(f"{name:12s} {per_frame:7.2f} ms/frame"
              f" (compile+first {times[0]:.0f}s){delta}")


if __name__ == "__main__":
    main()
