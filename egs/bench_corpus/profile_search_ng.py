#!/usr/bin/env python
"""On-chip profiling for the SCALE headline search kernel
(NgramLexDecoder over the V=20k trigram x triphone graph): stage split
(forward scan / follow scan / host traceback) with device-resident
loglikes, plus jitted microbenchmarks of each per-frame block at the
real shapes, to attribute the per-frame cost.

Run ALONE on the real chip (never share the tunnel):
    python egs/bench_corpus/profile_search_ng.py [--quick]
"""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, REPO)
ART = os.path.join(REPO, "egs", "bench_corpus")


def bench_op(fn, *args, iters=20, name=""):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    # dependency-free repeated dispatch + terminal sync (axon
    # block_until_ready is unreliable; force a tiny D2H)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf).ravel()[:1]
    dt = (time.time() - t0) / iters
    print(f"  {name:44s} {dt * 1e3:8.2f} ms")
    return dt


def main():
    quick = "--quick" in sys.argv
    import jax
    import jax.numpy as jnp
    from kaldi_tpu.config import enable_compilation_cache
    enable_compilation_cache()
    from kaldi_tpu.decoder.lexchain_ng import NgramLexDecoder
    from kaldi_tpu.hmm.transition_model import TransitionModel
    from kaldi_tpu.nnet3.models import ChainTdnnf, ChainTdnnfConfig
    from kaldi_tpu.recipes.bench_corpus import (bench_scale_spec,
                                                build_decode_graph_ng,
                                                load_params,
                                                make_corpus,
                                                mfcc_options)
    from kaldi_tpu.feat.frontend import OfflineFeature
    from kaldi_tpu.tree.context_dep import ContextDependency
    from kaldi_tpu.util import kaldi_io

    spec = bench_scale_spec()
    t0 = time.time()
    lexicon, _tr, _trw, test_txt, test_wav, lm_text = \
        make_corpus(spec, train_audio=False)
    tm = kaldi_io.read_kaldi_object(
        TransitionModel.read, os.path.join(ART, "flagship_ng.tm"))
    tree = kaldi_io.read_kaldi_object(
        ContextDependency.read, os.path.join(ART, "flagship_ng.tree"))
    graph = build_decode_graph_ng(lexicon, lm_text, tm, tree,
                                  prune_bi=2, prune_tri=3)
    dec = NgramLexDecoder(graph)
    g = graph
    lm = g.lm
    B, K, D = 128, 128, NgramLexDecoder.VC_D
    print(f"# graph: S={g.S} SP={lm.SP} V={g.V} U={g.U} Nr={g.Nr} "
          f"VC={dec.VC} (built {time.time() - t0:.0f}s)",
          file=sys.stderr)

    cfg_meta = __import__("json").load(
        open(os.path.join(ART, "flagship_ng_meta.json")))
    cfg = ChainTdnnfConfig(
        feat_dim=40, ivector_dim=32, num_pdfs=cfg_meta["num_pdfs"],
        hidden_dim=1536, bottleneck_dim=160, prefinal_dim=256,
        num_layers=17, subsample_layer=8, frame_subsampling_factor=3)
    model = ChainTdnnf(cfg, train=False)
    variables = load_params(os.path.join(ART, "flagship_ng_params.npz"))
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
        variables["params"])
    fe = OfflineFeature(mfcc_options(spec, num_ceps=40))
    utts = sorted(test_wav)[:B]
    feats = fe.compute_batch([np.asarray(test_wav[u], np.float32)
                              for u in utts])
    Tmax = -(-max(f.shape[0] for f in feats) // 3) * 3
    batch = np.zeros((len(utts), Tmax, 40), np.float32)
    for i, f in enumerate(feats):
        batch[i, :f.shape[0]] = f
    from kaldi_tpu.ivector.batched import BatchedIvectorExtractor
    from kaldi_tpu.recipes.bench_corpus import load_ivector_extractor
    bex = BatchedIvectorExtractor(load_ivector_extractor(
        os.path.join(ART, "flagship_ng_ivec.npz")))
    ivecs = bex.extract_batch(jnp.asarray(batch))

    @jax.jit
    def am_fn(x, iv):
        out, _ = model.apply(
            {"params": params,
             "batch_stats": variables["batch_stats"]}, x,
            iv.astype(jnp.bfloat16))
        return out

    ll = am_fn(jnp.asarray(batch), ivecs)
    np.asarray(ll[0, 0, 0])
    lengths = [f.shape[0] // 3 for f in feats]
    audio_s = sum(len(test_wav[u]) for u in utts) / spec.fs
    Tfrm = ll.shape[1]
    print(f"# {len(utts)} lanes, loglikes {ll.shape}, {audio_s:.0f}s "
          f"audio, {Tfrm} frames", file=sys.stderr)

    # ---- stage split on the real decode ------------------------------
    for kk, ex in ((K, False),) if quick else ((K, False), (K, True)):
        t0 = time.time()
        out = dec.decode_batch(ll, 1.0, lengths=lengths, prune_k=kk,
                               prune_beam=16.0, exact_topk=ex)
        compile_s = time.time() - t0
        stats = {}
        times = []
        for _ in range(3):
            t0 = time.time()
            dec.decode_batch(ll, 1.0, lengths=lengths, prune_k=kk,
                             prune_beam=16.0, exact_topk=ex,
                             stats=stats)
            times.append(time.time() - t0)
        med = sorted(times)[1]
        n_ok = sum(o is not None for o in out)
        print(f"K={kk} exact={int(ex)}: median {med * 1e3:.0f}ms = "
              f"{audio_s / med:.0f}x RT (fwd {stats['fwd_s'] * 1e3:.0f}"
              f"ms, fol {stats['fol_s'] * 1e3:.0f}ms, traceback "
              f"{stats['traceback_s'] * 1e3:.0f}ms; compile "
              f"{compile_s:.0f}s; {n_ok} ok) "
              f"-> {stats['fwd_s'] / Tfrm * 1e3:.2f} ms/frame fwd")

    # ---- microbenchmarks at real shapes -------------------------------
    print("# per-frame block microbenchmarks (one frame, B=128):")
    S, SP, V, U, Nr = g.S, lm.SP, g.V, g.U, g.Nr
    VC = dec.VC
    c = dec._c
    rng = np.random.RandomState(0)
    rmin = jnp.asarray(rng.rand(U + 1, B).astype(np.float32) * 20)
    am_t = jnp.asarray(rng.rand(g.num_pdfs, B).astype(np.float32))
    cost = jnp.asarray(rng.rand(Nr, B).astype(np.float32) * 30)
    INF = np.float32(1e30)

    hist_ext = c["hist_ext"]

    @jax.jit
    def blk_slotfold(rmin):
        sval = jnp.full((S, B), INF, jnp.float32).at[hist_ext].min(rmin)
        slot_iota = jnp.arange(U + 1, dtype=jnp.int32)[:, None]
        sarg = jnp.full((S, B), -1, jnp.int32).at[hist_ext].max(
            jnp.where(rmin == sval[hist_ext], slot_iota, -1))
        return sval, sarg

    sval, sarg = blk_slotfold(rmin)
    bench_op(blk_slotfold, rmin, name=f"slot->state scatter (S={S})")

    fold_levels = dec._fold_levels
    fold_fin = dec._fold_fin
    SOFF = jnp.int32(0x40000000)
    SBIG = jax.lax.bitcast_convert_type(jnp.int32(0x7F000000),
                                        jnp.float32)

    @jax.jit
    def blk_foldtree(sval, sarg):
        pv, ps = sval[:SP], sarg[:SP]
        plane = jnp.concatenate(
            [jnp.concatenate([pv + c["bo2_sorted"],
                              jax.lax.bitcast_convert_type(
                                  ps + SOFF, jnp.float32)], 1),
             jnp.concatenate([jnp.full((1, B), INF, jnp.float32),
                              jnp.full((1, B), SBIG, jnp.float32)],
                             1)], 0)
        for lv in fold_levels:
            v2 = plane[lv]
            v, s = v2[:, :, :B], v2[:, :, B:]
            vmin = v.min(axis=1)
            smin = jnp.min(jnp.where(v == vmin[:, None, :], s, SBIG),
                           axis=1)
            plane = jnp.concatenate(
                [jnp.concatenate([vmin, smin], 1),
                 jnp.concatenate([jnp.full((1, B), INF, jnp.float32),
                                  jnp.full((1, B), SBIG, jnp.float32)],
                                 1)], 0)
        return plane[fold_fin]

    bench_op(blk_foldtree, sval, sarg,
             name=f"backoff fold tree (SP={SP})")

    vm = jnp.asarray(rng.rand(VC, B).astype(np.float32) * 40)

    @jax.jit
    def blk_topk_exact(vm):
        neg, ids = jax.lax.top_k(-vm.T, K)
        return -neg, ids

    @jax.jit
    def blk_topk_approx(vm):
        return jax.lax.approx_min_k(vm.T, K)

    bench_op(blk_topk_exact, vm, name=f"exact top_k (VC={VC}, K={K})")
    vals, ids = blk_topk_approx(vm)
    bench_op(blk_topk_approx, vm, name=f"approx_min_k (VC={VC}, K={K})")

    ids = ids.astype(jnp.int32)
    vc_dst, vc_cost = dec._vc_dst, dec._vc_cost
    lane = jnp.arange(B)

    @jax.jit
    def blk_entscatter(vals, ids):
        dsts = vc_dst[ids]
        cand = vals[:, :, None] + vc_cost[ids]
        ent_all = jnp.full((SP + V, B), INF, jnp.float32).at[
            dsts, lane[:, None, None]].min(cand)
        return ent_all

    bench_op(blk_entscatter, vals, ids,
             name=f"dst scatter-min (B*K*D={B * K * D} -> {SP + V})")

    @jax.jit
    def blk_pslot(ids, sarg):
        psrc = dec._vc_src[ids]
        is_pair = psrc < SP
        pslot = jnp.where(
            is_pair, sarg[jnp.clip(psrc, 0, S - 1), lane[:, None]],
            sarg[jnp.clip(psrc - SP, 0, V), lane[:, None]])
        return pslot

    bench_op(blk_pslot, ids, sarg,
             name=f"pslot 2D element-gather (B*K={B * K})")

    @jax.jit
    def blk_rows(cost, am_t, ent_unit):
        amf = am_t[c["pdf_fwd_row"]] + c["fwd_extra"]
        ams = am_t[c["pdf_self_row"]] + c["self_extra"]
        rolled = jnp.roll(cost, 1, axis=0)
        fwd_src = jnp.where(c["first"][:, None],
                            ent_unit[c["row_unit"]], rolled)
        fwd_cand = fwd_src + amf
        self_cand = cost + ams
        take_fwd = fwd_cand < self_cand
        new_cost = jnp.where(take_fwd, fwd_cand, self_cand)
        return new_cost, take_fwd

    ent_unit = jnp.asarray(rng.rand(U, B).astype(np.float32) * 30)
    bench_op(blk_rows, cost, am_t, ent_unit,
             name=f"row plane update (Nr={Nr})")

    NB = Nr // 8

    @jax.jit
    def blk_packbits(cost, am_t, ent_unit):
        _, take_fwd = blk_rows(cost, am_t, ent_unit)
        d = take_fwd.astype(jnp.uint8)
        d3 = d.reshape(NB, 8, B)
        w8 = (jnp.uint8(1) << jax.lax.broadcasted_iota(
            jnp.uint8, (1, 8, 1), 1))
        return (d3 * w8).sum(axis=1, dtype=jnp.uint8)

    bench_op(blk_packbits, cost, am_t, ent_unit,
             name="row update + pack_bits")

    @jax.jit
    def blk_roots(am_t, cost, ent_unit, rmin):
        am_end = am_t[c["pdf_end"]] + c["tr_end"]
        end_src = jnp.where(c["end_is_row"], cost[c["end_row"]],
                            ent_unit)
        end_cand = end_src + am_end
        self_r = rmin[:U] + am_t[c["pdf_root_self"]] + c["tr_root_self"]
        take_end = end_cand < self_r
        return jnp.where(take_end, end_cand, self_r), take_end

    bench_op(blk_roots, am_t, cost, ent_unit, rmin,
             name=f"root plane update (U={U})")


if __name__ == "__main__":
    main()
