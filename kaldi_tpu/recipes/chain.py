"""Chain (LF-MMI) training driver.

Parity: steps/chain/train.py (SURVEY.md §3.4) — den graph from
alignment phone LM, numerators from alignments, SGD with the chain
objective — re-expressed as a single-process pjit-able training loop
(the reference's parallel-jobs + nnet3-average outer loop becomes
data-parallel psum, §2.13).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from kaldi_tpu.base.logging import log, warn
from kaldi_tpu.chain.graphs import DenominatorGraph, batch_pack
from kaldi_tpu.chain.objective import ChainTrainingOptions, chain_loss
from kaldi_tpu.chain.supervision import (
    alignment_to_numerator_graph, alignment_to_tolerance_numerator,
    make_denominator_graph)
from kaldi_tpu.nnet3.components import constrain_orthonormal
from kaldi_tpu.nnet3.models import ChainTdnnf, ChainTdnnfConfig
from kaldi_tpu.recipes.mono import MonoSystem


@dataclass
class ChainTrainOptions:
    num_epochs: int = 10
    learning_rate: float = 1e-3
    final_learning_rate: float = 1e-4
    minibatch_size: int = 8
    chunk_width: int = 60          # input frames per chunk
    chain: ChainTrainingOptions = field(
        default_factory=lambda: ChainTrainingOptions(
            l2_regularize=5e-5, leaky_hmm_coefficient=0.1,
            xent_regularize=0.0))
    max_param_change: float = 2.0
    orthonormal_interval: int = 4  # apply semi-orthogonal constraint
    seed: int = 0
    # time-tolerant numerator supervision (chain-supervision.cc
    # defaults); 0/0 = exact linear numerators from the alignment
    left_tolerance: int = 0
    right_tolerance: int = 0


def make_chunks(feats: Dict[str, np.ndarray],
                alignments: Dict[str, List[int]],
                chunk_width: int, subsample: int
                ) -> List[Tuple[np.ndarray, List[int]]]:
    """Cut utterances into fixed-width chunks with matching alignment
    slices (the egs-generation equivalent, chain-supervision.h:448
    SplitIntoRanges — simple non-overlapping version)."""
    chunks = []
    for utt, f in feats.items():
        if utt not in alignments:
            continue
        ali = alignments[utt]
        T = min(f.shape[0], len(ali))
        for start in range(0, T - chunk_width + 1, chunk_width):
            chunks.append((f[start:start + chunk_width],
                           ali[start:start + chunk_width]))
    return chunks


def train_chain(sys_: MonoSystem, feats: Dict[str, np.ndarray],
                alignments: Dict[str, List[int]],
                cfg: Optional[ChainTdnnfConfig] = None,
                opts: Optional[ChainTrainOptions] = None):
    """Returns (model, params_dict, den_graph)."""
    if opts is None:
        opts = ChainTrainOptions()
    tm, tree = sys_.tm, sys_.tree
    dim = next(iter(feats.values())).shape[1]
    if cfg is None:
        cfg = ChainTdnnfConfig(feat_dim=dim, num_pdfs=tm.num_pdfs,
                               hidden_dim=128, bottleneck_dim=32,
                               prefinal_dim=64, num_layers=5,
                               subsample_layer=3,
                               frame_subsampling_factor=1)
    sub = cfg.frame_subsampling_factor

    # denominator graph from training phone sequences
    phone_seqs = []
    for utt, ali in alignments.items():
        phones = []
        for tid in ali:
            # a phone starts at a non-self-loop transition out of state 0
            if (tm.transition_id_to_hmm_state(tid) == 0
                    and not tm.is_self_loop(tid)):
                phones.append(tm.transition_id_to_phone(tid))
        if phones:
            phone_seqs.append(phones)
    den_graph = make_denominator_graph(phone_seqs, tm, tree)

    chunks = make_chunks(feats, alignments, opts.chunk_width, sub)
    if not chunks:
        raise ValueError("no training chunks")
    log(f"chain training: {len(chunks)} chunks of {opts.chunk_width} frames")

    model = ChainTdnnf(cfg, train=True)
    rng = jax.random.PRNGKey(opts.seed)
    variables = model.init(rng, jnp.zeros((2, opts.chunk_width, dim)))
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    steps_per_epoch = max(1, len(chunks) // opts.minibatch_size)
    total_steps = steps_per_epoch * opts.num_epochs
    sched = optax.linear_schedule(opts.learning_rate,
                                  opts.final_learning_rate, total_steps)
    tx = optax.chain(optax.clip_by_global_norm(opts.max_param_change),
                     optax.adam(sched))
    opt_state = tx.init(params)

    @jax.jit
    def step(params, batch_stats, opt_state, feats_b, num_arrays,
             ivecs_b=None):
        def loss_fn(p, bs):
            (chain_out, xent_out), upd = model.apply(
                {"params": p, "batch_stats": bs}, feats_b, ivecs_b,
                mutable=["batch_stats"])
            objf, aux = chain_loss(opts.chain, den_graph, num_arrays,
                                   chain_out, xent_out)
            return -objf, (aux, upd["batch_stats"])
        (loss, (aux, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch_stats)
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_bs, new_opt, -loss, aux

    def apply_orthonormal(params):
        def walk(tree):
            if isinstance(tree, dict):
                return {k: (jnp.asarray(constrain_orthonormal(v))
                            if k == "linear" and hasattr(v, "ndim")
                            and v.ndim == 2 else walk(v))
                        for k, v in tree.items()}
            return tree
        return walk(params)

    rng_np = np.random.default_rng(opts.seed)
    order = np.arange(len(chunks))
    it = 0
    for epoch in range(opts.num_epochs):
        rng_np.shuffle(order)
        objfs = []
        for start in range(0, len(order) - opts.minibatch_size + 1,
                           opts.minibatch_size):
            idx = order[start:start + opts.minibatch_size]
            feats_b = jnp.asarray(np.stack([chunks[i][0] for i in idx]))
            nums = [alignment_to_numerator_graph(chunks[i][1], tm, sub)
                    for i in idx]
            num_arrays = tuple(jnp.asarray(a) for a in batch_pack(nums))
            params, batch_stats, opt_state, objf, aux = step(
                params, batch_stats, opt_state, feats_b, num_arrays)
            objfs.append(float(objf))
            it += 1
            if it % opts.orthonormal_interval == 0:
                params = apply_orthonormal(params)
        log(f"chain epoch {epoch}: objf/frame "
            f"{np.mean(objfs):.4f}")
    return model, {"params": params, "batch_stats": batch_stats}, den_graph


def nnet_log_likes(model: ChainTdnnf, variables: dict,
                   feats: Dict[str, np.ndarray],
                   ivectors: Optional[Dict[str, np.ndarray]] = None
                   ) -> Dict[str, np.ndarray]:
    """Batched AM scores for decoding (pseudo-loglikes; chain models
    need no prior division)."""
    eval_model = ChainTdnnf(model.cfg, train=False)
    utts = list(feats)
    lens = [feats[u].shape[0] for u in utts]
    Tmax = max(lens)
    dim = feats[utts[0]].shape[1]
    batch = np.zeros((len(utts), Tmax, dim), np.float32)
    for i, u in enumerate(utts):
        batch[i, :lens[i]] = feats[u]
    iv_b = (jnp.asarray(np.stack([np.asarray(ivectors[u], np.float32)
                                  for u in utts]))
            if ivectors is not None else None)
    out, _ = eval_model.apply(variables, jnp.asarray(batch), iv_b)
    out = np.asarray(out)
    sub = model.cfg.frame_subsampling_factor
    return {u: out[i, : (lens[i] + sub - 1) // sub]
            for i, u in enumerate(utts)}


def make_chain_system(lang, mono_tm) -> Tuple:
    """Build the chain-topology system (1-state HMMs, forward/self pdf
    split) over the same phone set (steps/nnet3/chain/gen_topo.py +
    build-tree stage of the chain recipe, monophone version).
    Returns (chain_tm, chain_tree)."""
    from kaldi_tpu.hmm.topology import HmmTopology
    from kaldi_tpu.hmm.transition_model import TransitionModel
    from kaldi_tpu.tree import monophone_context_dependency
    phones = mono_tm.get_phones()
    topo = HmmTopology.chain_topology(list(phones))
    npc = {p: 2 for p in phones}
    tree = monophone_context_dependency(list(phones), npc)
    tm = TransitionModel(topo, tree)
    return tm, tree


def mono_ali_to_chain_ali(ali: Sequence[int], mono_tm, chain_tm,
                          subsample: int = 3) -> List[int]:
    """Convert a frame-level alignment to chain transition-ids at the
    subsampled output rate: each phone segment of d input frames
    becomes ceil(d/subsample) output frames = [forward, self-loop...]."""
    # phone segments
    segs: List[Tuple[int, int]] = []  # (phone, num_frames)
    for tid in ali:
        phone = mono_tm.transition_id_to_phone(tid)
        is_start = (mono_tm.transition_id_to_hmm_state(tid) == 0
                    and not mono_tm.is_self_loop(tid))
        if is_start or not segs:
            segs.append((phone, 1))
        else:
            segs[-1] = (segs[-1][0], segs[-1][1] + 1)
    # boundary-preserving conversion: input segment [s, e) maps to
    # output frames [round(s/sub), round(e/sub)) with minimum 1 frame
    target = len(ali) // subsample

    def tids_for(phone):
        ts = None
        for cand in range(1, chain_tm.num_transition_states + 1):
            if chain_tm.transition_state_to_phone(cand) == phone:
                ts = cand
                break
        sl = chain_tm.self_loop_of(ts)
        fwd = None
        for idx in range(chain_tm.num_transition_indices(ts)):
            tid = chain_tm.pair_to_transition_id(ts, idx)
            if not chain_tm.is_self_loop(tid):
                fwd = tid
                break
        return fwd, sl

    out: List[int] = []
    pos = 0
    out_pos = 0
    for phone, dur in segs:
        end = pos + dur
        o_end = max(out_pos + 1, int(round(end / subsample)))
        o_end = min(o_end, target) if target else o_end
        fwd, sl = tids_for(phone)
        d_out = o_end - out_pos
        if d_out >= 1:
            out.extend([fwd] + [sl] * (d_out - 1))
            out_pos = o_end
        pos = end
    # pad/trim tail to exactly the target length
    if target > 0:
        while len(out) < target:
            out.append(out[-1] if out else 1)
        del out[target:]
    return out


def train_chain_topo(sys_mono, feats: Dict[str, np.ndarray],
                     mono_alignments: Dict[str, List[int]],
                     cfg: Optional[ChainTdnnfConfig] = None,
                     opts: Optional[ChainTrainOptions] = None,
                     ivectors: Optional[Dict[str, np.ndarray]] = None):
    """Chain training with the proper chain topology + frame
    subsampling. With `ivectors` (utterance -> vector), the model takes
    the speaker vector as a second input (the standard online-ivector
    chain configuration). Returns (model, variables, den_graph,
    chain_tm, chain_tree)."""
    if opts is None:
        opts = ChainTrainOptions()
    chain_tm, chain_tree = make_chain_system(sys_mono.lang, sys_mono.tm)
    sub = 3 if cfg is None else cfg.frame_subsampling_factor
    dim = next(iter(feats.values())).shape[1]
    if cfg is None:
        cfg = ChainTdnnfConfig(feat_dim=dim, num_pdfs=chain_tm.num_pdfs,
                               hidden_dim=128, bottleneck_dim=32,
                               prefinal_dim=64, num_layers=5,
                               subsample_layer=3,
                               frame_subsampling_factor=3)
        sub = 3
    # chain alignments at the output rate
    chain_ali = {u: mono_ali_to_chain_ali(a, sys_mono.tm, chain_tm, sub)
                 for u, a in mono_alignments.items()}
    phone_seqs = []
    for u, a in chain_ali.items():
        seq = []
        for tid in a:
            if not chain_tm.is_self_loop(tid):
                seq.append(chain_tm.transition_id_to_phone(tid))
        if seq:
            phone_seqs.append(seq)
    den_graph = make_denominator_graph(phone_seqs, chain_tm, chain_tree)

    # chunks: input frames multiple of sub; numerators already at
    # output rate
    chunks = []
    num_graphs = []  # per-chunk numerator PackedGraph
    tol = (opts.left_tolerance, opts.right_tolerance)
    cw = (opts.chunk_width // sub) * sub
    for u, f in feats.items():
        if u not in chain_ali:
            continue
        ca = chain_ali[u]
        T_in = min(f.shape[0], len(ca) * sub)
        for start in range(0, T_in - cw + 1, cw):
            o_start, o_end = start // sub, (start + cw) // sub
            if tol != (0, 0):
                g = alignment_to_tolerance_numerator(
                    mono_alignments[u][start:start + cw], sys_mono.tm,
                    chain_tm, sub, *tol)
            else:
                g = alignment_to_numerator_graph(ca[o_start:o_end],
                                                 chain_tm, subsample=1)
            iv = None if ivectors is None else np.asarray(
                ivectors[u], np.float32)
            chunks.append((f[start:start + cw], ca[o_start:o_end], iv))
            num_graphs.append(g)
    if not chunks:
        raise ValueError("no chain chunks")
    log(f"chain-topo training: {len(chunks)} chunks of {cw} frames "
        f"({cw // sub} outputs), tolerance {tol}")
    model, variables = _fit_chain(cfg, den_graph, chunks, num_graphs,
                                  opts, cw, dim,
                                  use_ivectors=ivectors is not None)
    return model, variables, den_graph, chain_tm, chain_tree


def _fit_chain(cfg, den_graph, chunks, num_graphs, opts, cw, dim,
               use_ivectors=False):
    """Shared chain SGD loop (the train_one_iteration body of
    steps/chain/train.py, single-process)."""
    model = ChainTdnnf(cfg, train=True)
    rng = jax.random.PRNGKey(opts.seed)
    if use_ivectors:
        variables = model.init(rng, jnp.zeros((2, cw, dim)),
                               jnp.zeros((2, cfg.ivector_dim)))
    else:
        variables = model.init(rng, jnp.zeros((2, cw, dim)))
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    steps_per_epoch = max(1, len(chunks) // opts.minibatch_size)
    total_steps = steps_per_epoch * opts.num_epochs
    warmup = min(max(total_steps // 20, 10), total_steps // 2 or 1)
    sched = optax.join_schedules(
        [optax.linear_schedule(opts.learning_rate * 0.1,
                               opts.learning_rate, warmup),
         optax.linear_schedule(opts.learning_rate,
                               opts.final_learning_rate,
                               max(total_steps - warmup, 1))],
        [warmup])
    tx = optax.chain(optax.clip_by_global_norm(opts.max_param_change),
                     optax.adam(sched))
    opt_state = tx.init(params)

    @jax.jit
    def step(params, batch_stats, opt_state, feats_b, num_arrays,
             ivecs_b=None):
        def loss_fn(p, bs):
            (chain_out, xent_out), upd = model.apply(
                {"params": p, "batch_stats": bs}, feats_b, ivecs_b,
                mutable=["batch_stats"])
            objf, aux = chain_loss(opts.chain, den_graph, num_arrays,
                                   chain_out, xent_out)
            return -objf, (aux, upd["batch_stats"])
        (loss, (aux, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch_stats)
        updates, new_opt = tx.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), new_bs, new_opt,
                -loss)

    def apply_orthonormal(params):
        # the semi-orthogonal constraint on TDNN-F bottleneck factors
        # (steps/libs/nnet3/train/frame_level_objf/common.py: applied
        # periodically during training; without it the factored
        # bottleneck degenerates at scale)
        def walk(tree):
            if isinstance(tree, dict):
                return {k: (jnp.asarray(constrain_orthonormal(v))
                            if k == "linear" and hasattr(v, "ndim")
                            and v.ndim == 2 else walk(v))
                        for k, v in tree.items()}
            return tree
        return walk(params)

    rng_np = np.random.default_rng(opts.seed)
    order = np.arange(len(chunks))
    it = 0
    for epoch in range(opts.num_epochs):
        rng_np.shuffle(order)
        objfs = []
        for i in range(0, len(order) - opts.minibatch_size + 1,
                       opts.minibatch_size):
            idx = order[i:i + opts.minibatch_size]
            feats_b = jnp.asarray(np.stack([chunks[j][0] for j in idx]))
            ivecs_b = (jnp.asarray(np.stack([chunks[j][2] for j in idx]))
                       if use_ivectors else None)
            num_arrays = tuple(jnp.asarray(a) for a in batch_pack(
                [num_graphs[j] for j in idx]))
            params, batch_stats, opt_state, objf = step(
                params, batch_stats, opt_state, feats_b, num_arrays,
                ivecs_b)
            objfs.append(float(objf))
            it += 1
            if it % opts.orthonormal_interval == 0:
                params = apply_orthonormal(params)
        log(f"chain epoch {epoch}: objf/frame {np.mean(objfs):.4f}")
    return model, {"params": params, "batch_stats": batch_stats}


# ----------------------------------------------------------------------
# Context-dependent (triphone) chain system.  The reference builds the
# chain tree from GMM alignments (steps/nnet3/chain/build_tree.sh) and
# composes the den phone-LM through the context expansion
# (chain-den-graph.cc); here the context convention is WORD-INTERNAL
# windows (0-padded at word boundaries), matching the n-gram device
# decoder's graph build (decoder/lexchain_ng.py) so train-side pdfs and
# decode-side pdfs agree exactly.

def segment_alignment_words(ali: Sequence[int], mono_tm,
                            word_prons: Sequence[Sequence[int]],
                            sil_phone: int, N: int = 3, P: int = 1):
    """Mono frame alignment + per-word phone lists ->
    [(window, phone, start, end)] full-rate segments with word-internal
    context windows; silence segments get the 0-padded window."""
    from kaldi_tpu.chain.supervision import alignment_to_phone_segments
    segs = alignment_to_phone_segments(ali, mono_tm)
    exp: List[Tuple[int, Tuple[int, ...]]] = []
    for pron in word_prons:
        padded = [0] * P + [int(x) for x in pron] + [0] * (N - P - 1)
        for i in range(len(pron)):
            exp.append((int(pron[i]), tuple(padded[i:i + N])))
    sil_win = tuple([0] * P + [sil_phone] + [0] * (N - P - 1))
    out = []
    j = 0
    for (ph, s, e) in segs:
        if ph == sil_phone and (j >= len(exp) or exp[j][0] != sil_phone):
            out.append((sil_win, ph, s, e))
            continue
        if j < len(exp) and exp[j][0] == ph:
            out.append((exp[j][1], ph, s, e))
            j += 1
        else:
            raise ValueError(
                f"alignment/transcript phone mismatch at segment "
                f"{len(out)}: got phone {ph}, expected "
                f"{exp[j] if j < len(exp) else 'EOS'}")
    if j != len(exp):
        raise ValueError(f"alignment ended with {len(exp) - j} "
                         "transcript phones unconsumed")
    return out


def build_ctx_chain_system(feats: Dict[str, np.ndarray],
                           seg_windows: Dict[str, list],
                           phones: Sequence[int],
                           N: int = 3, P: int = 1,
                           max_leaves: int = 2000,
                           min_gain: float = 30.0):
    """Triphone chain tree from windowed alignment stats + the chain
    TransitionModel over it.  Returns (chain_tm, chain_tree)."""
    from kaldi_tpu.hmm.topology import HmmTopology
    from kaldi_tpu.hmm.transition_model import TransitionModel
    from kaldi_tpu.tree.build_tree import (BuildTreeOptions, build_tree,
                                           cluster_phones)
    from kaldi_tpu.tree.clusterable import GaussClusterable
    from kaldi_tpu.tree.event_map import PDF_CLASS_KEY
    stats: Dict[tuple, GaussClusterable] = {}
    for u, segs in seg_windows.items():
        f = feats[u]
        for (win, ph, s, e) in segs:
            e = min(e, f.shape[0])
            if e <= s:
                continue
            for pc, sl in ((0, slice(s, s + 1)), (1, slice(s + 1, e))):
                frames = f[sl]
                if frames.shape[0] == 0:
                    continue
                ev = tuple(sorted(
                    [(PDF_CLASS_KEY, pc)]
                    + [(i, int(w)) for i, w in enumerate(win)]))
                gc = stats.get(ev)
                if gc is None:
                    gc = GaussClusterable(f.shape[1])
                    stats[ev] = gc
                gc.accumulate(frames)
    qsets = cluster_phones(stats, list(phones), P)
    # out-of-word position 0 can appear in context keys
    questions = {k: [[0]] + qsets for k in range(N)}
    questions[PDF_CLASS_KEY] = [[0], [1]]
    roots = [([p], True, True) for p in phones]
    topo = HmmTopology.chain_topology(list(phones))
    tree = build_tree(stats, questions, roots, N, P,
                      opts=BuildTreeOptions(max_leaves=max_leaves,
                                            min_gain=min_gain),
                      topo=topo)
    tm = TransitionModel(topo, tree)
    log(f"ctx chain system: N={N} P={P} leaves={tree.num_pdfs} "
        f"tids={tm.num_transition_ids}")
    return tm, tree


def train_chain_ctx(sys_mono, feats: Dict[str, np.ndarray],
                    mono_alignments: Dict[str, List[int]],
                    word_prons: Dict[str, List[List[int]]],
                    cfg: Optional[ChainTdnnfConfig] = None,
                    opts: Optional[ChainTrainOptions] = None,
                    N: int = 3, P: int = 1,
                    max_leaves: int = 2000, min_gain: float = 30.0,
                    sil_phone: Optional[int] = None,
                    ivectors: Optional[Dict[str, np.ndarray]] = None,
                    window_den: Optional[bool] = None):
    """Chain training over a context-dependent (triphone) tree with
    word-internal windows.  word_prons: per utterance the transcript's
    per-word phone lists.  Returns (model, variables, den_graph,
    chain_tm, chain_tree).

    window_den: None (auto) selects the denominator LM form — a dense
    interpolated bigram over the seen context TOKENS below ~1000 token
    types (small corpora), and the tied pair-state WINDOW LM
    (supervision.estimate_window_lm) above, where a token-level bigram
    is hopelessly sparse and its unsmoothed form collapses LF-MMI to
    silence (round-4 scale failure; see estimate_window_lm)."""
    from kaldi_tpu.chain.supervision import (
        denominator_graph_from_phone_lm, estimate_phone_lm,
        estimate_window_lm, make_tolerance_supervision)
    if opts is None:
        opts = ChainTrainOptions()
    if sil_phone is None:
        sil_phone = sys_mono.lang.phones["SIL"]
    seg_windows = {}
    skipped = 0
    for u, ali in mono_alignments.items():
        try:
            seg_windows[u] = segment_alignment_words(
                ali, sys_mono.tm, word_prons[u], sil_phone, N, P)
        except ValueError:
            skipped += 1
    if skipped:
        warn(f"train_chain_ctx: {skipped} utterances failed "
             "word segmentation")
    phones = sorted(sys_mono.tm.get_phones())
    chain_tm, chain_tree = build_ctx_chain_system(
        feats, seg_windows, phones, N, P, max_leaves, min_gain)
    if callable(cfg):
        # the ctx tree's leaf count is data-dependent, so callers that
        # want non-default dims pass a factory num_pdfs -> cfg
        cfg = cfg(chain_tm.num_pdfs)
    sub = 3 if cfg is None else cfg.frame_subsampling_factor
    dim = next(iter(feats.values())).shape[1]
    if cfg is None:
        cfg = ChainTdnnfConfig(feat_dim=dim, num_pdfs=chain_tm.num_pdfs,
                               hidden_dim=128, bottleneck_dim=32,
                               prefinal_dim=64, num_layers=5,
                               subsample_layer=3,
                               frame_subsampling_factor=3)
        sub = 3
    # --- denominator: token-level phone LM through the tree ----------
    tokens = sorted({win for segs in seg_windows.values()
                     for (win, _, _, _) in segs})
    if window_den is None:
        window_den = len(tokens) > 1000
    if window_den:
        win_seqs = [[win for (win, _, _, _) in segs]
                    for segs in seg_windows.values()]
        lm, ilabel_info = estimate_window_lm(win_seqs)
    else:
        tok_id = {w: i + 1 for i, w in enumerate(tokens)}
        ilabel_info = [()] + list(tokens)
        tok_seqs = [[tok_id[win] for (win, _, _, _) in segs]
                    for segs in seg_windows.values()]
        lm = estimate_phone_lm(tok_seqs, list(tok_id.values()))
    den_graph = denominator_graph_from_phone_lm(
        lm, chain_tm, chain_tree, ilabel_info=ilabel_info)
    # --- chunks + context-aware tolerance numerators -----------------
    cw = (opts.chunk_width // sub) * sub
    tol = (opts.left_tolerance, opts.right_tolerance)
    pdf_cache: Dict[tuple, Tuple[int, int]] = {}

    def pdfs_of(win):
        if win not in pdf_cache:
            pdf_cache[win] = (chain_tree.compute(list(win), 0),
                              chain_tree.compute(list(win), 1))
        return pdf_cache[win]

    chunks, num_graphs = [], []
    for u, f in feats.items():
        if u not in seg_windows:
            continue
        segs = seg_windows[u]
        T_in = min(f.shape[0], max(e for (_, _, _, e) in segs))
        for start in range(0, T_in - cw + 1, cw):
            end = start + cw
            clip = [(ph, max(s, start) - start, min(e, end) - start,
                     win) for (win, ph, s, e) in segs
                    if s < end and e > start]
            if not clip:
                continue
            seg3 = [(ph, s, e) for (ph, s, e, _) in clip]
            pairs = [pdfs_of(win) for (_, _, _, win) in clip]
            try:
                g = make_tolerance_supervision(
                    seg3, cw, chain_tm, sub, *tol, pdf_pairs=pairs)
            except ValueError:
                continue
            iv = None if ivectors is None else np.asarray(
                ivectors[u], np.float32)
            chunks.append((f[start:end], None, iv))
            num_graphs.append(g)
    if not chunks:
        raise ValueError("no chain chunks")
    log(f"chain-ctx training: {len(chunks)} chunks of {cw} frames, "
        f"tolerance {tol}, {len(tokens)} context tokens")
    model, variables = _fit_chain(cfg, den_graph, chunks, num_graphs,
                                  opts, cw, dim,
                                  use_ivectors=ivectors is not None)
    return model, variables, den_graph, chain_tm, chain_tree


def train_chain_e2e(lang, feats: Dict[str, np.ndarray],
                    transcripts: Dict[str, List[str]],
                    cfg: Optional[ChainTdnnfConfig] = None,
                    opts: Optional[ChainTrainOptions] = None):
    """FLAT-START ('end2end') LF-MMI: no bootstrap GMM, no alignments
    (egs/wsj/s5 local/e2e recipes; chain-supervision.cc
    TrainingGraphToSupervisionE2e).  The numerator for each utterance
    is the full transcript graph with free phone durations and
    optional silences at every boundary
    (chain.supervision.transcript_to_e2e_numerator); the denominator
    phone LM is estimated from the silence-padded transcripts.
    Returns (model, variables, den_graph, chain_tm, chain_tree)."""
    from kaldi_tpu.chain.supervision import transcript_to_e2e_numerator
    from kaldi_tpu.hmm.topology import HmmTopology
    from kaldi_tpu.hmm.transition_model import TransitionModel
    from kaldi_tpu.tree import monophone_context_dependency
    if opts is None:
        opts = ChainTrainOptions()
    phone_ids = sorted(lang.phones.values())
    topo = HmmTopology.chain_topology(phone_ids)
    chain_tree = monophone_context_dependency(
        phone_ids, {p: 2 for p in phone_ids})
    chain_tm = TransitionModel(topo, chain_tree)
    sil = lang.phones[lang.sil_phone]

    def phones_of(words: List[str]) -> List[int]:
        seq: List[int] = []
        for w in words:
            seq.extend(lang.phones[p] for p in lang.lexicon[w][0])
        return seq

    utts = [u for u in feats if u in transcripts and transcripts[u]]
    seqs = {u: phones_of(list(transcripts[u])) for u in utts}
    den_graph = make_denominator_graph(
        [[sil] + s + [sil] for s in seqs.values()], chain_tm,
        chain_tree)
    sub = 3 if cfg is None else cfg.frame_subsampling_factor
    dim = next(iter(feats.values())).shape[1]
    if cfg is None:
        cfg = ChainTdnnfConfig(feat_dim=dim, num_pdfs=chain_tm.num_pdfs,
                               hidden_dim=128, bottleneck_dim=32,
                               prefinal_dim=64, num_layers=5,
                               subsample_layer=3,
                               frame_subsampling_factor=3)
        sub = 3
    # whole-utterance examples (no alignment to chunk by), bucketed by
    # input length rounded down to a multiple of sub
    buckets: Dict[int, List[Tuple[np.ndarray, object]]] = {}
    for u in utts:
        f = np.asarray(feats[u])
        T_in = (f.shape[0] // sub) * sub
        if T_in == 0 or (T_in // sub) < len(seqs[u]):
            continue        # too short to traverse the transcript
        g = transcript_to_e2e_numerator(seqs[u], chain_tm,
                                        optional_sil=sil)
        buckets.setdefault(T_in, []).append((f[:T_in], g))
    if not buckets:
        raise ValueError("train_chain_e2e: no usable utterances")
    log(f"chain-e2e training: {sum(len(v) for v in buckets.values())} "
        f"utterances in {len(buckets)} length buckets")

    model = ChainTdnnf(cfg, train=True)
    rng = jax.random.PRNGKey(opts.seed)
    variables = model.init(rng, jnp.zeros((2, max(buckets), dim)))
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    n_items = sum(len(v) for v in buckets.values())
    steps_per_epoch = max(1, n_items // opts.minibatch_size)
    total_steps = steps_per_epoch * opts.num_epochs
    warmup = min(max(total_steps // 20, 10), total_steps // 2 or 1)
    sched = optax.join_schedules(
        [optax.linear_schedule(opts.learning_rate * 0.1,
                               opts.learning_rate, warmup),
         optax.linear_schedule(opts.learning_rate,
                               opts.final_learning_rate,
                               max(total_steps - warmup, 1))],
        [warmup])
    tx = optax.chain(optax.clip_by_global_norm(opts.max_param_change),
                     optax.adam(sched))
    opt_state = tx.init(params)

    @jax.jit
    def step(params, batch_stats, opt_state, feats_b, num_arrays):
        def loss_fn(p, bs):
            (chain_out, xent_out), upd = model.apply(
                {"params": p, "batch_stats": bs}, feats_b,
                mutable=["batch_stats"])
            objf, aux = chain_loss(opts.chain, den_graph, num_arrays,
                                   chain_out, xent_out)
            return -objf, (aux, upd["batch_stats"])
        (loss, (aux, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch_stats)
        updates, new_opt = tx.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), new_bs, new_opt,
                -loss)

    def apply_orthonormal(params):
        def walk(tree):
            if isinstance(tree, dict):
                return {k: (jnp.asarray(constrain_orthonormal(v))
                            if k == "linear" and hasattr(v, "ndim")
                            and v.ndim == 2 else walk(v))
                        for k, v in tree.items()}
            return tree
        return walk(params)

    rng_np = np.random.default_rng(opts.seed)
    it = 0
    for epoch in range(opts.num_epochs):
        objfs = []
        for T_in, items in buckets.items():
            order = np.arange(len(items))
            rng_np.shuffle(order)
            mb = min(opts.minibatch_size, len(items))
            for i in range(0, len(order) - mb + 1, mb):
                idx = order[i:i + mb]
                feats_b = jnp.asarray(
                    np.stack([items[j][0] for j in idx]))
                num_arrays = tuple(jnp.asarray(a) for a in batch_pack(
                    [items[j][1] for j in idx]))
                params, batch_stats, opt_state, objf = step(
                    params, batch_stats, opt_state, feats_b,
                    num_arrays)
                objfs.append(float(objf))
                it += 1
                if it % opts.orthonormal_interval == 0:
                    params = apply_orthonormal(params)
        log(f"chain-e2e epoch {epoch}: objf/frame "
            f"{np.mean(objfs):.4f}")
    return (model, {"params": params, "batch_stats": batch_stats},
            den_graph, chain_tm, chain_tree)
