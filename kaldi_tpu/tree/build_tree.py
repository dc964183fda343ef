"""Decision-tree building (parity: tree/build-tree.h BuildTree,
build-tree-questions.h Questions, bin/cluster-phones + compile-questions).

Pipeline:
  accumulate_tree_stats — (event, GaussClusterable) pairs from aligned
                          data (acc-tree-stats)
  cluster_phones        — automatic question generation by bottom-up
                          agglomerative clustering of per-phone stats
  build_tree            — greedy likelihood-gain splitting over
                          (key, question) pairs, per roots spec, with
                          optional leaf clustering (cluster_thresh)
"""

from __future__ import annotations

import heapq
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Set, Tuple

import numpy as np

from kaldi_tpu.base.logging import log, warn
from kaldi_tpu.tree.clusterable import GaussClusterable, sum_clusterables
from kaldi_tpu.tree.context_dep import ContextDependency
from kaldi_tpu.tree.event_map import (PDF_CLASS_KEY, ConstantEventMap,
                                      EventMap, SplitEventMap, TableEventMap)

Event = Tuple[Tuple[int, int], ...]  # sorted ((key, value), ...)
Stats = List[Tuple[Event, GaussClusterable]]


def accumulate_tree_stats(tm, topo, feats: np.ndarray,
                          alignment: Sequence[int], N: int, P: int,
                          stats: Optional[Dict[Event, GaussClusterable]] = None,
                          ci_phones: Sequence[int] = (),
                          var_floor: float = 0.01
                          ) -> Dict[Event, GaussClusterable]:
    """acc-tree-stats: per frame, event = context window + pdf-class.
    ci_phones (e.g. silence) get context-independent events."""
    if stats is None:
        stats = {}
    ci = set(ci_phones)
    # split alignment into phones with per-frame (phone, pdf_class)
    frames = []
    phone_bounds = []  # (start, end, phone)
    cur_start = 0
    cur_phone = None
    infos = []
    for i, tid in enumerate(alignment):
        phone = tm.transition_id_to_phone(tid)
        hmm_state = tm.transition_id_to_hmm_state(tid)
        pdf_class = topo.topology_for_phone(phone)[hmm_state].forward_pdf_class
        is_start = (hmm_state == 0 and not tm.is_self_loop(tid))
        if is_start and cur_phone is not None:
            phone_bounds.append((cur_start, i, cur_phone))
            cur_start = i
        if is_start or cur_phone is None:
            cur_phone = phone
            if i == 0:
                cur_start = 0
        infos.append((phone, pdf_class))
    if cur_phone is not None:
        phone_bounds.append((cur_start, len(alignment), cur_phone))
    phone_seq = [p for _, _, p in phone_bounds]
    dim = feats.shape[1]
    for seg_idx, (start, end, phone) in enumerate(phone_bounds):
        window = []
        for offset in range(-P, N - P):
            j = seg_idx + offset
            if phone in ci and offset != 0:
                window.append(0)
            elif 0 <= j < len(phone_seq):
                window.append(phone_seq[j])
            else:
                window.append(0)
        for i in range(start, min(end, feats.shape[0])):
            _, pdf_class = infos[i]
            event_list = [(PDF_CLASS_KEY, pdf_class)]
            event_list += [(k, window[k]) for k in range(N)]
            event = tuple(sorted(event_list))
            if event not in stats:
                stats[event] = GaussClusterable(dim, var_floor)
            stats[event].add_stats(feats[i].astype(np.float64))
    return stats


def cluster_phones(stats: Dict[Event, GaussClusterable], phones: List[int],
                   P: int, max_questions: int = 40) -> List[List[int]]:
    """Question generation: agglomerative clustering of phones by their
    pooled stats (cluster-phones); every intermediate cluster becomes a
    question set, plus singletons."""
    per_phone: Dict[int, GaussClusterable] = {}
    for event, stat in stats.items():
        d = dict(event)
        phone = d.get(P)
        if phone in (None, 0):
            continue
        if phone not in per_phone:
            per_phone[phone] = stat
        else:
            per_phone[phone] = per_phone[phone].add(stat)
    active = {p: ([p], per_phone[p]) for p in phones if p in per_phone}
    questions: List[List[int]] = [sorted(v[0]) for v in active.values()]
    while len(active) > 1:
        best = None
        keys = list(active.keys())
        for i in range(len(keys)):
            for j in range(i + 1, len(keys)):
                a, b = active[keys[i]], active[keys[j]]
                d = a[1].distance(b[1])
                if best is None or d < best[0]:
                    best = (d, keys[i], keys[j])
        _, ka, kb = best
        merged = (sorted(active[ka][0] + active[kb][0]),
                  active[ka][1].add(active[kb][1]))
        del active[ka], active[kb]
        active[merged[0][0]] = merged
        questions.append(merged[0])
    # dedupe, keep at most max_questions (largest-gain first order kept)
    seen = set()
    out = []
    for q in questions:
        t = tuple(q)
        if t not in seen:
            seen.add(t)
            out.append(q)
    return out


@dataclass
class BuildTreeOptions:
    max_leaves: int = 1000
    min_gain: float = 200.0         # thresh in build-tree
    cluster_thresh: float = -1.0    # <0: no post-clustering
    var_floor: float = 0.01


def build_tree(stats: Dict[Event, GaussClusterable],
               questions: Dict[int, List[List[int]]],
               roots: List[Tuple[List[int], bool, bool]],
               N: int, P: int,
               opts: Optional[BuildTreeOptions] = None,
               topo=None) -> ContextDependency:
    """roots: list of (phone_set, shared, split) like the roots file:
    'shared' = one root for all pdf-classes of these phones, 'split' =
    allow decision-tree splitting below the root."""
    if opts is None:
        opts = BuildTreeOptions()

    # -- assign stats to roots ------------------------------------------------
    phone_to_root: Dict[int, int] = {}
    for ri, (phone_set, shared, split) in enumerate(roots):
        for p in phone_set:
            phone_to_root[p] = ri

    # leaves: each leaf = (stats subset); splitting structure per root
    class Leaf:
        __slots__ = ("events", "total", "best_split", "split_into")

        def __init__(self, events):
            self.events = events  # list of (event, stat)
            self.total = sum_clusterables([s for _, s in events])
            self.best_split = None
            self.split_into = None

    def find_best_split(leaf: Leaf):
        """Best (gain, key, yes_set, yes_events, no_events)."""
        best = None
        keys = set()
        for event, _ in leaf.events:
            keys.update(k for k, _ in event)
        for key in sorted(keys):
            qlist = questions.get(key, [])
            for q in qlist:
                qset = set(q)
                yes = [(e, s) for e, s in leaf.events
                       if dict(e).get(key) in qset]
                no = [(e, s) for e, s in leaf.events
                      if dict(e).get(key) not in qset]
                if not yes or not no:
                    continue
                objf_yes = sum_clusterables([s for _, s in yes]).objf()
                objf_no = sum_clusterables([s for _, s in no]).objf()
                gain = objf_yes + objf_no - leaf.total.objf()
                if best is None or gain > best[0]:
                    best = (gain, key, sorted(qset), yes, no)
        return best

    next_pdf = 0
    # event -> pdf assignment collected over all roots
    event_pdf: Dict[Event, int] = {}
    split_count = 0

    # process roots: first allocate roots (possibly per pdf-class if not
    # shared), then greedy global splitting across all splittable leaves
    heap = []  # (-gain, counter, leaf, root_idx); python heap
    counter = 0
    final_leaves: List[Leaf] = []

    root_groups: List[List[Leaf]] = []
    for ri, (phone_set, shared, split) in enumerate(roots):
        evs = [(e, s) for e, s in stats.items()
               if dict(e).get(P) in set(phone_set)]
        if not evs:
            warn(f"no tree stats for root {phone_set}")
            # still allocate pdfs so the tree is complete: one per
            # pdf-class (handled at the end via default map)
            root_groups.append([])
            continue
        if shared:
            groups = [evs]
        else:
            by_pc: Dict[int, list] = {}
            for e, s in evs:
                by_pc.setdefault(dict(e)[PDF_CLASS_KEY], []).append((e, s))
            groups = [v for _, v in sorted(by_pc.items())]
        leaves = [Leaf(g) for g in groups]
        root_groups.append(leaves)
        for leaf in leaves:
            if split:
                b = find_best_split(leaf)
                leaf.best_split = b
                if b is not None:
                    heapq.heappush(heap, (-b[0], counter, leaf))
                    counter += 1
            final_leaves.append(leaf)

    num_leaves = len(final_leaves)
    while heap and num_leaves < opts.max_leaves:
        neg_gain, _, leaf = heapq.heappop(heap)
        if leaf not in final_leaves:  # stale entry
            continue
        gain = -neg_gain
        if gain < opts.min_gain:
            break
        b = leaf.best_split
        if b is None:
            continue
        _, key, yes_set, yes, no = b
        final_leaves.remove(leaf)
        l_yes, l_no = Leaf(yes), Leaf(no)
        leaf.split_into = (key, yes_set, l_yes, l_no)  # type: ignore
        for child in (l_yes, l_no):
            final_leaves.append(child)
            bb = find_best_split(child)
            child.best_split = bb
            if bb is not None:
                heapq.heappush(heap, (-bb[0], counter, child))
                counter += 1
        num_leaves += 1
        split_count += 1

    # -- build event maps ------------------------------------------------------
    def leaf_to_map(leaf: Leaf) -> EventMap:
        nonlocal next_pdf
        if leaf.split_into is not None:
            key, yes_set, l_yes, l_no = leaf.split_into
            return SplitEventMap(key, yes_set, leaf_to_map(l_yes),
                                 leaf_to_map(l_no))
        pdf = next_pdf
        next_pdf += 1
        for e, _ in leaf.events:
            event_pdf[e] = pdf
        return ConstantEventMap(pdf)

    max_phone = max(phone_to_root)
    table: List[Optional[EventMap]] = [None] * (max_phone + 1)
    for ri, (phone_set, shared, split) in enumerate(roots):
        leaves = root_groups[ri]
        if not leaves:
            # allocate one pdf per pdf-class from the topology
            if topo is None:
                continue
            npc = max(topo.num_pdf_classes(p) for p in phone_set)
            sub = []
            for _ in range(npc):
                sub.append(ConstantEventMap(next_pdf))
                next_pdf += 1
            em = TableEventMap(PDF_CLASS_KEY, sub)
        elif len(leaves) == 1:
            em = leaf_to_map(leaves[0])
        else:
            # one entry per pdf-class (not-shared roots)
            sub = [leaf_to_map(l) for l in leaves]
            em = TableEventMap(PDF_CLASS_KEY, sub)
        for p in phone_set:
            table[p] = em
    log(f"build_tree: {next_pdf} leaves after {split_count} splits")
    return ContextDependency(N, P, TableEventMap(P, table))
