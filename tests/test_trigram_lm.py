"""TrigramBackoffLm: estimator normalization, minimized ARPA state
machine (states only for trigram contexts), state-machine scoring,
bigram-wrapper equivalence, ARPA round trip."""

import math

import numpy as np
import pytest

from kaldi_tpu.lm.bigram import BigramBackoffLm
from kaldi_tpu.lm.trigram import BIG, TrigramBackoffLm


def _corpus(rng, V=8, n=200, length=6):
    words = [f"w{i}" for i in range(V)]
    probs = rng.dirichlet(np.ones(V) * 0.5)
    sents = []
    for _ in range(n):
        L = int(rng.integers(1, length))
        sents.append([words[int(rng.choice(V, p=probs))]
                      for _ in range(L)])
    return words, sents


def _explicit_bi(lm, u, w):
    """Explicit -ln P(w|u) if present, else None.  Folded arcs carry
    the dead destination state's bo2 which is 0 by construction."""
    m = (lm.fold_src == u) & (lm.fold_dst == w)
    if m.any():
        return float(lm.fold_cost[m].min())
    m = (lm.pair_u == u) & (lm.pair_v == w)
    idx = np.nonzero(m)[0]
    if len(idx) and lm.ent_bi_cost[idx].min() < BIG / 2:
        return float(lm.ent_bi_cost[idx].min())
    return None


def _p_bi(lm, u, w):
    e = _explicit_bi(lm, u, w)
    if e is not None:
        return math.exp(-e)
    return math.exp(-(lm.bo1[u] + lm.uni[w]))


@pytest.mark.parametrize("prune_tri", [1, 2])
def test_normalization(prune_tri):
    """sum_w P(w|ctx) + P(</s>|ctx) == 1 for every state, including
    with trigram pruning (pruned mass must return to backoff)."""
    rng = np.random.default_rng(0)
    words, sents = _corpus(rng)
    lm = TrigramBackoffLm.from_counts(sents, vocab=words,
                                      prune_bi=1, prune_tri=prune_tri)
    V = lm.V
    tot = sum(math.exp(-lm.uni[w]) for w in range(V)) \
        + math.exp(-lm.eos_uni)
    assert abs(tot - 1.0) < 1e-6
    for u in range(V + 1):
        tot = sum(_p_bi(lm, u, w) for w in range(V))
        tot += math.exp(-lm.eos_bi[u]) if lm.eos_bi[u] < BIG / 2 \
            else math.exp(-(lm.bo1[u] + lm.eos_uni))
        assert abs(tot - 1.0) < 1e-5, u
    for sp in range(lm.SP):
        v = int(lm.pair_v[sp])
        tri_here = {}
        for e in np.nonzero(lm.tri_src == sp)[0]:
            d = int(lm.tri_dst[e])
            w = int(lm.pair_v[d]) if d < lm.SP else d - lm.SP
            tri_here[w] = float(lm.tri_cost[e])
        tot = 0.0
        for w in range(V):
            if w in tri_here:
                tot += math.exp(-tri_here[w])
            else:
                tot += math.exp(-lm.bo2[sp]) * _p_bi(lm, v, w)
        if lm.eos_tri[sp] < BIG / 2:
            tot += math.exp(-lm.eos_tri[sp])
        else:
            pe = math.exp(-lm.eos_bi[v]) if lm.eos_bi[v] < BIG / 2 \
                else math.exp(-(lm.bo1[v] + lm.eos_uni))
            tot += math.exp(-lm.bo2[sp]) * pe
        assert abs(tot - 1.0) < 1e-5, (sp, tot)


def test_states_minimized():
    """Pair states exist ONLY for contexts with explicit trigram
    continuations (ArpaLmCompiler's reachable construction)."""
    rng = np.random.default_rng(0)
    words, sents = _corpus(rng)
    lm = TrigramBackoffLm.from_counts(sents, vocab=words,
                                      prune_bi=1, prune_tri=2)
    for sp in range(lm.SP):
        has_tri = bool((lm.tri_src == sp).any()) or \
            lm.eos_tri[sp] < BIG / 2
        assert has_tri, f"pair state {sp} distinguishes nothing"
    # dead contexts fold with backoff weight 1 (cost 0), so folded
    # bigram costs equal the plain bigram costs
    assert len(lm.fold_src) > 0


def test_sentence_cost_finite():
    rng = np.random.default_rng(1)
    words, sents = _corpus(rng)
    lm = TrigramBackoffLm.from_counts(sents, vocab=words)
    wid = {w: i for i, w in enumerate(words)}
    for s in sents[:20]:
        c = lm.sentence_cost([wid[w] for w in s])
        assert np.isfinite(c) and c > 0


def test_bigram_wrapper_matches_bigram_scores():
    rng = np.random.default_rng(2)
    words, sents = _corpus(rng, V=6)
    bg = BigramBackoffLm.from_counts(sents, vocab=words)
    tg = TrigramBackoffLm.from_bigram(bg)
    assert tg.SP == 0          # no trigram level -> no pair states
    wid = {w: i for i, w in enumerate(words)}
    for s in sents[:15]:
        ids = [wid[w] for w in s]
        ref = 0.0
        prev = bg.V
        for w in ids:
            ref += bg.cost(prev, w)
            prev = w
        ref += float(bg.eos[prev])
        got = tg.sentence_cost(ids)
        assert abs(got - ref) < 1e-4, (s, got, ref)


def test_trigram_beats_bigram_nll_on_structured_text():
    """Held-out NLL: on text with real second-order structure the
    trigram must model held-out data better than its bigram level."""
    rng = np.random.default_rng(9)
    words = [f"w{i}" for i in range(12)]
    # second-order process: successor determined by the PAIR
    pairs = {}
    prng = np.random.default_rng(5)
    def nxt(u, v):
        if (u, v) not in pairs:
            pairs[(u, v)] = int(prng.integers(12))
        return pairs[(u, v)]
    def gen(n):
        out = []
        for _ in range(n):
            s = [int(rng.integers(12)), int(rng.integers(12))]
            for _ in range(6):
                s.append(nxt(s[-2], s[-1]) if rng.random() < 0.7
                         else int(rng.integers(12)))
            out.append([words[i] for i in s])
        return out
    train, test = gen(800), gen(100)
    lm3 = TrigramBackoffLm.from_counts(train, vocab=words, prune_tri=2)
    bg = BigramBackoffLm.from_counts(train, vocab=words)
    lm2 = TrigramBackoffLm.from_bigram(bg)
    wid = {w: i for i, w in enumerate(words)}
    n3 = n2 = nw = 0.0
    for s in test:
        ids = [wid[w] for w in s]
        n3 += lm3.sentence_cost(ids)
        n2 += lm2.sentence_cost(ids)
        nw += len(ids) + 1
    print(f"held-out NLL/word: trigram {n3/nw:.3f} bigram {n2/nw:.3f}")
    assert n3 / nw < n2 / nw - 0.1


def test_from_arpa_roundtrip_scores():
    """Estimate -> write ARPA -> parse -> scores match."""
    rng = np.random.default_rng(3)
    words, sents = _corpus(rng, V=6, n=120)
    lm = TrigramBackoffLm.from_counts(sents, vocab=words,
                                      prune_bi=1, prune_tri=1)
    l10 = math.log(10)
    lines = ["\\data\\"]
    uni_rows = [(f"{-lm.uni[w] / l10:.6f}", words[w],
                 f"{-lm.bo1[w] / l10:.6f}") for w in range(lm.V)]
    bi_rows = []
    for e in range(len(lm.fold_src)):
        u = int(lm.fold_src[e])
        un = "<s>" if u == lm.V else words[u]
        bi_rows.append((f"{-lm.fold_cost[e] / l10:.6f}",
                        f"{un} {words[int(lm.fold_dst[e])]}", None))
    for sp in range(lm.SP):
        if lm.ent_bi_cost[sp] < BIG / 2:
            u = int(lm.pair_u[sp])
            un = "<s>" if u == lm.V else words[u]
            bi_rows.append((f"{-lm.ent_bi_cost[sp] / l10:.6f}",
                            f"{un} {words[int(lm.pair_v[sp])]}",
                            f"{-lm.bo2[sp] / l10:.6f}"))
    for u in range(lm.V + 1):
        if lm.eos_bi[u] < BIG / 2:
            un = "<s>" if u == lm.V else words[u]
            bi_rows.append((f"{-lm.eos_bi[u] / l10:.6f}",
                            f"{un} </s>", None))
    tri_rows = []
    for e in range(lm.num_explicit_tri):
        sp = int(lm.tri_src[e])
        u = int(lm.pair_u[sp])
        un = "<s>" if u == lm.V else words[u]
        vn = words[int(lm.pair_v[sp])]
        d = int(lm.tri_dst[e])
        wn = words[int(lm.pair_v[d]) if d < lm.SP else d - lm.SP]
        tri_rows.append((f"{-lm.tri_cost[e] / l10:.6f}",
                         f"{un} {vn} {wn}"))
    for sp in range(lm.SP):
        if lm.eos_tri[sp] < BIG / 2:
            u = int(lm.pair_u[sp])
            un = "<s>" if u == lm.V else words[u]
            tri_rows.append((f"{-lm.eos_tri[sp] / l10:.6f}",
                             f"{un} {words[int(lm.pair_v[sp])]} </s>"))
    lines += [f"ngram 1={lm.V + 2}", f"ngram 2={len(bi_rows)}",
              f"ngram 3={len(tri_rows)}", "", "\\1-grams:"]
    lines.append(f"{-lm.eos_uni / l10:.6f} </s>")
    lines.append(f"-99 <s> {-lm.bo1[lm.V] / l10:.6f}")
    for lp, w, b in uni_rows:
        lines.append(f"{lp} {w} {b}")
    lines += ["", "\\2-grams:"]
    for lp, ng, b in bi_rows:
        lines.append(f"{lp} {ng} {b}" if b is not None else f"{lp} {ng}")
    lines += ["", "\\3-grams:"]
    for lp, ng in tri_rows:
        lines.append(f"{lp} {ng}")
    lines += ["", "\\end\\"]
    from kaldi_tpu.lm.arpa import parse_arpa
    arpa = parse_arpa("\n".join(lines))
    lm2 = TrigramBackoffLm.from_arpa(arpa, vocab=words)
    wid = {w: i for i, w in enumerate(words)}
    for s in sents[:10]:
        ids = [wid[w] for w in s]
        a = lm.sentence_cost(ids)
        b = lm2.sentence_cost(ids)
        assert abs(a - b) < 2e-3, (s, a, b)
