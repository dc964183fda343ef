"""ARPA parsing against the reference's real test files
(src/lm/test_data/*.arpa, used by arpa-file-parser-test.cc)."""

import os

import numpy as np
import pytest

from kaldi_tpu.lm.arpa import arpa_to_fst, parse_arpa

DATA = "/root/reference/src/lm/test_data"

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(DATA, "input.arpa")),
    reason="reference test_data not mounted")

LN10 = float(np.log(10.0))


def test_parse_reference_trigram():
    with open(os.path.join(DATA, "input.arpa")) as f:
        lm = parse_arpa(f.read())
    assert lm.order == 3
    # header counts honoured (ngrams is 0-indexed by order-1)
    assert len(lm.ngrams[0]) == 4
    assert len(lm.ngrams[1]) == 2
    assert len(lm.ngrams[2]) == 2
    # exact values from the file
    assert lm.ngrams[0][("a",)][0] == pytest.approx(-5.234679)
    assert lm.ngrams[0][("a",)][1] == pytest.approx(-3.3)
    assert lm.ngrams[2][("<s>", "a", "b")][0] == pytest.approx(-0.34958)
    # conditional scoring with backoff (uses the reference's semantics)
    assert lm.score_sentence_log10(["a", "b"]) == pytest.approx(
        -1.30490 + -0.34958 + -0.23940)


def test_fst_scores_exact_path():
    """Cost of '<s> a b </s>' through the compiled G must equal the
    sum of the matched n-gram log10-probs (no backoff needed)."""
    with open(os.path.join(DATA, "input.arpa")) as f:
        lm = parse_arpa(f.read())
    words = {"<eps>": 0, "a": 1, "b": 2}
    g = arpa_to_fst(lm, words)
    # walk the deterministic word path a, b then take the final weight
    expected_log10 = -1.30490 + -0.34958 + -0.23940
    cost = _path_cost(g, [1, 2])
    assert cost == pytest.approx(-expected_log10 * LN10, rel=1e-5)


def test_backoff_path_cost():
    """'<s> b' has no bigram: P(b|<s>) = backoff(<s>) + P(b)."""
    with open(os.path.join(DATA, "input.arpa")) as f:
        lm = parse_arpa(f.read())
    words = {"<eps>": 0, "a": 1, "b": 2}
    g = arpa_to_fst(lm, words)
    # P(b | <s>) = bo(<s>) * P(b) = -2.5 + -3.456783 (log10)
    # P(</s> | ... ) backs off too: from state (b): no 2-gram b </s>;
    # bo(b)=0 (absent => 0) then P(</s>) = -4.333333
    expected_log10 = (-2.5 - 3.456783) + (0.0 - 4.333333)
    cost = _path_cost(g, [2])
    assert cost == pytest.approx(-expected_log10 * LN10, rel=1e-5)


def test_edge_case_files_parse():
    for name in ("missing_backoffs.arpa", "unused_backoffs.arpa",
                 "missing_bos.arpa"):
        with open(os.path.join(DATA, name)) as f:
            lm = parse_arpa(f.read())
        assert lm.order in (3, 4)


def _path_cost(g, word_ids):
    """Total tropical cost of the given word sequence through the LM
    acceptor, taking backoff (epsilon) arcs when no match exists."""
    from kaldi_tpu.fstext.fst import EPS
    INF = 1e30

    # Dijkstra-ish over (state, position)
    import heapq
    heap = [(0.0, g.start, 0)]
    best = {}
    while heap:
        cost, s, pos = heapq.heappop(heap)
        if best.get((s, pos), INF) < cost - 1e-12:
            continue
        if pos == len(word_ids):
            fw = g.finals[s]
            from kaldi_tpu.fstext.fst import TropicalWeight
            if fw != TropicalWeight.zero:
                return cost + float(fw)
        for a in g.arcs[s]:
            if a.ilabel == EPS:
                item = (cost + float(a.weight), a.nextstate, pos)
            elif pos < len(word_ids) and a.ilabel == word_ids[pos]:
                item = (cost + float(a.weight), a.nextstate, pos + 1)
            else:
                continue
            key = (item[1], item[2])
            if item[0] < best.get(key, INF) - 1e-12:
                best[key] = item[0]
                heapq.heappush(heap, item)
    raise AssertionError("no path found")
