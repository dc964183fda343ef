"""ConstArpaLm: equivalence with the dict-based ArpaLm, file
round-trip (mmap and in-memory), and the reference's own test ARPA
(parity target: lm/const-arpa-lm.h ConstArpaLm +
lm/arpa-file-parser-test.cc fixtures)."""

import math
import os

import numpy as np
import pytest

from kaldi_tpu.lm.arpa import parse_arpa
from kaldi_tpu.lm.const_arpa import M_LN10, ConstArpaLm

DATA = "/root/reference/src/lm/test_data"


def random_arpa(rng, vocab=30, order=3, n_sent=60, max_len=8):
    """Generate a well-formed ARPA (every n-gram's context exists) by
    counting n-grams of random sentences; probs are arbitrary but the
    backoff structure is realistic (some grams pruned)."""
    words = [f"w{i}" for i in range(vocab)]
    grams = [set() for _ in range(order)]
    for _ in range(n_sent):
        sent = ["<s>"] + [words[rng.integers(vocab)]
                          for _ in range(rng.integers(1, max_len))] + ["</s>"]
        for n in range(1, order + 1):
            for i in range(len(sent) - n + 1):
                grams[n - 1].add(tuple(sent[i:i + n]))
    for w in words + ["<s>", "</s>"]:
        grams[0].add((w,))
    # prune some highest-order grams (contexts of kept grams must stay)
    top = sorted(grams[order - 1])
    keep = [g for g in top if rng.random() > 0.3]
    grams[order - 1] = set(keep)
    # closure: every context of a kept n-gram must be an (n-1)-gram
    for n in range(order, 1, -1):
        for g in grams[n - 1]:
            grams[n - 2].add(g[:-1])
    lines = ["\\data\\"]
    for n in range(1, order + 1):
        lines.append(f"ngram {n}={len(grams[n - 1])}")
    for n in range(1, order + 1):
        lines.append("")
        lines.append(f"\\{n}-grams:")
        for g in sorted(grams[n - 1]):
            lp = -0.1 - 3.0 * rng.random()
            if g == ("<s>",):
                lp = -99.0
            row = f"{lp:.4f} " + " ".join(g)
            if n < order and rng.random() > 0.2:
                row += f" {-0.05 - rng.random():.4f}"
            lines.append(row)
    lines += ["", "\\end\\", ""]
    return "\n".join(lines)


@pytest.mark.parametrize("seed,order", [(0, 2), (1, 3), (2, 4)])
def test_matches_dict_arpa(seed, order):
    rng = np.random.default_rng(seed)
    text = random_arpa(rng, order=order)
    ref = parse_arpa(text)
    import io
    lm = ConstArpaLm.build_from_arpa(io.StringIO(text))
    assert lm.order == order
    syms = lm.symbols
    vocab = [w for w in syms if w not in ("<s>", "</s>")]
    for _ in range(40):
        n = int(rng.integers(1, 9))
        sent = [vocab[rng.integers(len(vocab))] for _ in range(n)]
        want = ref.score_sentence_log10(sent) * M_LN10
        got = lm.score_sequence_ln([syms[w] for w in sent])
        assert got == pytest.approx(want, abs=1e-3), sent


def test_oov_and_step_state_flow():
    rng = np.random.default_rng(3)
    text = random_arpa(rng, order=3, vocab=10)
    import io
    lm = ConstArpaLm.build_from_arpa(io.StringIO(text))
    # OOV id scores -99*ln10 plus the backoff chain out of the <s>
    # context (exactly ArpaLm's semantics) and lands in a valid state
    ref = parse_arpa(text)
    want = -ref._cond_log10(("<s>",), "UNSEEN") * M_LN10
    s = lm.start()
    ns, cost = lm.step(s, 10 ** 6)
    assert cost == pytest.approx(want, abs=1e-3)
    assert 0 <= ns < len(lm.g_level)
    # final() equals stepping </s>
    f = lm.final(lm.start())
    _, c2 = lm.step(lm.start(), lm.eos_id)
    assert f == pytest.approx(c2)


@pytest.mark.parametrize("mmap", [True, False])
def test_file_round_trip(tmp_path, mmap):
    rng = np.random.default_rng(4)
    text = random_arpa(rng, order=3)
    import io
    lm = ConstArpaLm.build_from_arpa(io.StringIO(text))
    path = str(tmp_path / "lm.carpa")
    lm.write(path)
    lm2 = ConstArpaLm.read(path, mmap=mmap)
    assert lm2.order == lm.order
    assert lm2.num_ngrams == lm.num_ngrams
    assert lm2.symbols == lm.symbols
    assert (lm2.bos_id, lm2.eos_id) == (lm.bos_id, lm.eos_id)
    syms = lm.symbols
    vocab = list(syms)
    for _ in range(20):
        sent = [syms[vocab[rng.integers(len(vocab))]]
                for _ in range(int(rng.integers(1, 6)))]
        assert lm2.score_sequence_ln(sent) == pytest.approx(
            lm.score_sequence_ln(sent), abs=1e-4)


@pytest.mark.skipif(not os.path.exists(os.path.join(DATA, "input.arpa")),
                    reason="reference test_data not mounted")
def test_reference_golden_trigram():
    lm = ConstArpaLm.build_from_arpa(os.path.join(DATA, "input.arpa"))
    assert lm.order == 3
    assert lm.num_ngrams == [4, 2, 2]
    syms = lm.symbols
    # exact sentence from arpa-file-parser-test expectations
    want = (-1.30490 + -0.34958 + -0.23940) * M_LN10
    got = lm.score_sequence_ln([syms["a"], syms["b"]])
    assert got == pytest.approx(want, abs=1e-4)


def test_integer_word_arpa():
    text = """\\data\\
ngram 1=4
ngram 2=2

\\1-grams:
-99 1 -1.0
-1.0 2 -0.5
-1.2 3 -0.4
-1.4 4

\\2-grams:
-0.3 1 2
-0.6 2 3

\\end\\
"""
    import io
    lm = ConstArpaLm.build_from_arpa(io.StringIO(text))
    assert lm.symbols is None and lm.bos_id == -1
    lm.bos_id, lm.eos_id = 1, 4
    # P(2|1) is the explicit bigram
    _, lp = lm.logprob_ln(lm.start(), 2)
    assert lp == pytest.approx(-0.3 * M_LN10, abs=1e-5)
    # P(4|3) backs off: bo(3) + P(4)
    s3 = lm._unigram_state(3)
    _, lp = lm.logprob_ln(s3, 4)
    assert lp == pytest.approx((-0.4 + -1.4) * M_LN10, abs=1e-5)
