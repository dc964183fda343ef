"""CLI fst-tool tests (fstbin/ parity: fstaddselfloops,
fstphicompose, fstisstochastic, fst archive tools, arpa2fst)."""

import math
import os
import subprocess
import sys

import numpy as np
import pytest

from kaldi_tpu.fstext.fst import Arc, TropicalWeight, VectorFst
from kaldi_tpu.fstext.openfst_io import read_fst_file, write_fst


def run_tool(args, cwd):
    env = dict(os.environ, PYTHONPATH=os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    return subprocess.run(
        [sys.executable, "-m", "kaldi_tpu.cli"] + args,
        cwd=cwd, env=env, capture_output=True, text=True)


def write_text_fst(path, text):
    with open(path, "w") as f:
        f.write(text)


def test_fst_archive_roundtrip(tmp_path):
    """transcripts-to-fsts -> fsts-to-transcripts is identity."""
    (tmp_path / "tra.txt").write_text("utt1 1 2 3\nutt2 2 2\n")
    r = run_tool(["transcripts-to-fsts", "ark,t:tra.txt",
                  "ark:tf.ark"], tmp_path)
    assert r.returncode == 0, r.stderr
    r = run_tool(["fsts-to-transcripts", "ark:tf.ark", "ark,t:out.txt"],
                 tmp_path)
    assert r.returncode == 0, r.stderr
    out = (tmp_path / "out.txt").read_text().strip().splitlines()
    assert out == ["utt1 1 2 3", "utt2 2 2"]


def test_fsts_concat(tmp_path):
    (tmp_path / "tra.txt").write_text("u 1 2\n")
    run_tool(["transcripts-to-fsts", "ark,t:tra.txt", "ark:a.ark"],
             tmp_path)
    r = run_tool(["fsts-concat", "ark:a.ark", "ark:a.ark", "ark:c.ark"],
                 tmp_path)
    assert r.returncode == 0, r.stderr
    r = run_tool(["fsts-to-transcripts", "ark:c.ark", "ark,t:-"],
                 tmp_path)
    assert r.stdout.split() == ["u", "1", "2", "1", "2"]


def test_fstaddselfloops(tmp_path):
    """Loops appear exactly on final states and states with non-eps
    olabel out-arcs (pre-determinize-inl.h:601)."""
    fst = VectorFst(TropicalWeight)
    s0, s1, s2 = (fst.add_state() for _ in range(3))
    fst.set_start(s0)
    fst.add_arc(s0, Arc(1, 1, 0.5, s1))     # s0 has non-eps olabel
    fst.add_arc(s1, Arc(2, 0, 0.5, s2))     # s1 has only eps olabels
    fst.set_final(s2, 1.0)                  # s2 final
    with open(tmp_path / "in.fst", "wb") as f:
        write_fst(f, fst)
    (tmp_path / "in.list").write_text("3\n")
    (tmp_path / "out.list").write_text("5\n")
    r = run_tool(["fstaddselfloops", "in.list", "out.list", "in.fst",
                  "out.fst"], tmp_path)
    assert r.returncode == 0, r.stderr
    out = read_fst_file(str(tmp_path / "out.fst"))
    loops = {s: [(a.ilabel, a.olabel) for a in out.arcs[s]
                 if a.nextstate == s]
             for s in range(out.num_states)}
    assert loops[s0] == [(3, 5)]
    assert loops[s1] == []
    assert loops[s2] == [(3, 5)]


def test_fstisstochastic(tmp_path):
    text = (f"0 1 1 1 {math.log(2):.6f}\n"
            f"0 2 2 2 {math.log(2):.6f}\n1 0.0\n2 0.0\n")
    write_text_fst(tmp_path / "st.txt", text)
    run_tool(["fstcompile", "st.txt", "st.fst"], tmp_path)
    r = run_tool(["fstisstochastic", "st.fst"], tmp_path)
    assert r.returncode == 0, r.stdout + r.stderr
    write_text_fst(tmp_path / "ns.txt", "0 1 1 1 0.9\n1 0.5\n")
    run_tool(["fstcompile", "ns.txt", "ns.fst"], tmp_path)
    r = run_tool(["fstisstochastic", "ns.fst"], tmp_path)
    assert r.returncode == 1


def test_fstphicompose_matches_backoff_semantics(tmp_path):
    """phi composition = composing with the phi arcs expanded as real
    epsilons would double-count; with phi semantics the backoff path
    is taken only when no explicit match exists."""
    # fst2: state0 explicit 1:1 @0.1; phi(99) @0.3 -> state1 with
    # 1:1 @9.9 and 2:2 @0.4
    write_text_fst(tmp_path / "g.txt",
                   "0 1 1 1 0.1\n0 2 99 0 0.3\n2 2 1 1 9.9\n"
                   "2 2 2 2 0.4\n1 0.0\n2 0.5\n")
    run_tool(["fstcompile", "g.txt", "g.fst"], tmp_path)
    # input "1": explicit match, NOT the backoff (0.1, not 0.3+9.9)
    write_text_fst(tmp_path / "i1.txt", "0 1 1 1 0.0\n1 0.0\n")
    run_tool(["fstcompile", "i1.txt", "i1.fst"], tmp_path)
    r = run_tool(["fstphicompose", "99", "i1.fst", "g.fst", "o1.fst"],
                 tmp_path)
    assert r.returncode == 0, r.stderr
    o1 = read_fst_file(str(tmp_path / "o1.fst"))
    from kaldi_tpu.fstext.ops import shortest_distance
    d = shortest_distance(o1, reverse=True)
    assert abs(d[o1.start] - 0.1) < 1e-5
    # input "2": only reachable through the phi arc (0.3 + 0.4 + 0.5)
    write_text_fst(tmp_path / "i2.txt", "0 1 2 2 0.0\n1 0.0\n")
    run_tool(["fstcompile", "i2.txt", "i2.fst"], tmp_path)
    run_tool(["fstphicompose", "99", "i2.fst", "g.fst", "o2.fst"],
             tmp_path)
    o2 = read_fst_file(str(tmp_path / "o2.fst"))
    d = shortest_distance(o2, reverse=True)
    assert abs(d[o2.start] - (0.3 + 0.4 + 0.5)) < 1e-5


def test_arpa2fst_scores_match_arpa(tmp_path):
    """Sentence cost through G.fst == ArpaLm backoff score."""
    arpa = """
\\data\\
ngram 1=4
ngram 2=2

\\1-grams:
-0.60206 </s>
-99 <s> -0.30103
-0.47712 a -0.30103
-0.47712 b -0.30103

\\2-grams:
-0.30103 <s> a
-0.30103 a b

\\end\\
"""
    (tmp_path / "lm.arpa").write_text(arpa)
    (tmp_path / "words.txt").write_text(
        "<eps> 0\na 1\nb 2\n<s> 3\n</s> 4\n#0 5\n")
    r = run_tool(["arpa2fst", "--disambig-symbol=#0",
                  "--read-symbol-table=words.txt", "lm.arpa", "G.fst"],
                 tmp_path)
    assert r.returncode == 0, r.stderr
    g = read_fst_file(str(tmp_path / "G.fst"))
    # relabel #0 -> eps so plain composition treats backoff as free
    for arcs in g.arcs:
        for a in arcs:
            if a.ilabel == 5:
                a.ilabel = 0
            if a.olabel == 5:
                a.olabel = 0
    from kaldi_tpu.decoder.graph import make_linear_word_acceptor
    from kaldi_tpu.fstext.ops import arcsort, compose, shortest_distance
    from kaldi_tpu.lm.arpa import parse_arpa
    lm = parse_arpa(arpa)
    for sent in (["a", "b"], ["b"], ["a", "a"]):
        ids = [{"a": 1, "b": 2}[w] for w in sent]
        acc = make_linear_word_acceptor(ids)
        comp = compose(arcsort(acc, "olabel"), g)
        d = shortest_distance(comp, reverse=True)
        got = d[comp.start] if comp.start >= 0 else float("inf")
        want = -lm.score_sentence_log10(sent) * math.log(10.0)
        assert got == pytest.approx(want, abs=1e-4), sent


def test_make_pdf_to_tid_transducer(tmp_path):
    from kaldi_tpu.hmm.topology import HmmTopology
    from kaldi_tpu.hmm.transition_model import TransitionModel
    from kaldi_tpu.tree import monophone_context_dependency
    from kaldi_tpu.util import kaldi_io
    topo = HmmTopology.chain_topology([1, 2, 3])
    tree = monophone_context_dependency([1, 2, 3],
                                        {p: 2 for p in [1, 2, 3]})
    tm = TransitionModel(topo, tree)
    kaldi_io.write_kaldi_object(tm.write, str(tmp_path / "x.mdl"),
                                binary=True)
    r = run_tool(["make-pdf-to-tid-transducer", "x.mdl", "p2t.fst"],
                 tmp_path)
    assert r.returncode == 0, r.stderr
    fst = read_fst_file(str(tmp_path / "p2t.fst"))
    assert fst.num_states == 1
    assert len(fst.arcs[0]) == tm.num_transition_ids
    for a in fst.arcs[0]:
        assert a.ilabel == tm.transition_id_to_pdf(a.olabel) + 1
