"""Neural-LM lattice rescoring tail + prons + KWS proxies +
online2 i-vectors."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from kaldi_tpu.cli import get_tool
from kaldi_tpu.lat.kaldi_lattice import LatticeHolder
from kaldi_tpu.util import kaldi_io
from kaldi_tpu.util.table import SequentialTableReader, TableWriter

from test_cli_rnnlm import rnnlm_env  # noqa: F401  (module fixture)


def _two_path_lattice():
    from kaldi_tpu.fstext.fst import Arc, LatticeWeight, VectorFst
    lat = VectorFst(LatticeWeight)
    s0 = lat.add_state()
    lat.set_start(s0)
    a1, a2 = lat.add_state(), lat.add_state()
    b1, b2 = lat.add_state(), lat.add_state()
    lat.add_arc(s0, Arc(1, 3, (0.0, 0.0), a1))
    lat.add_arc(a1, Arc(2, 4, (0.0, 0.0), a2))
    lat.set_final(a2, (0.0, 0.0))
    lat.add_arc(s0, Arc(1, 4, (0.0, 0.0), b1))
    lat.add_arc(b1, Arc(2, 3, (0.0, 0.0), b2))
    lat.set_final(b2, (0.0, 0.0))
    return lat


def test_lmrescore_rnnlm_and_pruned(rnnlm_env, tmp_path):
    d = rnnlm_env
    from kaldi_tpu.lat.functions import lattice_best_path
    with TableWriter(LatticeHolder(), f"ark:{tmp_path}/lat.ark") as w:
        w.write("u1", _two_path_lattice())
    with open(f"{tmp_path}/words.txt", "w") as f:
        for i in range(8):
            f.write(f"w{i} {i}\n")
    assert get_tool("lattice-lmrescore-rnnlm")([
        "lattice-lmrescore-rnnlm", "--lm-scale=1.0",
        f"{tmp_path}/words.txt", f"ark:{tmp_path}/lat.ark",
        f"{d}/lm.npz", f"ark:{tmp_path}/out.ark"]) == 0
    out = dict(SequentialTableReader(LatticeHolder(),
                                     f"ark:{tmp_path}/out.ark"))["u1"]
    _a, words, cost = lattice_best_path(out)
    assert words == [3, 4] and cost > 0
    # pruned variant: subtract a uniform ARPA, add the RNNLM
    arpa = """\\data\\
ngram 1=5

\\1-grams:
-0.69897 3
-0.69897 4
-0.69897 5
-0.9 <s>
-0.9 </s>

\\end\\
"""
    open(f"{tmp_path}/old.arpa", "w").write(arpa)
    with open(f"{tmp_path}/words2.txt", "w") as f:
        f.write("<eps> 0\n<s> 1\n</s> 2\n3 3\n4 4\n5 5\n")
    assert get_tool("lattice-lmrescore-kaldi-rnnlm-pruned")([
        "lattice-lmrescore-kaldi-rnnlm-pruned", "--lm-scale=1.0",
        f"{tmp_path}/old.arpa", f"{tmp_path}/words2.txt",
        f"{d}/lm.npz", f"ark:{tmp_path}/lat.ark",
        f"ark:{tmp_path}/pruned.ark"]) == 0
    pr = dict(SequentialTableReader(LatticeHolder(),
                                    f"ark:{tmp_path}/pruned.ark"))["u1"]
    _a2, words2, cost2 = lattice_best_path(pr)
    assert words2 == [3, 4]


def test_add_nnlmscore(tmp_path):
    from kaldi_tpu.lat.functions import lattice_best_path
    lat = _two_path_lattice()
    with TableWriter(LatticeHolder(), f"ark:{tmp_path}/lat.ark") as w:
        w.write("u1", lat)
    # find the state ids of the [3,4] path's first arc vs [4,3]'s,
    # then penalize the [3,4] path so the best flips
    with open(f"{tmp_path}/scores.txt", "w") as f:
        f.write("u1 0 1 5.0\n")      # arc s0->a1 (word 3)
    assert get_tool("lattice-add-nnlmscore")([
        "lattice-add-nnlmscore", "--lm-scale=1.0",
        f"ark:{tmp_path}/lat.ark", f"{tmp_path}/scores.txt",
        f"ark:{tmp_path}/out.ark"]) == 0
    out = dict(SequentialTableReader(LatticeHolder(),
                                     f"ark:{tmp_path}/out.ark"))["u1"]
    _a, words, _c = lattice_best_path(out)
    assert words == [4, 3]


def test_phones_to_prons_and_wordali(tmp_path):
    from kaldi_tpu.fstext.fst import Arc, TropicalWeight, VectorFst
    from kaldi_tpu.fstext.openfst_io import write_fst
    # L_align: word 10 -> #1 7 8 #2 ; word 11 -> #1 9 #2 ; sil: 5
    WS, WE = 100, 101
    L = VectorFst(TropicalWeight)
    root = L.add_state()
    L.set_start(root)
    L.set_final(root, 0.0)

    def add_pron(word, phones):
        cur = root
        labels = [WS] + phones + [WE]
        for i, p in enumerate(labels):
            nxt = root if i == len(labels) - 1 else L.add_state()
            L.add_arc(cur, Arc(p, word if i == 0 else 0, 0.0, nxt))
            cur = nxt

    add_pron(10, [7, 8])
    add_pron(11, [9])
    # optional silence (word 0, no markers)
    s = L.add_state()
    L.add_arc(root, Arc(5, 0, 0.0, root))
    _ = s
    with open(f"{tmp_path}/L_align.fst", "wb") as f:
        write_fst(f, L)
    with TableWriter("int-vector", f"ark:{tmp_path}/phones.ark") as w:
        w.write("u1", np.asarray([5, 7, 8, 5, 9], np.int32))
    with TableWriter("int-vector", f"ark:{tmp_path}/words.ark") as w:
        w.write("u1", np.asarray([10, 11], np.int32))
    assert get_tool("phones-to-prons")([
        "phones-to-prons", f"{tmp_path}/L_align.fst", str(WS),
        str(WE), f"ark:{tmp_path}/phones.ark",
        f"ark:{tmp_path}/words.ark", f"ark:{tmp_path}/prons.ark"]) == 0
    prons = dict(SequentialTableReader("int-vector-vector",
                                       f"ark:{tmp_path}/prons.ark"))
    rows = [[int(x) for x in row] for row in prons["u1"]]
    assert rows == [[0, 5], [10, 7, 8], [0, 5], [11, 9]]
    # word alignment from phone lengths
    with TableWriter("int-pair-vector",
                     f"ark:{tmp_path}/plen.ark") as w:
        w.write("u1", [(5, 3), (7, 4), (8, 2), (5, 1), (9, 6)])
    assert get_tool("prons-to-wordali")([
        "prons-to-wordali", f"ark:{tmp_path}/prons.ark",
        f"ark:{tmp_path}/plen.ark", f"ark:{tmp_path}/wali.ark"]) == 0
    wali = dict(SequentialTableReader("int-pair-vector",
                                      f"ark:{tmp_path}/wali.ark"))
    assert [(int(a), int(b)) for a, b in wali["u1"]] == \
        [(0, 3), (10, 6), (0, 1), (11, 6)]
    # per-frame mode
    assert get_tool("prons-to-wordali")([
        "prons-to-wordali", "--per-frame=true",
        f"ark:{tmp_path}/prons.ark", f"ark:{tmp_path}/plen.ark",
        f"ark:{tmp_path}/pf.ark"]) == 0
    pf = dict(SequentialTableReader("int-vector",
                                    f"ark:{tmp_path}/pf.ark"))
    assert list(pf["u1"]) == [0] * 3 + [10] * 6 + [0] + [11] * 6


def test_proxy_keywords(tmp_path):
    from kaldi_tpu.fstext.fst import Arc, TropicalWeight, VectorFst
    from kaldi_tpu.fstext.openfst_io import write_fst
    # L2xE: identity on words 1..3 plus a cheap confusion 1->2
    t = VectorFst(TropicalWeight)
    s = t.add_state()
    t.set_start(s)
    t.set_final(s, 0.0)
    for w in (1, 2, 3):
        t.add_arc(s, Arc(w, w, 0.0, s))
    t.add_arc(s, Arc(1, 2, 1.0, s))     # proxy: 1 may become 2
    with open(f"{tmp_path}/L2xE.fst", "wb") as f:
        write_fst(f, t)
    # L1' (inverted small lexicon): identity here
    ident = VectorFst(TropicalWeight)
    s2 = ident.add_state()
    ident.set_start(s2)
    ident.set_final(s2, 0.0)
    for w in (1, 2, 3):
        ident.add_arc(s2, Arc(w, w, 0.0, s2))
    with open(f"{tmp_path}/L1inv.fst", "wb") as f:
        write_fst(f, ident)
    with TableWriter("int-vector", f"ark:{tmp_path}/kw.ark") as w:
        w.write("kw1", np.asarray([1, 3], np.int32))
    assert get_tool("generate-proxy-keywords")([
        "generate-proxy-keywords", "--proxy-beam=5",
        f"{tmp_path}/L2xE.fst", f"{tmp_path}/L1inv.fst",
        f"ark:{tmp_path}/kw.ark", f"ark:{tmp_path}/proxy.ark"]) == 0
    assert get_tool("print-proxy-keywords")([
        "print-proxy-keywords", f"ark:{tmp_path}/proxy.ark",
        f"{tmp_path}/kwlist.txt"]) == 0
    lines = open(f"{tmp_path}/kwlist.txt").read().splitlines()
    seqs = {tuple(ln.split()[2:]) for ln in lines}
    assert ("1", "3") in seqs and ("2", "3") in seqs


def test_ivector_extract_online2(tmp_path):
    # train a tiny extractor via the CLI ladder
    rng = np.random.default_rng(0)
    feats = {f"u{i}": rng.normal(size=(40, 5)).astype(np.float32)
             for i in range(3)}
    with TableWriter("matrix", f"ark:{tmp_path}/feats.ark") as w:
        for u in sorted(feats):
            w.write(u, feats[u])
    from kaldi_tpu.gmm.diag_gmm import DiagGmm
    allx = np.concatenate(list(feats.values()))
    ubm = DiagGmm(2, 5)
    ubm.set_from_means_and_vars(
        np.ones(2) / 2, allx[rng.choice(len(allx), 2, replace=False)],
        np.tile(allx.var(0) + 1e-2, (2, 1)))
    ubm.compute_gconsts()
    kaldi_io.write_kaldi_object(ubm.write, f"{tmp_path}/ubm")
    assert get_tool("ivector-extractor-init")([
        "ivector-extractor-init", "--ivector-dim=3",
        f"{tmp_path}/ubm", f"{tmp_path}/0.ie"]) == 0
    with open(f"{tmp_path}/spk2utt", "w") as f:
        f.write("spk " + " ".join(sorted(feats)) + "\n")
    assert get_tool("ivector-extract-online2")([
        "ivector-extract-online2", "--ivector-period=10",
        f"ark,t:{tmp_path}/spk2utt", f"{tmp_path}/0.ie",
        f"ark:{tmp_path}/feats.ark", f"ark:{tmp_path}/ivec.ark"]) == 0
    ivecs = dict(SequentialTableReader("matrix",
                                       f"ark:{tmp_path}/ivec.ark"))
    assert set(ivecs) == set(feats)
    for u, m in ivecs.items():
        assert m.shape == (4, 3)            # 40 frames / period 10
        assert np.isfinite(m).all()
    # speaker carry-over: the LAST utterance's first ivector differs
    # from a fresh per-utterance run (stats are primed)
    with open(f"{tmp_path}/one2one", "w") as f:
        for u in sorted(feats):
            f.write(f"{u} {u}\n")
    assert get_tool("ivector-extract-online2")([
        "ivector-extract-online2", "--ivector-period=10",
        f"ark,t:{tmp_path}/one2one", f"{tmp_path}/0.ie",
        f"ark:{tmp_path}/feats.ark", f"ark:{tmp_path}/fresh.ark"]) == 0
    fresh = dict(SequentialTableReader("matrix",
                                       f"ark:{tmp_path}/fresh.ark"))
    last = sorted(feats)[-1]
    assert not np.allclose(ivecs[last][0], fresh[last][0])
