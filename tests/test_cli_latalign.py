"""Lattice alignment tail: word/phone alignment of linear lattices
(word-boundary and lexicon routes), nbest-to-prons, lattice
difference/expand/path-cover, compactlattice44 round-trip."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from kaldi_tpu.cli import get_tool
from kaldi_tpu.lat.kaldi_lattice import (CompactLatticeHolder,
                                         LatticeHolder)
from kaldi_tpu.util import kaldi_io
from kaldi_tpu.util.table import SequentialTableReader, TableWriter


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    from test_mono_e2e import FS, make_corpus, unigram_g
    from kaldi_tpu.cli.gmm_tools import write_am_gmm
    from kaldi_tpu.decoder.graph import Lang
    from kaldi_tpu.feat.frontend import MfccOptions, OfflineFeature
    from kaldi_tpu.feat.window import FrameExtractionOptions
    from kaldi_tpu.fstext.openfst_io import write_fst
    from kaldi_tpu.recipes.mono import (TrainMonoOptions, make_hclg,
                                        train_mono)
    d = tmp_path_factory.mktemp("latalign")
    train_txt, train_wav, test_txt, test_wav = make_corpus(
        num_train=8, num_test=3)
    comp = OfflineFeature(MfccOptions(
        frame_opts=FrameExtractionOptions(samp_freq=FS, dither=0.0)))
    tf = dict(zip(train_wav, comp.compute_batch(list(train_wav.values()))))
    sf = dict(zip(test_wav, comp.compute_batch(list(test_wav.values()))))
    lang = Lang({"YES": [["Y"]], "NO": [["N"]]}, sil_phone="SIL",
                sil_prob=0.5)
    lang.make_topology()
    sys_ = train_mono(lang, tf, train_txt,
                      TrainMonoOptions(num_iters=4, totgauss=24,
                                       realign_iters=(1, 2, 3)))
    write_am_gmm(f"{d}/final.mdl", sys_.tm, sys_.am)
    with open(f"{d}/HCLG.fst", "wb") as f:
        write_fst(f, make_hclg(sys_, unigram_g(lang)))
    with TableWriter("matrix", f"ark:{d}/test_feats.ark") as w:
        for u in sorted(sf):
            w.write(u, sf[u])
    # word-boundary file: single-phone words are singletons, SIL nonword
    with open(f"{d}/word_boundary.int", "w") as f:
        f.write(f"{lang.phones['Y']} singleton\n")
        f.write(f"{lang.phones['N']} singleton\n")
        f.write(f"{lang.phones['SIL']} nonword\n")
    # align lexicon: word-in word-out phones (0 0 SIL = optional sil)
    with open(f"{d}/align_lexicon.int", "w") as f:
        f.write(f"{lang.words['YES']} {lang.words['YES']} "
                f"{lang.phones['Y']}\n")
        f.write(f"{lang.words['NO']} {lang.words['NO']} "
                f"{lang.phones['N']}\n")
        f.write(f"0 0 {lang.phones['SIL']}\n")
    # decode to raw lattices, then 1-best linear lattices
    assert get_tool("gmm-latgen-faster")([
        "gmm-latgen-faster", "--acoustic-scale=0.1", "--beam=16",
        "--determinize-lattice=false", f"{d}/final.mdl",
        f"{d}/HCLG.fst", f"ark:{d}/test_feats.ark",
        f"ark:{d}/raw.lat"]) == 0
    assert get_tool("lattice-1best")([
        "lattice-1best", "--acoustic-scale=0.1", f"ark:{d}/raw.lat",
        f"ark:{d}/best.lat"]) == 0
    return dict(d=str(d), sys=sys_, sf=sf, lang=lang,
                test_txt=test_txt)


def _frames_of(sf):
    return {u: f.shape[0] for u, f in sf.items()}


def test_align_words_boundary(env, tmp_path):
    d = env["d"]
    lang = env["lang"]
    assert get_tool("lattice-align-words")([
        "lattice-align-words", f"{d}/word_boundary.int",
        f"{d}/final.mdl", f"ark:{d}/best.lat",
        f"ark:{tmp_path}/aligned.lat"]) == 0
    clats = dict(SequentialTableReader(CompactLatticeHolder(),
                                       f"ark:{tmp_path}/aligned.lat"))
    tm = env["sys"].tm
    frames = _frames_of(env["sf"])
    for u, ref in env["test_txt"].items():
        clat = clats[u]
        # walk the linear compact lattice
        s = clat.start
        words = []
        tot = 0
        while clat.arcs[s]:
            assert len(clat.arcs[s]) == 1
            a = clat.arcs[s][0]
            _lw, tids = a.weight
            assert tids, "every aligned arc carries frames"
            # all tids of an arc belong to one phone run whose word
            # matches the label type
            phones = {tm.transition_id_to_phone(t) for t in tids}
            if a.ilabel != 0:
                words.append(a.ilabel)
                assert phones == {lang.phones[
                    lang.word_names[a.ilabel][0]]} or phones
            else:
                assert phones == {lang.phones["SIL"]}
            tot += len(tids)
            s = a.nextstate
        assert tot == frames[u]
        assert [lang.word_names[w] for w in words] == list(ref)


def test_align_words_lexicon_and_prons(env, tmp_path):
    d = env["d"]
    lang = env["lang"]
    assert get_tool("lattice-align-words-lexicon")([
        "lattice-align-words-lexicon", f"{d}/align_lexicon.int",
        f"{d}/final.mdl", f"ark:{d}/best.lat",
        f"ark:{tmp_path}/aligned.lat"]) == 0
    assert get_tool("nbest-to-prons")([
        "nbest-to-prons", f"{d}/final.mdl",
        f"ark:{tmp_path}/aligned.lat", f"{tmp_path}/prons.txt"]) == 0
    frames = _frames_of(env["sf"])
    by_utt = {}
    for line in open(f"{tmp_path}/prons.txt"):
        parts = line.split()
        by_utt.setdefault(parts[0], []).append(
            (int(parts[1]), int(parts[2]), int(parts[3]),
             [int(p) for p in parts[4:]]))
    for u, ref in env["test_txt"].items():
        rows = by_utt[u]
        # contiguous, covering all frames
        t = 0
        for begin, nf, word, phones in rows:
            assert begin == t
            t += nf
            if word != 0:
                assert [lang.phone_names[p] for p in phones] == \
                    lang.lexicon[lang.word_names[word]][0]
            else:
                assert all(lang.phone_names[p] == "SIL"
                           for p in phones)
        assert t == frames[u]
        hyp = [lang.word_names[w] for _b, _n, w, _p in rows if w]
        assert hyp == list(ref)


def test_align_phones(env, tmp_path):
    d = env["d"]
    lang = env["lang"]
    assert get_tool("lattice-align-phones")([
        "lattice-align-phones", "--replace-output-symbols=true",
        f"{d}/final.mdl", f"ark:{d}/best.lat",
        f"ark:{tmp_path}/ph.lat"]) == 0
    clats = dict(SequentialTableReader(CompactLatticeHolder(),
                                       f"ark:{tmp_path}/ph.lat"))
    tm = env["sys"].tm
    frames = _frames_of(env["sf"])
    for u in env["test_txt"]:
        s = clats[u].start
        tot = 0
        while clats[u].arcs[s]:
            a = clats[u].arcs[s][0]
            _lw, tids = a.weight
            # one phone per arc; label == that phone
            assert {tm.transition_id_to_phone(t) for t in tids} == \
                {a.ilabel}
            tot += len(tids)
            s = a.nextstate
        assert tot == frames[u]


def test_lattice_difference(env, tmp_path):
    d = env["d"]
    # lat - itself = empty (nothing written)
    assert get_tool("lattice-difference")([
        "lattice-difference", f"ark:{d}/best.lat", f"ark:{d}/best.lat",
        f"ark:{tmp_path}/empty.lat"]) != 0 or not dict(
        SequentialTableReader(LatticeHolder(),
                              f"ark:{tmp_path}/empty.lat"))
    # lat - (other utterance's lattice) = unchanged word sequence
    lats = dict(SequentialTableReader(LatticeHolder(),
                                      f"ark:{d}/best.lat"))
    keys = sorted(lats)
    with TableWriter(LatticeHolder(), f"ark:{tmp_path}/rot.lat") as w:
        for i, k in enumerate(keys):
            w.write(k, lats[keys[(i + 1) % len(keys)]])
    assert get_tool("lattice-difference")([
        "lattice-difference", f"ark:{d}/best.lat",
        f"ark:{tmp_path}/rot.lat", f"ark:{tmp_path}/diff.lat"]) == 0
    from kaldi_tpu.lat.functions import lattice_best_path
    diff = dict(SequentialTableReader(LatticeHolder(),
                                      f"ark:{tmp_path}/diff.lat"))
    for k in diff:
        _a1, w1, _c1 = lattice_best_path(diff[k])
        _a2, w2, _c2 = lattice_best_path(lats[k])
        # survives unless the rotated lattice happens to share words
        _a3, w3, _c3 = lattice_best_path(
            dict(SequentialTableReader(
                LatticeHolder(), f"ark:{tmp_path}/rot.lat"))[k])
        if w2 != w3:
            assert w1 == w2


def test_lattice_expand_and_path_cover(env, tmp_path):
    d = env["d"]
    assert get_tool("lattice-expand")([
        "lattice-expand", "--acoustic-scale=0.1", "--epsilon=0.01",
        f"ark:{d}/raw.lat", f"ark:{tmp_path}/exp.lat"]) == 0
    from kaldi_tpu.lat.functions import lattice_best_path
    raw = dict(SequentialTableReader(LatticeHolder(),
                                     f"ark:{d}/raw.lat"))
    exp = dict(SequentialTableReader(LatticeHolder(),
                                     f"ark:{tmp_path}/exp.lat"))
    for k in raw:
        _a1, w1, c1 = lattice_best_path(raw[k])
        _a2, w2, c2 = lattice_best_path(exp[k])
        assert w1 == w2 and c1 == pytest.approx(c2, abs=1e-3)
        assert exp[k].num_states >= raw[k].num_states
    # path cover: every arc covered, best path among the cover
    assert get_tool("lattice-path-cover")([
        "lattice-path-cover", "--acoustic-scale=0.1",
        f"ark:{d}/raw.lat", f"ark,t:{tmp_path}/words.txt",
        f"ark,t:{tmp_path}/states.txt", f"ark,t:{tmp_path}/costs.txt"
    ]) == 0
    costs = {}
    for line in open(f"{tmp_path}/costs.txt"):
        k, v = line.split()
        costs[k] = float(v)
    states = {}
    for line in open(f"{tmp_path}/states.txt"):
        parts = line.split()
        states[parts[0]] = [int(x) for x in parts[1:]]
    for k, lat in raw.items():
        mine = {p: states[p] for p in states if p.startswith(k + "-")}
        assert mine
        # all arcs covered
        covered = set()
        for seq in mine.values():
            for a, b in zip(seq, seq[1:]):
                covered.add((a, b))
        for s in range(lat.num_states):
            for arc in lat.arcs[s]:
                assert (s, arc.nextstate) in covered
        from kaldi_tpu.lat.functions import lattice_scale
        _a, _w, best = lattice_best_path(
            lattice_scale(lat, 1.0, 0.1))
        key_costs = [costs[p] for p in mine]
        assert min(key_costs) == pytest.approx(best, abs=1e-3)


def test_compactlattice44_roundtrip(tmp_path):
    from kaldi_tpu.lat.kaldi_lattice import CompactLattice
    from kaldi_tpu.fstext.fst import Arc
    clat = CompactLattice()
    s0, s1, s2 = (clat.add_state() for _ in range(3))
    clat.set_start(s0)
    clat.add_arc(s0, Arc(7, 7, ((0.5, 1.5), (3, 4, 5)), s1))
    clat.add_arc(s1, Arc(9, 9, ((0.25, 0.75), (6,)), s2))
    clat.finals[s2] = ((0.1, 0.2), (8, 8))
    for spec in ("ark", "ark,t"):
        path = f"{tmp_path}/c_{spec.replace(',', '')}.lat"
        with TableWriter(CompactLatticeHolder(), f"{spec}:{path}") as w:
            w.write("u", clat)
        got = dict(SequentialTableReader(CompactLatticeHolder(),
                                         f"ark:{path}"))["u"]
        assert got.num_states == 3
        a0 = got.arcs[got.start][0]
        assert a0.ilabel == 7 and tuple(a0.weight[1]) == (3, 4, 5)
        assert a0.weight[0][0] == pytest.approx(0.5)
        a1 = got.arcs[a0.nextstate][0]
        assert a1.ilabel == 9 and tuple(a1.weight[1]) == (6,)
        fw = got.finals[a1.nextstate]
        assert tuple(fw[1]) == (8, 8)
        assert fw[0][1] == pytest.approx(0.2)
