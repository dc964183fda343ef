"""Timed-factor-transducer KWS index (kws/factor_index.py) vs the
posting-list index and vs exact path-posterior arithmetic.

Reference spec: src/kws/kws-functions.h:66-101 (cluster -> factor
transducer -> merge -> disambiguate -> optimize over the lexicographic
semiring), src/kwsbin/lattice-to-kws-index.cc / kws-search.cc."""

import io
import math

import numpy as np
import pytest

from kaldi_tpu.fstext.fst import Arc, LatticeWeight, VectorFst
from kaldi_tpu.kws import KwsIndex
from kaldi_tpu.kws.factor_index import FactorIndex


def linear_lattice():
    """word 1 over frames 0-2, word 2 over frames 2-5 (prob 1)."""
    lat = VectorFst(LatticeWeight)
    s = [lat.add_state() for _ in range(6)]
    lat.set_start(s[0])
    lat.add_arc(s[0], Arc(101, 1, (0.1, 0.2), s[1]))
    lat.add_arc(s[1], Arc(102, 0, (0.0, 0.1), s[2]))
    lat.add_arc(s[2], Arc(103, 2, (0.1, 0.1), s[3]))
    lat.add_arc(s[3], Arc(104, 0, (0.0, 0.1), s[4]))
    lat.add_arc(s[4], Arc(105, 0, (0.0, 0.1), s[5]))
    lat.set_final(s[5], (0.0, 0.0))
    return lat


def branching_lattice(p_top=0.6):
    """word 1 (frames 0-2), then word 2 w.p. p_top / word 3 w.p.
    1-p_top (frames 2-4)."""
    lat = VectorFst(LatticeWeight)
    s = [lat.add_state() for _ in range(4)]
    lat.set_start(s[0])
    lat.add_arc(s[0], Arc(101, 1, (0.0, 0.0), s[1]))
    lat.add_arc(s[1], Arc(102, 0, (0.0, 0.0), s[2]))
    c_top = -math.log(p_top)
    c_bot = -math.log(1.0 - p_top)
    lat.add_arc(s[2], Arc(103, 2, (c_top, 0.0), s[3]))
    lat.add_arc(s[2], Arc(104, 3, (c_bot, 0.0), s[3]))
    lat.set_final(s[3], (0.0, 0.0))
    return lat


class TestFactorIndex:
    def test_linear_posteriors_and_times(self):
        idx = FactorIndex.build({"utt1": linear_lattice()})
        h = idx.search([1])
        assert len(h) == 1 and h[0].utt == "utt1"
        assert h[0].score == pytest.approx(1.0, abs=1e-5)
        # end = state time at the word arc's head (factors end AT the
        # last word arc; trailing silence frames are not included —
        # kws-functions.cc:246, exit arcs only at word-entering states)
        assert (h[0].start_frame, h[0].end_frame) == (0, 1)
        h2 = idx.search([1, 2])
        assert len(h2) == 1
        assert h2[0].score == pytest.approx(1.0, abs=1e-5)
        assert (h2[0].start_frame, h2[0].end_frame) == (0, 3)
        h3 = idx.search([2])
        assert (h3[0].start_frame, h3[0].end_frame) == (2, 3)
        assert idx.search([999]) == []

    def test_branching_merges_posteriors_exactly(self):
        idx = FactorIndex.build({"u": branching_lattice(0.6)})
        # word 1 is on both paths: factor merging must ADD the
        # posteriors (log-semiring plus in the product weight)
        assert idx.search([1])[0].score == pytest.approx(1.0, abs=1e-5)
        assert idx.search([1, 2])[0].score == pytest.approx(0.6,
                                                            abs=1e-5)
        assert idx.search([1, 3])[0].score == pytest.approx(0.4,
                                                            abs=1e-5)
        assert idx.search([2])[0].score == pytest.approx(0.6, abs=1e-5)

    def test_acoustic_scale_changes_posteriors(self):
        lat = branching_lattice(0.6)
        # move the costs onto the acoustic component and scale it away:
        # both paths become equally likely at scale 0
        lat2 = VectorFst(LatticeWeight)
        for _ in range(lat.num_states):
            lat2.add_state()
        lat2.set_start(lat.start)
        lat2.finals = list(lat.finals)
        for s in range(lat.num_states):
            for a in lat.arcs[s]:
                lat2.add_arc(s, Arc(a.ilabel, a.olabel,
                                    (0.0, a.weight[0]), a.nextstate))
        idx = FactorIndex.build({"u": lat2}, acoustic_scale=0.0)
        assert idx.search([1, 2])[0].score == pytest.approx(0.5,
                                                            abs=1e-5)

    def test_parity_with_posting_list_index(self):
        lats = {"utt1": linear_lattice(), "utt2": branching_lattice()}
        fidx = FactorIndex.build(lats)
        pidx = KwsIndex()
        for u, lat in lats.items():
            pidx.add_lattice(u, lat)
        for kw in ([1], [2], [3], [1, 2]):
            fh = fidx.search(kw, min_posterior=1e-3)
            ph = pidx.search(kw)
            assert {h.utt for h in fh} == {h.utt for h in ph}, kw
            # scores agree per utterance and spans overlap
            for h in fh:
                match = [q for q in ph if q.utt == h.utt]
                best = max(match, key=lambda q: q.score)
                assert h.score == pytest.approx(best.score, abs=1e-3)
                assert max(h.start_frame, best.start_frame) <= \
                    min(h.end_frame, best.end_frame)

    def test_union_matches_joint_build(self):
        l1, l2 = linear_lattice(), branching_lattice()
        joint = FactorIndex.build({"a": l1, "b": l2})
        u = FactorIndex.build({"a": l1}).union(
            FactorIndex.build({"b": l2}))
        for kw in ([1], [2], [1, 2], [1, 3]):
            hj = sorted((h.utt, h.start_frame, h.end_frame,
                         round(h.score, 5)) for h in joint.search(kw))
            hu = sorted((h.utt, h.start_frame, h.end_frame,
                         round(h.score, 5)) for h in u.search(kw))
            assert hj == hu, kw

    def test_long_silence_cut(self):
        # word 1, a 100-frame silence, word 2: the factor [1, 2] must
        # NOT be indexed (max gap 50 frames, RemoveLongSilences)
        lat = VectorFst(LatticeWeight)
        s = [lat.add_state() for _ in range(4)]
        lat.set_start(s[0])
        lat.add_arc(s[0], Arc(101, 1, (0.0, 0.0), s[1]))
        # a 100-frame silence region = a run of 100 single-frame
        # eps-word arcs (this framework's per-frame lattices); the
        # accumulated-run cut must sever factors crossing it
        cur = s[1]
        for _ in range(100):
            nxt = lat.add_state()
            lat.add_arc(cur, Arc(106, 0, (0.0, 0.0), nxt))
            cur = nxt
        lat.add_arc(cur, Arc(103, 2, (0.0, 0.0), s[2]))
        lat.add_arc(s[2], Arc(104, 0, (0.0, 0.0), s[3]))
        lat.set_final(s[3], (0.0, 0.0))
        idx = FactorIndex.build({"u": lat}, max_silence_frames=50)
        assert idx.search([1]) and idx.search([2])
        assert idx.search([1, 2]) == []
        # posting-list search with a wide gap allowance still finds it
        # (documenting the capability difference the factor index adds)
        pidx = KwsIndex()
        pidx.add_lattice("u", lat)
        assert pidx.search([1, 2], max_gap_frames=200)

    def test_io_roundtrip(self):
        idx = FactorIndex.build({"utt1": linear_lattice(),
                                 "utt2": branching_lattice()})
        buf = io.BytesIO()
        idx.write(buf, binary=True)
        buf.seek(0)
        idx2 = FactorIndex.read(buf, binary=True)
        assert idx2.utt_names == idx.utt_names
        for kw in ([1], [1, 2], [2]):
            h1 = [(h.utt, h.start_frame, h.end_frame, round(h.score, 6))
                  for h in idx.search(kw)]
            h2 = [(h.utt, h.start_frame, h.end_frame, round(h.score, 6))
                  for h in idx2.search(kw)]
            assert h1 == h2

    def test_index_is_deterministic_machine(self):
        """The optimized index must be input-deterministic on word
        labels at every non-final-arc state (the property that makes
        search O(keyword length))."""
        idx = FactorIndex.build({"utt1": linear_lattice(),
                                 "utt2": branching_lattice()})
        f = idx.fst
        for s in range(f.num_states):
            seen = set()
            for a in f.arcs[s]:
                if f.is_final(a.nextstate) or a.ilabel == 0:
                    continue
                key = a.ilabel
                assert key not in seen, (s, key)
                seen.add(key)
