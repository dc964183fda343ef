"""Proper chain-style decoding: HCLG built from the chain topology
(1 emitting state, distinct forward/self-loop pdfs), scores at the
subsampled frame rate, acoustic scale 1.0 — the reference's chain
decode configuration."""

import numpy as np
import pytest

from kaldi_tpu.decoder.graph import Lang, make_decoding_graph
from kaldi_tpu.decoder.viterbi import FasterDecoder, FasterDecoderOptions
from kaldi_tpu.hmm import HmmTopology, TransitionModel
from kaldi_tpu.tree import monophone_context_dependency

import os
import sys
sys.path.insert(0, os.path.dirname(__file__))
from test_mono_e2e import unigram_g


def test_chain_hclg_and_decode():
    lang = Lang({"YES": [["Y"]], "NO": [["N"]]}, sil_phone="SIL",
                sil_prob=0.5)
    phones = sorted(lang.phones.values())
    topo = HmmTopology.chain_topology(phones)
    lang.topo = topo
    npc = {p: topo.num_pdf_classes(p) for p in phones}
    tree = monophone_context_dependency(phones, npc)
    tm = TransitionModel(topo, tree)
    hclg = make_decoding_graph(lang, unigram_g(lang), tree, tm,
                               transition_scale=1.0, self_loop_scale=1.0)
    assert hclg.num_states > 0
    # min duration per phone should be ONE frame (chain topology)
    # construct scores favoring: SIL Y SIL N SIL at subsampled rate
    P = tm.num_pdfs
    sil, y, n = lang.phones["SIL"], lang.phones["Y"], lang.phones["N"]

    def pdfs_of(ph):
        return (tree.compute([ph], 0), tree.compute([ph], 1))

    T = 15
    seq = ([sil] * 4 + [y] * 2 + [sil] * 3 + [n] * 2 + [sil] * 4)
    scores = np.full((T, P), -10.0, np.float32)
    for t, ph in enumerate(seq):
        fwd, slf = pdfs_of(ph)
        scores[t, fwd] = 2.0
        scores[t, slf] = 2.0
    dec = FasterDecoder(hclg, FasterDecoderOptions(beam=20.0))
    res = dec.decode(scores, tm.id2pdf_id, acoustic_scale=1.0)
    assert res is not None
    words = [lang.word_names[w] for w in res[1]]
    assert words == ["YES", "NO"]
    # alignment covers all frames; first frame of each phone uses the
    # forward pdf, the rest the self-loop pdf
    assert len(res[0]) == T
    pdf_seq = [tm.transition_id_to_pdf(t) for t in res[0]]
    y_fwd, y_slf = pdfs_of(y)
    t_y = seq.index(y)
    assert pdf_seq[t_y] == y_fwd
    assert pdf_seq[t_y + 1] == y_slf


def test_chain_single_frame_phone():
    """A phone can occupy exactly one output frame (the point of the
    chain topology)."""
    lang = Lang({"A": [["a"]], "B": [["b"]]}, sil_phone="SIL", sil_prob=0.0)
    phones = sorted(lang.phones.values())
    topo = HmmTopology.chain_topology(phones)
    lang.topo = topo
    npc = {p: 2 for p in phones}
    tree = monophone_context_dependency(phones, npc)
    tm = TransitionModel(topo, tree)
    hclg = make_decoding_graph(lang, unigram_g(lang, ("A", "B")), tree, tm,
                               transition_scale=1.0, self_loop_scale=1.0)
    P = tm.num_pdfs
    a, b = lang.phones["a"], lang.phones["b"]
    scores = np.full((3, P), -10.0, np.float32)
    for t, ph in enumerate([a, b, a]):
        scores[t, tree.compute([ph], 0)] = 3.0
    res = FasterDecoder(hclg, FasterDecoderOptions(beam=20.0)).decode(
        scores, tm.id2pdf_id, 1.0)
    assert res is not None
    assert [lang.word_names[w] for w in res[1]] == ["A", "B", "A"]
