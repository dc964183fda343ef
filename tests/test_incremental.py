"""Incremental lattice determinization (parity:
decoder/lattice-incremental-decoder.h)."""

import numpy as np
import pytest

import os
import sys
sys.path.insert(0, os.path.dirname(__file__))
from test_mono_e2e import FS, make_corpus, unigram_g  # noqa: E402

from kaldi_tpu.decoder.incremental import LatticeIncrementalDecoder
from kaldi_tpu.decoder.lattice_decoder import (LatticeFasterDecoder,
                                               LatticeFasterDecoderOptions)
from kaldi_tpu.lat.functions import lattice_best_path


@pytest.fixture(scope="module")
def system():
    from kaldi_tpu.decoder.graph import Lang
    from kaldi_tpu.feat.frontend import MfccOptions, OfflineFeature
    from kaldi_tpu.feat.window import FrameExtractionOptions
    from kaldi_tpu.recipes.mono import (TrainMonoOptions, make_hclg,
                                        train_mono)
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
                      TrainMonoOptions(num_iters=5, totgauss=24,
                                       realign_iters=(1, 2, 3, 4)))
    hclg = make_hclg(sys_, unigram_g(lang))
    return sys_, hclg, sf, test_txt, lang


def test_matches_batch_decoder_best_path(system):
    sys_, hclg, sf, test_txt, lang = system
    opts = LatticeFasterDecoderOptions(beam=16.0, lattice_beam=7.0,
                                       determinize_lattice=False)
    inc = LatticeIncrementalDecoder(hclg, opts, chunk_frames=30)
    ref = LatticeFasterDecoder(hclg, opts)
    for utt, feats in sf.items():
        ll = np.asarray(sys_.am.log_likes_batch(feats))
        lat_i = inc.decode(ll, sys_.tm.id2pdf_id, 0.1)
        lat_r = ref.decode(ll, sys_.tm.id2pdf_id, 0.1)
        assert lat_i is not None and lat_r is not None
        ali_i, w_i, c_i = lattice_best_path(lat_i)
        ali_r, w_r, c_r = lattice_best_path(lat_r)
        assert w_i == w_r, utt
        assert c_i == pytest.approx(c_r, abs=1e-2)
        # alignments (transition-ids) survive chunked determinization
        assert len(ali_i) == len(ali_r) == ll.shape[0]
        assert inc.stats["chunks"] >= 3


def test_chunk_memory_is_bounded(system):
    sys_, hclg, sf, test_txt, lang = system
    opts = LatticeFasterDecoderOptions(beam=16.0, lattice_beam=7.0,
                                       determinize_lattice=False)
    utt, feats = next(iter(sf.items()))
    ll = np.asarray(sys_.am.log_likes_batch(feats))
    small = LatticeIncrementalDecoder(hclg, opts, chunk_frames=20)
    small.decode(ll, sys_.tm.id2pdf_id, 0.1)
    big = LatticeIncrementalDecoder(hclg, opts,
                                    chunk_frames=ll.shape[0])
    big.decode(ll, sys_.tm.id2pdf_id, 0.1)
    # smaller chunks => strictly smaller peak raw-link store
    assert small.stats["max_chunk_links"] < big.stats["max_chunk_links"]


def test_no_marker_labels_leak(system):
    sys_, hclg, sf, _, _ = system
    inc = LatticeIncrementalDecoder(
        hclg, LatticeFasterDecoderOptions(determinize_lattice=False),
        chunk_frames=25)
    utt, feats = next(iter(sf.items()))
    ll = np.asarray(sys_.am.log_likes_batch(feats))
    lat = inc.decode(ll, sys_.tm.id2pdf_id, 0.1)
    for s in range(lat.num_states):
        for a in lat.arcs[s]:
            assert a.olabel < 10 ** 7, "marker label leaked"
