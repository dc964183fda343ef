"""Device batched Viterbi vs host decoder equivalence — the
CPU↔device equivalence genre (SURVEY.md §4.4)."""

import numpy as np
import pytest

from kaldi_tpu.decoder.batched_viterbi import BatchedViterbi
from kaldi_tpu.decoder.viterbi import (FasterDecoder, FasterDecoderOptions,
                                       best_path_through)

import os
import sys
sys.path.insert(0, os.path.dirname(__file__))
from test_mono_e2e import FS, make_corpus, unigram_g


@pytest.fixture(scope="module")
def system():
    from kaldi_tpu.decoder.graph import Lang, TrainingGraphCompiler
    from kaldi_tpu.feat.frontend import MfccOptions, OfflineFeature
    from kaldi_tpu.feat.window import FrameExtractionOptions
    from kaldi_tpu.recipes.mono import (TrainMonoOptions, make_hclg,
                                        train_mono)
    train_txt, train_wav, test_txt, test_wav = make_corpus(
        num_train=8, num_test=4)
    comp = OfflineFeature(MfccOptions(
        frame_opts=FrameExtractionOptions(samp_freq=FS, dither=0.0)))
    tf = dict(zip(train_wav, comp.compute_batch(list(train_wav.values()))))
    sf = dict(zip(test_wav, comp.compute_batch(list(test_wav.values()))))
    lang = Lang({"YES": [["Y"]], "NO": [["N"]]}, sil_phone="SIL",
                sil_prob=0.5)
    lang.make_topology()
    sys_ = train_mono(lang, tf, train_txt,
                      TrainMonoOptions(num_iters=6, totgauss=30,
                                       realign_iters=(1, 2, 3, 4, 5)))
    hclg = make_hclg(sys_, unigram_g(lang))
    compiler = TrainingGraphCompiler(sys_.tm, sys_.tree, lang)
    return sys_, hclg, compiler, tf, sf, train_txt, test_txt


def batch_scores(sys_, feats_dict):
    utts = list(feats_dict)
    lens = [feats_dict[u].shape[0] for u in utts]
    Tmax = max(lens)
    dim = feats_dict[utts[0]].shape[1]
    batch = np.zeros((len(utts), Tmax, dim), np.float32)
    for i, u in enumerate(utts):
        batch[i, :lens[i]] = feats_dict[u]
    return utts, lens, sys_.am.log_likes_batch(batch)


class TestBatchedDecode:
    def test_matches_host_decoder(self, system):
        sys_, hclg, compiler, tf, sf, train_txt, test_txt = system
        utts, lens, ll = batch_scores(sys_, sf)
        bv = BatchedViterbi(hclg, sys_.tm.id2pdf_id, acoustic_scale=0.1)
        results = bv.run(ll, lens)
        for i, utt in enumerate(utts):
            host = best_path_through(ll[i, :lens[i]], None, None) \
                if False else FasterDecoder(
                    hclg, FasterDecoderOptions(beam=1e9)).decode(
                        ll[i, :lens[i]], sys_.tm.id2pdf_id, 0.1)
            dev = results[i]
            assert dev is not None and host is not None
            assert dev[1] == host[1], f"words differ for {utt}"
            assert dev[2] == pytest.approx(host[2], abs=0.01)
            assert dev[0] == host[0], f"alignment differs for {utt}"

    def test_batched_alignment_graphs(self, system):
        sys_, hclg, compiler, tf, sf, train_txt, test_txt = system
        utts, lens, ll = batch_scores(sys_, tf)
        graphs = [compiler.compile(train_txt[u]) for u in utts]
        bv = BatchedViterbi(graphs, sys_.tm.id2pdf_id, acoustic_scale=0.1)
        results = bv.run(ll, lens)
        for i, utt in enumerate(utts):
            host = FasterDecoder(graphs[i], FasterDecoderOptions(
                beam=1e9)).decode(ll[i, :lens[i]], sys_.tm.id2pdf_id, 0.1)
            dev = results[i]
            assert dev is not None and host is not None
            assert len(dev[0]) == lens[i]
            assert dev[2] == pytest.approx(host[2], abs=0.01)
            assert dev[0] == host[0], f"alignment differs for {utt}"
