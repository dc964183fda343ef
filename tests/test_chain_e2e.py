"""Chain DNN end-to-end: GMM bootstrap -> alignments -> LF-MMI TDNN-F
training -> neural decode — the mini_librispeech chain-recipe
equivalent at toy scale (SURVEY.md §3.4, BASELINE config 4)."""

import numpy as np
import pytest

from kaldi_tpu.decoder.graph import Lang
from kaldi_tpu.feat.frontend import MfccOptions, OfflineFeature
from kaldi_tpu.feat.window import FrameExtractionOptions
from kaldi_tpu.nnet3.models import ChainTdnnfConfig
from kaldi_tpu.recipes.chain import nnet_log_likes, train_chain
from kaldi_tpu.recipes.mono import (TrainMonoOptions, _align_all, decode,
                                    make_hclg, train_mono)
from kaldi_tpu.decoder.graph import TrainingGraphCompiler
from kaldi_tpu.decoder.viterbi import FasterDecoder, FasterDecoderOptions
from kaldi_tpu.util.edit_distance import WerStats

import sys, os
sys.path.insert(0, os.path.dirname(__file__))
from test_mono_e2e import FS, make_corpus, unigram_g


@pytest.mark.slow
def test_chain_training_end_to_end():
    train_txt, train_wav, test_txt, test_wav = make_corpus(
        num_train=12, num_test=4)
    comp = OfflineFeature(MfccOptions(
        frame_opts=FrameExtractionOptions(samp_freq=FS, dither=0.0)))
    tf = dict(zip(train_wav, comp.compute_batch(list(train_wav.values()))))
    sf = dict(zip(test_wav, comp.compute_batch(list(test_wav.values()))))

    lang = Lang({"YES": [["Y"]], "NO": [["N"]]}, sil_phone="SIL",
                sil_prob=0.5)
    lang.make_topology()
    gmm_sys = train_mono(lang, tf, train_txt,
                         TrainMonoOptions(num_iters=6, totgauss=30,
                                          realign_iters=(1, 2, 3, 4, 5)))

    # final GMM alignments as chain supervision
    compiler = TrainingGraphCompiler(gmm_sys.tm, gmm_sys.tree, lang)
    graphs = {u: compiler.compile(train_txt[u]) for u in tf}
    alignments = _align_all(gmm_sys, graphs, tf, beam=10.0,
                            acoustic_scale=0.1, transition_scale=1.0)
    assert len(alignments) == len(tf)

    from kaldi_tpu.recipes.chain import ChainTrainOptions
    cfg = ChainTdnnfConfig(feat_dim=13, num_pdfs=gmm_sys.tm.num_pdfs,
                           hidden_dim=64, bottleneck_dim=16,
                           prefinal_dim=32, num_layers=4,
                           subsample_layer=2, frame_subsampling_factor=1)
    opts = ChainTrainOptions(num_epochs=6, learning_rate=2e-3,
                             minibatch_size=4, chunk_width=50)
    model, variables, den = train_chain(gmm_sys, tf, alignments, cfg, opts)

    # decode with neural AM scores through the same HCLG, sweeping
    # acoustic-scale/word-insertion-penalty like steps/score_kaldi.sh
    hclg = make_hclg(gmm_sys, unigram_g(lang))
    scores = nnet_log_likes(model, variables, sf)
    dec = FasterDecoder(hclg, FasterDecoderOptions(beam=24.0))
    best = None
    for ac, wip in [(ac, wip) for ac in (0.3, 0.5, 1.0)
                    for wip in (0.0, 2.0, 5.0)]:
        stats = WerStats()
        for utt, ref in test_txt.items():
            res = dec.decode(scores[utt], gmm_sys.tm.id2pdf_id,
                             acoustic_scale=ac, word_ins_penalty=wip)
            hyp = [] if res is None else [lang.word_names[w] for w in res[1]]
            stats.add(ref, hyp)
        if best is None or stats.wer < best.wer:
            best = stats
    print(best.report())
    assert best.wer <= 7.0, best.report()


@pytest.mark.slow
def test_chain_topology_training_end_to_end():
    """Proper chain config: chain topology (1-state, fwd/self pdfs),
    frame-subsampling 3, acoustic scale 1.0 decode."""
    from kaldi_tpu.recipes.chain import (ChainTrainOptions,
                                         train_chain_topo)
    from kaldi_tpu.decoder.graph import make_decoding_graph

    train_txt, train_wav, test_txt, test_wav = make_corpus(
        num_train=12, num_test=4)
    comp = OfflineFeature(MfccOptions(
        frame_opts=FrameExtractionOptions(samp_freq=FS, dither=0.0)))
    tf = dict(zip(train_wav, comp.compute_batch(list(train_wav.values()))))
    sf = dict(zip(test_wav, comp.compute_batch(list(test_wav.values()))))
    lang = Lang({"YES": [["Y"]], "NO": [["N"]]}, sil_phone="SIL",
                sil_prob=0.5)
    lang.make_topology()
    gmm_sys = train_mono(lang, tf, train_txt,
                         TrainMonoOptions(num_iters=6, totgauss=30,
                                          realign_iters=(1, 2, 3, 4, 5)))
    compiler = TrainingGraphCompiler(gmm_sys.tm, gmm_sys.tree, lang)
    graphs = {u: compiler.compile(train_txt[u]) for u in tf}
    mono_ali = _align_all(gmm_sys, graphs, tf, 10.0, 0.1, 1.0)

    cfg = ChainTdnnfConfig(feat_dim=13, num_pdfs=2 * len(lang.phones),
                           hidden_dim=64, bottleneck_dim=16,
                           prefinal_dim=32, num_layers=4,
                           subsample_layer=2, frame_subsampling_factor=3)
    opts = ChainTrainOptions(num_epochs=10, learning_rate=2e-3,
                             minibatch_size=4, chunk_width=60,
                             left_tolerance=5, right_tolerance=5)
    model, variables, den, chain_tm, chain_tree = train_chain_topo(
        gmm_sys, tf, mono_ali, cfg, opts)
    assert chain_tm.num_pdfs == 2 * len(lang.phones)

    # chain HCLG + decode at output rate, acoustic scale 1.0
    lang.topo = chain_tm.topo
    hclg = make_decoding_graph(lang, unigram_g(lang), chain_tree, chain_tm,
                               transition_scale=1.0, self_loop_scale=1.0)
    scores = nnet_log_likes(model, variables, sf)
    dec = FasterDecoder(hclg, FasterDecoderOptions(beam=24.0))
    best = None
    for ac, wip in [(ac, wip) for ac in (0.5, 1.0)
                    for wip in (0.0, 1.0, 2.0)]:
        stats = WerStats()
        for utt, ref in test_txt.items():
            res = dec.decode(scores[utt], chain_tm.id2pdf_id,
                             acoustic_scale=ac, word_ins_penalty=wip)
            hyp = [] if res is None else [lang.word_names[w]
                                          for w in res[1]]
            stats.add(ref, hyp)
        if best is None or stats.wer < best.wer:
            best = stats
    print("chain-topo:", best.report())
    assert best.wer <= 15.0, best.report()


@pytest.mark.slow
def test_chain_with_ivectors_end_to_end():
    """Chain training with per-utterance i-vectors from a real
    extractor (the online-ivector chain configuration)."""
    from kaldi_tpu.ivector import (IvectorExtractor,
                                   IvectorExtractorOptions,
                                   train_ivector_extractor)
    from kaldi_tpu.gmm.diag_gmm import DiagGmm
    from kaldi_tpu.recipes.chain import (ChainTrainOptions, nnet_log_likes,
                                         train_chain_topo)
    from kaldi_tpu.decoder.graph import make_decoding_graph

    train_txt, train_wav, test_txt, test_wav = make_corpus(
        num_train=10, num_test=3)
    comp = OfflineFeature(MfccOptions(
        frame_opts=FrameExtractionOptions(samp_freq=FS, dither=0.0)))
    tf = dict(zip(train_wav, comp.compute_batch(list(train_wav.values()))))
    sf = dict(zip(test_wav, comp.compute_batch(list(test_wav.values()))))
    lang = Lang({"YES": [["Y"]], "NO": [["N"]]}, sil_phone="SIL",
                sil_prob=0.5)
    lang.make_topology()
    gmm_sys = train_mono(lang, tf, train_txt,
                         TrainMonoOptions(num_iters=6, totgauss=30,
                                          realign_iters=(1, 2, 3, 4, 5)))
    compiler = TrainingGraphCompiler(gmm_sys.tm, gmm_sys.tree, lang)
    graphs = {u: compiler.compile(train_txt[u]) for u in tf}
    mono_ali = _align_all(gmm_sys, graphs, tf, 10.0, 0.1, 1.0)

    # real i-vector extractor over a small diag UBM
    allx = np.concatenate(list(tf.values()))
    rng = np.random.default_rng(0)
    ubm = DiagGmm(4, allx.shape[1])
    sel = allx[rng.choice(len(allx), 4, replace=False)]
    ubm.set_from_means_and_vars(np.ones(4) / 4, sel,
                                np.tile(allx.var(0), (4, 1)))
    ex = train_ivector_extractor(
        ubm, list(tf.values()),
        IvectorExtractorOptions(ivector_dim=4, num_iters=3))
    train_iv = {u: ex.extract_offset_removed(f) for u, f in tf.items()}
    test_iv = {u: ex.extract_offset_removed(f) for u, f in sf.items()}

    cfg = ChainTdnnfConfig(feat_dim=13, ivector_dim=4,
                           num_pdfs=2 * len(lang.phones),
                           hidden_dim=64, bottleneck_dim=16,
                           prefinal_dim=32, num_layers=4,
                           subsample_layer=2, frame_subsampling_factor=3)
    # ivector conditioning slows convergence on this tiny corpus
    # (objf/frame 0.89 at 8 epochs vs 0.96 at 20; WER 41.7% -> 0%),
    # so train longer than the no-ivector variant.
    opts = ChainTrainOptions(num_epochs=20, learning_rate=2e-3,
                             minibatch_size=4, chunk_width=60,
                             left_tolerance=5, right_tolerance=5)
    model, variables, den, chain_tm, chain_tree = train_chain_topo(
        gmm_sys, tf, mono_ali, cfg, opts, ivectors=train_iv)

    lang.topo = chain_tm.topo
    hclg = make_decoding_graph(lang, unigram_g(lang), chain_tree, chain_tm,
                               transition_scale=1.0, self_loop_scale=1.0)
    scores = nnet_log_likes(model, variables, sf, ivectors=test_iv)
    dec = FasterDecoder(hclg, FasterDecoderOptions(beam=24.0))
    best = None
    for ac in (0.5, 1.0):
        for wip in (0.0, 1.0, 2.0):
            stats = WerStats()
            for utt, ref in test_txt.items():
                res = dec.decode(scores[utt], chain_tm.id2pdf_id,
                                 acoustic_scale=ac, word_ins_penalty=wip)
                hyp = [] if res is None else [lang.word_names[w]
                                              for w in res[1]]
                stats.add(ref, hyp)
            if best is None or stats.wer < best.wer:
                best = stats
    print("chain+ivector:", best.report())
    assert best.wer <= 20.0, best.report()
