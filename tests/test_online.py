"""Online/streaming tests: streaming features == offline features,
online CMVN state carry-over, chunked decoding == offline decoding,
endpointing fires on trailing silence."""

import numpy as np
import pytest

from kaldi_tpu.decoder.viterbi import FasterDecoder, FasterDecoderOptions
from kaldi_tpu.feat.frontend import MfccOptions
from kaldi_tpu.feat.functions import acc_cmvn_stats
from kaldi_tpu.feat.window import FrameExtractionOptions
from kaldi_tpu.online.decoding import (OnlineEndpointConfig,
                                       OnlineFasterDecoder,
                                       SingleUtteranceDecoder,
                                       endpoint_detected)
from kaldi_tpu.online.features import (OnlineAppendFeature, OnlineCmvn,
                                       OnlineCmvnOptions, OnlineCmvnState,
                                       OnlineDeltaFeature, OnlineFeature,
                                       OnlineFeaturePipeline,
                                       OnlineSpliceFrames)
from kaldi_tpu.feat.functions import DeltaFeaturesOptions, compute_deltas, splice_frames

import os
import sys
sys.path.insert(0, os.path.dirname(__file__))
from test_mono_e2e import FS, make_corpus, synth_utterance, unigram_g


def wave_for_test(n=12000, seed=5):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / FS
    return (3000 * np.sin(2 * np.pi * 500 * t)
            + 200 * rng.normal(size=n)).astype(np.float32)


class TestOnlineFeature:
    def test_streaming_matches_offline(self):
        opts = MfccOptions(frame_opts=FrameExtractionOptions(
            samp_freq=FS, dither=0.0))
        from kaldi_tpu.feat.frontend import OfflineFeature
        wave = wave_for_test()
        offline = OfflineFeature(opts).compute(wave)
        online = OnlineFeature(opts)
        for chunk in np.array_split(wave, 7):
            online.accept_waveform(FS, chunk)
        online.finish_input()
        assert online.num_frames_ready() == offline.shape[0]
        got = np.stack([online.get_frame(t)
                        for t in range(online.num_frames_ready())])
        np.testing.assert_allclose(got, offline, atol=1e-4)

    def test_frames_available_before_finish(self):
        opts = MfccOptions(frame_opts=FrameExtractionOptions(
            samp_freq=FS, dither=0.0))
        online = OnlineFeature(opts)
        online.accept_waveform(FS, wave_for_test(4000))
        assert online.num_frames_ready() > 0
        assert not online.is_last_frame(online.num_frames_ready() - 1)


class TestOnlineCmvn:
    def test_long_utterance_matches_sliding(self):
        opts = MfccOptions(frame_opts=FrameExtractionOptions(
            samp_freq=FS, dither=0.0))
        online = OnlineFeature(opts)
        online.accept_waveform(FS, wave_for_test(16000))
        online.finish_input()
        cmvn = OnlineCmvn(OnlineCmvnOptions(cmn_window=50),
                          OnlineCmvnState(), online)
        # late frames are normalized by the trailing 50-frame window
        t = 80
        raw = np.stack([online.get_frame(i) for i in range(t - 49, t + 1)])
        want = online.get_frame(t) - raw.mean(axis=0)
        np.testing.assert_allclose(cmvn.get_frame(t), want, atol=1e-3)

    def test_speaker_state_carryover(self):
        opts = MfccOptions(frame_opts=FrameExtractionOptions(
            samp_freq=FS, dither=0.0))
        online = OnlineFeature(opts)
        online.accept_waveform(FS, wave_for_test(8000))
        online.finish_input()
        cmvn = OnlineCmvn(OnlineCmvnOptions(), OnlineCmvnState(), online)
        _ = cmvn.get_frame(0)
        state = cmvn.get_state(online.num_frames_ready() - 1)
        assert state.speaker_cmvn_stats is not None
        assert state.speaker_cmvn_stats[0, -1] == online.num_frames_ready()

    def test_early_frames_use_global_stats(self):
        opts = MfccOptions(frame_opts=FrameExtractionOptions(
            samp_freq=FS, dither=0.0))
        online = OnlineFeature(opts)
        online.accept_waveform(FS, wave_for_test(4000))
        online.finish_input()
        glob = acc_cmvn_stats(np.stack([online.get_frame(i)
                                        for i in range(10)]))
        cmvn = OnlineCmvn(OnlineCmvnOptions(),
                          OnlineCmvnState(global_cmvn_stats=glob), online)
        out0 = cmvn.get_frame(0)
        assert np.isfinite(out0).all()


class TestSpliceDelta:
    def test_online_delta_matches_offline(self):
        opts = MfccOptions(frame_opts=FrameExtractionOptions(
            samp_freq=FS, dither=0.0))
        online = OnlineFeature(opts)
        wave = wave_for_test(6000)
        online.accept_waveform(FS, wave)
        online.finish_input()
        feats = np.stack([online.get_frame(t)
                          for t in range(online.num_frames_ready())])
        want = compute_deltas(feats)
        delta = OnlineDeltaFeature(DeltaFeaturesOptions(), online)
        got = np.stack([delta.get_frame(t)
                        for t in range(delta.num_frames_ready())])
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_online_splice_matches_offline(self):
        opts = MfccOptions(frame_opts=FrameExtractionOptions(
            samp_freq=FS, dither=0.0))
        online = OnlineFeature(opts)
        online.accept_waveform(FS, wave_for_test(4000))
        online.finish_input()
        feats = np.stack([online.get_frame(t)
                          for t in range(online.num_frames_ready())])
        want = splice_frames(feats, 2, 2)
        sp = OnlineSpliceFrames(2, 2, online)
        got = np.stack([sp.get_frame(t)
                        for t in range(sp.num_frames_ready())])
        np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.fixture(scope="module")
def trained():
    from kaldi_tpu.decoder.graph import Lang
    from kaldi_tpu.feat.frontend import MfccOptions, OfflineFeature
    from kaldi_tpu.recipes.mono import (TrainMonoOptions, make_hclg,
                                        train_mono)
    train_txt, train_wav, test_txt, test_wav = make_corpus(
        num_train=8, num_test=2)
    fopts = MfccOptions(frame_opts=FrameExtractionOptions(
        samp_freq=FS, dither=0.0))
    comp = OfflineFeature(fopts)
    tf = dict(zip(train_wav, comp.compute_batch(list(train_wav.values()))))
    lang = Lang({"YES": [["Y"]], "NO": [["N"]]}, sil_phone="SIL",
                sil_prob=0.5)
    lang.make_topology()
    sys_ = train_mono(lang, tf, train_txt,
                      TrainMonoOptions(num_iters=6, totgauss=30,
                                       realign_iters=(1, 2, 3, 4, 5)))
    hclg = make_hclg(sys_, unigram_g(lang))
    utt = list(test_wav)[0]
    return sys_, hclg, fopts, test_wav[utt], test_txt[utt], lang


class TestOnlineDecoding:
    def test_chunked_equals_offline(self, trained):
        sys_, hclg, fopts, wave, ref, lang = trained
        from kaldi_tpu.feat.frontend import OfflineFeature
        feats = OfflineFeature(fopts).compute(wave)
        loglikes = sys_.am.log_likes_batch(feats)
        off = FasterDecoder(hclg, FasterDecoderOptions(beam=16.0)).decode(
            loglikes, sys_.tm.id2pdf_id, 0.1)
        online = OnlineFasterDecoder(hclg, FasterDecoderOptions(beam=16.0))
        for chunk in np.array_split(loglikes, 5):
            if len(chunk):
                online.advance_decoding(chunk, sys_.tm.id2pdf_id, 0.1)
        got = online.best_path(use_final_probs=True)
        assert got is not None and off is not None
        assert got[1] == off[1]
        assert got[2] == pytest.approx(off[2], abs=1e-3)

    def test_single_utterance_decoder(self, trained):
        sys_, hclg, fopts, wave, ref, lang = trained
        online_feat = OnlineFeature(fopts)
        pipe = OnlineFeaturePipeline(online_feat)
        dec = SingleUtteranceDecoder(hclg, sys_.tm,
                                     lambda f: sys_.am.log_likes_batch(f),
                                     pipe, acoustic_scale=0.1)
        for chunk in np.array_split(wave, 6):
            pipe.accept_waveform(FS, chunk)
            dec.advance_decoding()
        pipe.input_finished()
        dec.advance_decoding()
        res = dec.finalize_decoding()
        assert res is not None
        hyp = [lang.word_names[w] for w in res[1]]
        assert hyp == ref

    def test_endpoint_rules(self, trained):
        """Rule logic tested deterministically against fabricated decoder
        traceback (the toy corpus's AM labels noise as word-edge states,
        so the acoustic side is exercised separately)."""
        sys_, hclg, fopts, wave, ref, lang = trained
        from kaldi_tpu.online.decoding import (EndpointRule,
                                               trailing_silence_frames)
        sil_id = lang.phones[lang.sil_phone]
        tm = sys_.tm
        sil_tid = None
        for ts in range(1, tm.num_transition_states + 1):
            if tm.transition_state_to_phone(ts) == sil_id:
                sil_tid = tm.self_loop_of(ts)
                break
        word_tid = None
        for ts in range(1, tm.num_transition_states + 1):
            if tm.transition_state_to_phone(ts) != sil_id:
                word_tid = tm.self_loop_of(ts)
                break
        ali = [word_tid] * 100 + [sil_tid] * 250  # 1s speech + 2.5s sil
        assert trailing_silence_frames(tm, ali, [sil_id]) == 250
        # rule4: nonsilence + >=2s trailing silence, any cost
        r4 = EndpointRule(True, 2.0, float("inf"), 0.0)
        assert r4.active(3.5, 2.5, 100.0, True)
        assert not r4.active(3.5, 1.5, 100.0, True)
        # rule2: needs relative cost <= 2
        r2 = EndpointRule(True, 0.5, 2.0, 0.0)
        assert r2.active(3.5, 0.6, 1.0, True)
        assert not r2.active(3.5, 0.6, 5.0, True)
        # rule5: max utterance length
        r5 = EndpointRule(False, 0.0, float("inf"), 20.0)
        assert r5.active(21.0, 0.0, float("inf"), False)

        # integration: a decoder whose traceback ends in silence fires
        config = OnlineEndpointConfig(silence_phones=[sil_id])
        class _FakeDecoder:
            num_frames_decoded = 350
            def best_path(self, use_final_probs=False):
                return ali, [], 0.0
            def final_relative_cost(self):
                return 0.5
        from kaldi_tpu.online.decoding import endpoint_detected
        assert endpoint_detected(config, tm, _FakeDecoder(), 0.01)


class TestStreamingOfflineEquivalence:
    """Property: streaming feature extraction equals offline for ANY
    chunking of the waveform (OnlineGenericBaseFeature contract)."""

    @pytest.mark.parametrize("seed", range(4))
    def test_random_chunkings(self, seed):
        from kaldi_tpu.feat.frontend import MfccOptions, OfflineFeature
        from kaldi_tpu.feat.window import FrameExtractionOptions
        from kaldi_tpu.online.features import OnlineFeature
        rng = np.random.default_rng(seed)
        fs = 8000.0
        wave = rng.normal(scale=500, size=int(1.1 * fs)).astype(np.float32)
        opts = MfccOptions(frame_opts=FrameExtractionOptions(
            samp_freq=fs, dither=0.0))
        offline = np.asarray(OfflineFeature(opts).compute(wave))
        online = OnlineFeature(opts)
        pos = 0
        while pos < len(wave):
            n = int(rng.integers(1, 4000))
            online.accept_waveform(fs, wave[pos:pos + n])
            pos += n
            ready = online.num_frames_ready()
            if ready:
                _ = online.get_frames(range(ready))  # mid-stream reads
        online.finish_input()
        T = online.num_frames_ready()
        assert T == offline.shape[0]
        got = online.get_frames(range(T))
        np.testing.assert_allclose(got, offline, atol=1e-4)
