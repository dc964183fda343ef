

import numpy as np  # noqa: E402,F811


class TestInLoopBasisFmllr:
    """SingleUtteranceGmmDecoder: in-loop basis-fMLLR adaptation
    (online-gmm-decoding.h) — the transform is re-estimated at the
    adaptation marks from partial tracebacks and applied to subsequent
    frames; decoding stays correct."""

    def test_adaptation_runs_and_decodes(self):
        import os
        import sys
        sys.path.insert(0, os.path.dirname(__file__))
        from test_mono_e2e import FS, make_corpus, unigram_g
        from kaldi_tpu.decoder.graph import Lang, TrainingGraphCompiler
        from kaldi_tpu.feat.frontend import MfccOptions, OfflineFeature
        from kaldi_tpu.feat.window import FrameExtractionOptions
        from kaldi_tpu.online.decoding import (
            OnlineGmmDecodingAdaptationPolicy, SingleUtteranceGmmDecoder)
        from kaldi_tpu.recipes.mono import (TrainMonoOptions, _align_all,
                                            make_hclg, train_mono)
        from kaldi_tpu.transform.basis_fmllr import (BasisFmllrAccus,
                                                     BasisFmllrEstimate)
        from kaldi_tpu.transform.fmllr import FmllrDiagGmmAccs

        train_txt, train_wav, test_txt, test_wav = make_corpus(
            num_train=8, num_test=2)
        comp = OfflineFeature(MfccOptions(
            frame_opts=FrameExtractionOptions(samp_freq=FS, dither=0.0)))
        tf = dict(zip(train_wav,
                      comp.compute_batch(list(train_wav.values()))))
        sf = dict(zip(test_wav,
                      comp.compute_batch(list(test_wav.values()))))
        lang = Lang({"YES": [["Y"]], "NO": [["N"]]}, sil_phone="SIL",
                    sil_prob=0.5)
        lang.make_topology()
        sys_ = train_mono(lang, tf, train_txt,
                          TrainMonoOptions(num_iters=5, totgauss=24,
                                           realign_iters=(1, 2, 3, 4)))
        # train the fMLLR basis on the training speakers
        compiler = TrainingGraphCompiler(sys_.tm, sys_.tree, lang)
        graphs = {u: compiler.compile(train_txt[u]) for u in tf}
        alis = _align_all(sys_, graphs, tf, 10.0, 0.1, 1.0)
        accus = BasisFmllrAccus(13)
        for u, f in tf.items():
            a = FmllrDiagGmmAccs(13)
            a.accumulate_from_alignment(sys_.am, sys_.tm, f, alis[u])
            accus.accumulate_gradient_scatter(a)
        basis = BasisFmllrEstimate(13)
        basis.estimate_fmllr_basis(accus, basis_size=30)

        hclg = make_hclg(sys_, unigram_g(lang))

        class _Pipe:
            def __init__(self, feats):
                self.f = feats
                self.n = 0

            def accept(self, k):
                self.n = min(len(self.f), self.n + k)

            def num_frames_ready(self):
                return self.n

            def get_frames(self, a, b):
                return self.f[a:b]

        for utt, feats in sf.items():
            pipe = _Pipe(np.asarray(feats))
            dec = SingleUtteranceGmmDecoder(
                hclg, sys_.am, sys_.tm, pipe, basis=basis,
                acoustic_scale=0.1,
                policy=OnlineGmmDecodingAdaptationPolicy(
                    adaptation_frames=(60, 120), adaptation_interval=0,
                    min_frames=30))
            while pipe.n < len(pipe.f):
                pipe.accept(37)          # odd chunk size on purpose
                dec.advance_decoding()
            res = dec.finalize_decoding()
            assert res is not None
            hyp = [lang.word_names[w] for w in res[1]]
            assert hyp == test_txt[utt], (utt, hyp)
            assert dec.num_adaptations >= 1
            assert dec.get_adaptation_state().transform is not None
