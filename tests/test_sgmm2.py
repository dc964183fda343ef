"""Subspace GMM (parity: sgmm2/am-sgmm2.cc, estimate-am-sgmm2.cc)."""

import io

import numpy as np
import pytest

from kaldi_tpu.gmm.full_gmm import FullGmm
from kaldi_tpu.sgmm2 import AmSgmm2, MleAmSgmm2Accs, Sgmm2Options, \
    train_sgmm2

D, I, J = 4, 5, 3


def _data(seed=0, n_per_state=200, draw_seed=None):
    """States = distinct directions in a shared subspace: exactly the
    structure SGMM models (shared covariances + per-state means that
    live in a low-dim phonetic subspace). `seed` fixes the underlying
    distribution; `draw_seed` varies the sampled frames."""
    rng = np.random.default_rng(seed)
    base = rng.normal(scale=2.0, size=(I, D))        # shared centers
    direction = rng.normal(size=(J, I))              # state mixing
    draw = np.random.default_rng(seed if draw_seed is None else draw_seed)
    feats, states = [], []
    for j in range(J):
        w = np.exp(direction[j]) / np.exp(direction[j]).sum()
        comps = draw.choice(I, p=w, size=n_per_state)
        offs = j * 1.5
        x = base[comps] + offs + 0.5 * draw.normal(size=(n_per_state, D))
        feats.append(x.astype(np.float32))
        states.append([j] * n_per_state)
    allx = np.concatenate(feats)
    ubm = FullGmm(I, D)
    sel = allx[rng.choice(len(allx), I, replace=False)]
    covs = np.stack([np.cov(allx.T) + 0.5 * np.eye(D)] * I)
    ubm.set_from_means_and_covars(np.ones(I) / I, sel, covs)
    return ubm, feats, states


def test_ubm_init_reproduces_ubm():
    ubm, feats, states = _data()
    model = AmSgmm2(ubm, J)
    x = feats[0][:10]
    # with v = e1 and w = 0, every state is the UBM (uniform weights vs
    # the UBM's own weights differ; compare per-component densities)
    comp = model.component_log_likes(x)   # (T, JM, I)
    # all substates identical at init
    np.testing.assert_allclose(comp[:, 0], comp[:, 1], atol=1e-8)


def test_em_improves_and_discriminates():
    ubm, feats, states = _data()
    likes = []

    class _SpyOpts(Sgmm2Options):
        pass

    model = train_sgmm2(ubm, feats, states, J,
                        Sgmm2Options(num_iters=6))
    # per-frame state classification on held-out draws
    ubm2, feats2, states2 = _data(seed=0, draw_seed=99)
    hits = tot = 0
    for f, st in zip(feats2, states2):
        ll = model.log_likes(f)
        hits += int((ll.argmax(1) == np.asarray(st)).sum())
        tot += len(st)
    acc = hits / tot
    assert acc > 0.9, acc


def test_em_monotone_loglike():
    ubm, feats, states = _data(seed=2)
    model = AmSgmm2(ubm, J)
    from kaldi_tpu.sgmm2.am_sgmm2 import (_update_M, _update_c,
                                          _update_sigma, _update_v,
                                          _update_w)
    prev = None
    for it in range(5):
        accs = MleAmSgmm2Accs(model)
        like = sum(accs.accumulate(model, f, st)
                   for f, st in zip(feats, states))
        like /= accs.total_frames
        if prev is not None:
            assert like > prev - 1e-3, (it, prev, like)
        prev = like
        _update_v(model, accs)
        _update_M(model, accs)
        _update_w(model, accs)
        _update_sigma(model, accs)
        _update_c(model, accs)


def test_serialization_round_trip():
    ubm, feats, states = _data(seed=3)
    model = train_sgmm2(ubm, feats, states, J, Sgmm2Options(num_iters=2))
    buf = io.BytesIO()
    model.write(buf, binary=True)
    buf.seek(0)
    model2 = AmSgmm2.read(buf, binary=True)
    x = feats[0][:20]
    np.testing.assert_allclose(model2.log_likes(x), model.log_likes(x),
                               atol=1e-4)


def test_subspace_structure_is_shared():
    """The phonetic subspace really is shared: state vectors differ,
    the global M/w/Sigma are common."""
    ubm, feats, states = _data(seed=4)
    model = train_sgmm2(ubm, feats, states, J, Sgmm2Options(num_iters=4))
    v = np.stack([model.v[j][0] for j in range(J)])
    # vectors meaningfully distinct across states
    d01 = np.linalg.norm(v[0] - v[1])
    assert d01 > 0.1
    assert model.M.shape == (I, D, model.phn_dim)


def _spk_data(seed=0, n_spk=3, n_utt_per_spk=2, n_per_state=150):
    """Speaker-shifted variant: every speaker adds a global offset
    along a shared direction — exactly what N_i v^(s) models."""
    rng = np.random.default_rng(seed)
    ubm, feats, states = _data(seed)
    direction = rng.normal(size=(1, D))
    direction /= np.linalg.norm(direction)
    sf, ss, spk = [], [], []
    for s in range(n_spk):
        shift = (s - 1) * 2.5 * direction      # -2.5, 0, +2.5 sigma
        for u in range(n_utt_per_spk):
            j = (s + u) % J
            sf.append((feats[j] + shift).astype(np.float32))
            ss.append(states[j])
            spk.append(s)
    return ubm, sf, ss, spk


def test_speaker_subspace_improves_loglike():
    from kaldi_tpu.sgmm2 import estimate_speaker_vectors
    ubm, sf, ss, spk = _spk_data()
    base = train_sgmm2(ubm, sf, ss, J, Sgmm2Options(num_iters=4))
    adapted = train_sgmm2(ubm, sf, ss, J,
                          Sgmm2Options(num_iters=4, spk_dim=2),
                          speakers=spk)
    assert adapted.N is not None and adapted.u is not None
    vecs = estimate_speaker_vectors(adapted, sf, ss, spk)
    # speaker-adapted per-frame loglike beats the unadapted model
    def avg_ll(model, use_vecs):
        tot = n = 0.0
        for f, st, s in zip(sf, ss, spk):
            ll = model.log_likes(
                f, vecs[s] if use_vecs else None)
            tot += float(ll[np.arange(len(st)), st].sum())
            n += len(st)
        return tot / n
    ll_base = avg_ll(base, False)
    ll_adapt = avg_ll(adapted, True)
    assert ll_adapt > ll_base + 0.1, (ll_base, ll_adapt)
    # distinct speakers get distinct vectors; shifted speakers move
    # in opposite directions from the central one
    v0, v2 = vecs[0], vecs[2]
    assert np.linalg.norm(v0 - v2) > 0.2, (v0, v2)


def test_speaker_subspace_round_trip():
    ubm, sf, ss, spk = _spk_data(seed=5)
    model = train_sgmm2(ubm, sf, ss, J,
                        Sgmm2Options(num_iters=2, spk_dim=2),
                        speakers=spk)
    import io as _io
    buf = _io.BytesIO()
    model.write(buf, binary=True)
    buf.seek(0)
    model2 = AmSgmm2.read(buf, binary=True)
    assert model2.spk_dim == 2 and model2.u is not None
    x = sf[0][:20]
    v = np.array([0.5, -0.3])
    np.testing.assert_allclose(model2.log_likes(x, v),
                               model.log_likes(x, v), atol=1e-4)


def test_speaker_vector_zero_is_unadapted_means():
    """v^(s)=0 gives the speaker-independent model up to the u term
    (which is zero at init)."""
    ubm, feats, states = _data(seed=6)
    model = train_sgmm2(ubm, feats, states, J, Sgmm2Options(num_iters=2))
    model.init_speaker_subspace(2, use_u=True)
    x = feats[0][:15]
    np.testing.assert_allclose(model.log_likes(x, np.zeros(2)),
                               model.log_likes(x), atol=1e-8)


@pytest.mark.slow
def test_sgmm2_decode_end_to_end():
    """Full SGMM2 recipe shape: mono GMM bootstrap -> pdf alignments ->
    UBM -> SGMM2 training -> decode through the same HCLG."""
    import os
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_mono_e2e import FS, make_corpus, unigram_g
    from kaldi_tpu.decoder.graph import Lang, TrainingGraphCompiler
    from kaldi_tpu.decoder.viterbi import FasterDecoder, \
        FasterDecoderOptions
    from kaldi_tpu.feat.frontend import MfccOptions, OfflineFeature
    from kaldi_tpu.feat.window import FrameExtractionOptions
    from kaldi_tpu.recipes.mono import (TrainMonoOptions, _align_all,
                                        make_hclg, train_mono)
    from kaldi_tpu.util.edit_distance import WerStats

    train_txt, train_wav, test_txt, test_wav = make_corpus(
        num_train=10, num_test=3)
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
    compiler = TrainingGraphCompiler(sys_.tm, sys_.tree, lang)
    graphs = {u: compiler.compile(train_txt[u]) for u in tf}
    ali = _align_all(sys_, graphs, tf, 10.0, 0.1, 1.0)
    num_pdfs = sys_.tm.num_pdfs
    # UBM on all training data
    allx = np.concatenate(list(tf.values())).astype(np.float64)
    rng = np.random.default_rng(0)
    ubm = FullGmm(8, allx.shape[1])
    sel = allx[rng.choice(len(allx), 8, replace=False)]
    ubm.set_from_means_and_covars(
        np.ones(8) / 8, sel,
        np.stack([np.cov(allx.T) + 1e-2 * np.eye(allx.shape[1])] * 8))
    feats_list = [tf[u] for u in tf]
    states_list = [sys_.tm.transition_ids_to_pdfs(ali[u]).tolist()
                   for u in tf]
    sgmm = train_sgmm2(ubm, feats_list, states_list, num_pdfs,
                       Sgmm2Options(num_iters=5))
    # decode with SGMM2 scores through the GMM system's HCLG
    hclg = make_hclg(sys_, unigram_g(lang))
    dec = FasterDecoder(hclg, FasterDecoderOptions(beam=16.0))
    stats = WerStats()
    for utt, ref in test_txt.items():
        ll = sgmm.log_likes(sf[utt])
        res = dec.decode(ll, sys_.tm.id2pdf_id, acoustic_scale=0.1)
        hyp = [] if res is None else [lang.word_names[w] for w in res[1]]
        stats.add(ref, hyp)
    print("sgmm2:", stats.report())
    assert stats.wer <= 10.0, stats.report()
