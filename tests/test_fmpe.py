"""fMPE discriminative feature offsets (parity: transform/fmpe.cc)."""

import numpy as np
import pytest

from kaldi_tpu.gmm.am_diag_gmm import AmDiagGmm
from kaldi_tpu.gmm.diag_gmm import DiagGmm
from kaldi_tpu.transform.fmpe import Fmpe, FmpeOptions, train_fmpe

D = 4


def _setup(seed=0):
    """AM whose means are systematically OFFSET from the data: fMPE
    must learn to shift the features back."""
    rng = np.random.default_rng(seed)
    true_means = rng.normal(scale=3.0, size=(3, D))
    am = AmDiagGmm()
    shift = np.array([2.0, -1.5, 1.8, -2.2])
    for m in true_means:
        g = DiagGmm(1, D)
        g.set_from_means_and_vars([1.0], [m + shift], [np.ones(D)])
        am.add_pdf(g)
    feats_list, ali_list = [], []
    for u in range(6):
        comps = rng.integers(0, 3, 80)
        x = true_means[comps] + 1.0 * rng.normal(size=(80, D))
        feats_list.append(x.astype(np.float32))
        ali_list.append(comps.tolist())
    # fMPE GMM: on the data itself
    allx = np.concatenate(feats_list)
    fg = DiagGmm(6, D)
    sel = allx[rng.choice(len(allx), 6, replace=False)]
    fg.set_from_means_and_vars(np.ones(6) / 6, sel,
                               np.tile(allx.var(0), (6, 1)))
    return am, fg, feats_list, ali_list, shift


def test_objective_improves_and_offsets_learn_shift():
    am, fg, feats_list, ali_list, shift = _setup()
    fmpe = Fmpe(fg, D, FmpeOptions(num_epochs=40, learning_rate=0.5))
    objs = train_fmpe(fmpe, am, feats_list, ali_list)
    assert objs[-1] > 0.5 * objs[0]  # at least halves the loss
    # the objective is DISCRIMINATIVE: the learned offsets need only
    # separate the classes, not reproduce the generative shift — so we
    # check the offsets are substantial and broadly aligned with the
    # mismatch direction, not equal to it
    off = fmpe.offsets(feats_list[0])
    mean_off = off.mean(axis=0)
    assert np.linalg.norm(mean_off) > 0.5
    cos = mean_off @ shift / (np.linalg.norm(mean_off)
                              * np.linalg.norm(shift))
    assert cos > 0.5
    assert objs[-1] > 5 * objs[0]  # 5x loss reduction (both negative)


def test_apply_improves_frame_accuracy():
    am, fg, feats_list, ali_list, shift = _setup(seed=1)
    fmpe = Fmpe(fg, D, FmpeOptions(num_epochs=15, learning_rate=0.2))
    train_fmpe(fmpe, am, feats_list, ali_list)

    def acc(transform):
        hits = tot = 0
        for f, a in zip(feats_list, ali_list):
            ll = np.asarray(am.log_likes_batch(transform(f)))
            hits += int((ll.argmax(1) == np.asarray(a)).sum())
            tot += len(a)
        return hits / tot

    assert acc(fmpe.apply) > acc(lambda f: f)


def test_descriptor_is_sparse_and_context_expanded():
    am, fg, feats_list, _, _ = _setup(seed=2)
    fmpe = Fmpe(fg, D, FmpeOptions(context_offsets=(-1, 0, 1),
                                   post_floor=0.1))
    h = fmpe.descriptor(feats_list[0])
    assert h.shape == (80, 3, 6)
    # floored posteriors -> most entries zero
    assert (h == 0).mean() > 0.3
    # context columns are shifted copies (interior frames)
    np.testing.assert_allclose(h[5, 0], h[4, 1], atol=1e-6)
    np.testing.assert_allclose(h[5, 2], h[6, 1], atol=1e-6)
