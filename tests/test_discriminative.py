"""Sequence-discriminative objectives: gradient structure and
objective bounds on a constructed denominator lattice."""

import numpy as np
import pytest

from kaldi_tpu.fstext.fst import Arc, LatticeWeight, VectorFst
from kaldi_tpu.nnet3.discriminative import (DiscriminativeOptions,
                                            compute_discriminative_objf_and_grad)

import os
import sys
sys.path.insert(0, os.path.dirname(__file__))
from test_hmm_gmm import mono_system


@pytest.fixture()
def system():
    topo, tree, tm = mono_system()
    return tm


def make_den_lattice(tm, tids_a, tids_b, cost_b=1.0):
    """Two competing linear paths through the lattice."""
    lat = VectorFst(LatticeWeight)
    start = lat.add_state()
    lat.set_start(start)

    def add_path(tids, cost):
        s = start
        for i, tid in enumerate(tids):
            ns = lat.add_state()
            w = (cost if i == 0 else 0.0, 0.0)
            lat.add_arc(s, Arc(tid, 0, w, ns))
            s = ns
        lat.set_final(s, (0.0, 0.0))

    add_path(tids_a, 0.0)
    add_path(tids_b, cost_b)
    return lat


def test_smbr_gradient_structure(system):
    tm = system
    T = 6
    sl1 = tm.self_loop_of(1)
    sl2 = tm.self_loop_of(6)
    num_ali = [sl1] * T
    den = make_den_lattice(tm, [sl1] * T, [sl2] * T, cost_b=0.5)
    opts = DiscriminativeOptions(criterion="smbr", acoustic_scale=1.0)
    objf, grad = compute_discriminative_objf_and_grad(
        opts, tm, num_ali, den, tm.num_pdfs)
    assert 0.0 <= objf <= 1.0
    pdf_num = tm.transition_id_to_pdf(sl1)
    pdf_den = tm.transition_id_to_pdf(sl2)
    # gradient pushes correct pdf up, competitor down
    assert (grad[:, pdf_num] > 0).all()
    assert (grad[:, pdf_den] < 0).all()
    # rows sum ~0 (posterior-weighted accuracy differences)
    np.testing.assert_allclose(grad.sum(axis=1), 0.0, atol=1e-8)


def test_mmi_gradient(system):
    tm = system
    T = 4
    sl1 = tm.self_loop_of(2)
    sl2 = tm.self_loop_of(7)
    num_ali = [sl1] * T
    den = make_den_lattice(tm, [sl1] * T, [sl2] * T, cost_b=0.0)
    opts = DiscriminativeOptions(criterion="mmi", acoustic_scale=1.0)
    objf, grad = compute_discriminative_objf_and_grad(
        opts, tm, num_ali, den, tm.num_pdfs)
    pdf_num = tm.transition_id_to_pdf(sl1)
    pdf_den = tm.transition_id_to_pdf(sl2)
    # equal-cost paths: γ_den = 0.5 each; grad = 1 - 0.5 / -0.5
    np.testing.assert_allclose(grad[:, pdf_num], 0.5, atol=1e-6)
    np.testing.assert_allclose(grad[:, pdf_den], -0.5, atol=1e-6)


def test_smbr_perfect_lattice(system):
    tm = system
    sl = tm.self_loop_of(3)
    num_ali = [sl] * 5
    den = make_den_lattice(tm, [sl] * 5, [sl] * 5)
    opts = DiscriminativeOptions(criterion="smbr", acoustic_scale=1.0)
    objf, grad = compute_discriminative_objf_and_grad(
        opts, tm, num_ali, den, tm.num_pdfs)
    assert objf == pytest.approx(1.0)
    np.testing.assert_allclose(grad, 0.0, atol=1e-8)


def test_discriminative_training_loop_improves_objf(system):
    """End-to-end sMBR fine-tuning loop (nnet3-discriminative-train
    equivalent): a small linear AM trained on a competing-path
    denominator lattice must raise the expected frame accuracy."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from kaldi_tpu.nnet3.discriminative_train import (
        DiscTrainOptions, train_discriminative)

    tm = system
    rng = np.random.default_rng(0)
    T, D = 8, 5
    sl1, sl2 = tm.self_loop_of(1), tm.self_loop_of(6)
    num_ali = [sl1] * T
    # den lattice prefers the WRONG path slightly
    den = make_den_lattice(tm, [sl2] * T, [sl1] * T, cost_b=0.3)
    feats = {"u1": rng.normal(size=(T, D)).astype(np.float32)}

    class TinyAm(nn.Module):
        @nn.compact
        def __call__(self, x):
            # zero init: equal loglikes, so the den lattice's graph
            # costs initially favor the WRONG path (acc < 0.5)
            return nn.Dense(tm.num_pdfs,
                            kernel_init=nn.initializers.zeros)(x)

    model = TinyAm()
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, T, D)))["params"]

    def apply_fn(p, f):
        return model.apply({"params": p}, f)

    params, objfs = train_discriminative(
        apply_fn, params, tm, feats, {"u1": num_ali}, {"u1": den},
        tm.num_pdfs,
        DiscTrainOptions(num_epochs=8, learning_rate=0.05,
                         acoustic_scale=1.0, criterion="smbr"))
    assert objfs[0] < 0.6, objfs
    assert objfs[-1] > 0.9, objfs
    assert objfs[-1] <= 1.0 + 1e-6


def test_rescore_lattice_acoustics(system):
    from kaldi_tpu.nnet3.discriminative_train import \
        rescore_lattice_acoustics
    tm = system
    T = 4
    sl = tm.self_loop_of(2)
    den = make_den_lattice(tm, [sl] * T, [sl] * T)
    ll = np.zeros((T, tm.num_pdfs), np.float32)
    ll[:, tm.transition_id_to_pdf(sl)] = 2.0
    out = rescore_lattice_acoustics(den, tm, ll)
    for s in range(out.num_states):
        for a in out.arcs[s]:
            if a.ilabel != 0:
                assert a.weight[1] == pytest.approx(-2.0)
