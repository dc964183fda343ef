"""Chain (LF-MMI) tests: FB correctness vs brute-force enumeration,
gradient = occupancy identity, denominator graph construction, and a
tiny end-to-end training-improves-objective check (the reference's
chain-supervision-test / derivative-check style, SURVEY.md §4.3)."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kaldi_tpu.chain.graphs import PackedGraph, batch_pack, pack_emission_fst
from kaldi_tpu.chain.objective import (ChainTrainingOptions, _forward_loglike,
                                       chain_loss)
from kaldi_tpu.chain.supervision import (alignment_to_numerator_graph,
                                         estimate_phone_lm,
                                         make_denominator_graph)
from kaldi_tpu.fstext.fst import EPS, Arc, TropicalWeight, VectorFst
from kaldi_tpu.hmm import HmmTopology, TransitionModel
from kaldi_tpu.tree import monophone_context_dependency


def brute_force_loglike(pg: PackedGraph, out: np.ndarray) -> float:
    """Enumerate all paths of length T; logsumexp of path scores."""
    T = out.shape[0]
    S = pg.num_states
    scores = []

    def rec(state, t, acc):
        if t == T:
            if pg.final[state] > -1e29:
                scores.append(acc + pg.final[state])
            return
        for a in range(pg.num_arcs):
            if pg.src[a] == state and pg.log_prob[a] > -1e29:
                rec(pg.dst[a], t + 1,
                    acc + pg.log_prob[a] + out[t, pg.pdf[a]])

    for s in range(S):
        if pg.initial[s] > -1e29:
            rec(s, 0, float(pg.initial[s]))
    if not scores:
        return -np.inf
    m = max(scores)
    return m + np.log(sum(np.exp(s - m) for s in scores))


def random_graph(seed, S=3, A=7, P=4):
    rng = np.random.default_rng(seed)
    lp = rng.uniform(-2, -0.1, A).astype(np.float32)
    initial = np.full(S, -1e30, np.float32)
    initial[0] = 0.0
    final = rng.uniform(-1, 0, S).astype(np.float32)
    return PackedGraph(rng.integers(0, S, A).astype(np.int32),
                       rng.integers(0, S, A).astype(np.int32),
                       rng.integers(0, P, A).astype(np.int32),
                       lp, initial, final)


class TestForwardBackward:
    @pytest.mark.parametrize("seed", range(4))
    def test_matches_brute_force(self, seed):
        P, T = 4, 5
        pg = random_graph(seed, P=P)
        rng = np.random.default_rng(seed + 10)
        out = rng.normal(size=(T, P)).astype(np.float32)
        got = float(_forward_loglike(
            jnp.asarray(out), jnp.asarray(pg.src), jnp.asarray(pg.dst),
            jnp.asarray(pg.pdf), jnp.asarray(pg.log_prob),
            jnp.asarray(pg.initial), jnp.asarray(pg.final),
            0.0, pg.num_states))
        want = brute_force_loglike(pg, out)
        if want == -np.inf:
            assert got < -1e28  # both "no path"
        else:
            assert got == pytest.approx(want, abs=1e-3)

    def test_gradient_is_occupancy(self):
        """d(loglike)/d(out[t,p]) must equal expected pdf-occupancy,
        which sums to 1 per frame."""
        pg = random_graph(1, P=5)
        rng = np.random.default_rng(2)
        out = jnp.asarray(rng.normal(size=(6, 5)), jnp.float32)
        f = lambda o: _forward_loglike(
            o, jnp.asarray(pg.src), jnp.asarray(pg.dst), jnp.asarray(pg.pdf),
            jnp.asarray(pg.log_prob), jnp.asarray(pg.initial),
            jnp.asarray(pg.final), 0.0, pg.num_states)
        grad = jax.grad(f)(out)
        np.testing.assert_allclose(np.asarray(grad).sum(axis=1), 1.0,
                                   atol=1e-4)
        assert (np.asarray(grad) >= -1e-6).all()

    def test_leaky_hmm_increases_loglike(self):
        pg = random_graph(3)
        rng = np.random.default_rng(3)
        out = jnp.asarray(rng.normal(size=(5, 4)), jnp.float32)
        args = (jnp.asarray(pg.src), jnp.asarray(pg.dst), jnp.asarray(pg.pdf),
                jnp.asarray(pg.log_prob), jnp.asarray(pg.initial),
                jnp.asarray(pg.final))
        base = float(_forward_loglike(out, *args, 0.0, pg.num_states))
        leaky = float(_forward_loglike(out, *args, 1e-3, pg.num_states))
        assert leaky >= base - 1e-5  # extra paths only add probability


def tiny_system():
    phones = [1, 2, 3]
    topo = HmmTopology.three_state(phones, sil_phones=[1])
    npc = {p: topo.num_pdf_classes(p) for p in phones}
    tree = monophone_context_dependency(phones, npc)
    tm = TransitionModel(topo, tree)
    return topo, tree, tm


class TestSupervision:
    def test_phone_lm(self):
        seqs = [[1, 2, 3, 2], [1, 3, 2], [2, 3]]
        lm = estimate_phone_lm(seqs, [1, 2, 3])
        assert lm.num_states == 4
        # every state has arcs for all phones
        for s in range(lm.num_states):
            assert len(lm.arcs[s]) == 3

    def test_denominator_graph(self):
        _, tree, tm = tiny_system()
        seqs = [[1, 2, 3, 2, 1], [1, 3, 3, 2, 1]]
        den = make_denominator_graph(seqs, tm, tree)
        pg = den.graph
        assert pg.num_states > 0 and pg.num_arcs > 0
        assert pg.pdf.min() >= 0 and pg.pdf.max() < tm.num_pdfs
        # initial distribution normalized
        assert np.exp(pg.initial).sum() == pytest.approx(1.0, abs=1e-3)

    def test_numerator_from_alignment(self):
        _, tree, tm = tiny_system()
        # fake alignment using self loops of state 1
        tids = []
        for ts in (1, 2, 3, 2, 1, 1):
            tids.extend([tm.self_loop_of(ts)] * 3)
        ng = alignment_to_numerator_graph(tids, tm, subsample=3)
        assert ng.num_arcs == 6
        assert (ng.pdf >= 0).all()


class TestChainLoss:
    def test_objective_finite_and_improves(self):
        _, tree, tm = tiny_system()
        P = tm.num_pdfs
        seqs = [[1, 2, 3, 2, 1], [1, 3, 2, 3, 1]]
        den = make_denominator_graph(seqs, tm, tree)
        rng = np.random.default_rng(0)
        B, T = 2, 8
        nums = []
        for b in range(B):
            tids = []
            for ts in rng.integers(1, tm.num_transition_states + 1, T):
                tids.extend([tm.self_loop_of(int(ts))] * 3)
            nums.append(alignment_to_numerator_graph(tids, tm, 3))
        num_arrays = batch_pack(nums)
        opts = ChainTrainingOptions(leaky_hmm_coefficient=1e-4)

        out = jnp.asarray(rng.normal(size=(B, T, P)) * 0.1, jnp.float32)
        objf, aux = chain_loss(opts, den, num_arrays, out)
        assert np.isfinite(float(objf))
        # objective must be <= 0-ish (num <= den since num paths are a
        # subset of den's language, roughly); just check gradient ascent
        # improves it
        grad = jax.grad(lambda o: chain_loss(opts, den, num_arrays, o)[0])(out)
        out2 = out + 1.0 * grad
        objf2, _ = chain_loss(opts, den, num_arrays, out2)
        assert float(objf2) > float(objf)
