"""Time-tolerant / lattice-derived chain supervision (parity:
chain/chain-supervision.cc AlignmentToProtoSupervision,
PhoneLatticeToProtoSupervision, TimeEnforcerFst)."""

import numpy as np
import pytest

from kaldi_tpu.chain.graphs import PackedGraph
from kaldi_tpu.chain.supervision import (alignment_to_phone_segments,
                                         alignment_to_tolerance_numerator,
                                         make_tolerance_supervision,
                                         union_graphs)
from kaldi_tpu.hmm import HmmTopology, TransitionModel
from kaldi_tpu.tree import monophone_context_dependency

PHONES = [1, 2, 3]  # N, SIL, Y


def _mono_tm():
    topo = HmmTopology.three_state(PHONES)
    npc = {p: topo.num_pdf_classes(p) for p in PHONES}
    return TransitionModel(topo, monophone_context_dependency(PHONES, npc))


def _chain_tm():
    topo = HmmTopology.chain_topology(PHONES)
    npc = {p: topo.num_pdf_classes(p) for p in PHONES}
    return TransitionModel(topo, monophone_context_dependency(PHONES, npc))


def _segment_ali(tm, segs):
    """[(phone, dur)] -> transition-id alignment staying in hmm-state 0."""
    ali = []
    for phone, dur in segs:
        entry = loop = None
        for ts in range(1, tm.num_transition_states + 1):
            if (tm.transition_state_to_phone(ts) == phone
                    and tm.tuples[ts - 1][1] == 0):  # hmm-state 0
                loop = tm.self_loop_of(ts)
                for idx in range(tm.num_transition_indices(ts)):
                    tid = tm.pair_to_transition_id(ts, idx)
                    if not tm.is_self_loop(tid):
                        entry = tid
                        break
                break
        ali.extend([entry] + [loop] * (dur - 1))
    return ali


def _forward(pg: PackedGraph, scores: np.ndarray) -> float:
    """Log-domain forward over the packed graph; scores (T, P)."""
    alpha = pg.initial.astype(np.float64).copy()
    for t in range(scores.shape[0]):
        arc = alpha[pg.src] + pg.log_prob + scores[t, pg.pdf]
        new = np.full_like(alpha, -np.inf)
        np.maximum.at(new, pg.dst, arc)  # max-approx fine for one-hot
        # exact logsumexp per dst
        new = np.full_like(alpha, -np.inf)
        for a in np.argsort(pg.dst):
            d = pg.dst[a]
            new[d] = np.logaddexp(new[d], arc[a])
        alpha = new
    return float(np.max(alpha + pg.final))


def _onehot_scores(pdf_seq, num_pdfs, good=0.0, bad=-1e9):
    s = np.full((len(pdf_seq), num_pdfs), bad, np.float64)
    for t, p in enumerate(pdf_seq):
        s[t, p] = good
    return s


@pytest.fixture(scope="module")
def tms():
    return _mono_tm(), _chain_tm()


def test_phone_segments(tms):
    mono_tm, _ = tms
    ali = _segment_ali(mono_tm, [(2, 30), (3, 24), (2, 24), (1, 27),
                                 (2, 21)])
    segs = alignment_to_phone_segments(ali, mono_tm)
    assert segs == [(2, 0, 30), (3, 30, 54), (2, 54, 78), (1, 78, 105),
                    (2, 105, 126)]


def _chain_pdf_path(chain_tm, out_segs):
    """[(phone, out_dur)] -> per-output-frame pdf sequence."""
    from kaldi_tpu.chain.supervision import _chain_pdfs_for_phone
    pdfs = []
    for phone, dur in out_segs:
        fwd, slf = _chain_pdfs_for_phone(chain_tm, phone)
        pdfs.extend([fwd] + [slf] * (dur - 1))
    return pdfs


def test_zero_tolerance_accepts_exact_path(tms):
    mono_tm, chain_tm = tms
    ali = _segment_ali(mono_tm, [(2, 30), (3, 24), (2, 24), (1, 27),
                                 (2, 21)])
    pg = alignment_to_tolerance_numerator(ali, mono_tm, chain_tm,
                                          subsample=3, left_tolerance=0,
                                          right_tolerance=0)
    # boundaries at exact /3 positions: 10, 8, 8, 9, 7 output frames
    path = _chain_pdf_path(chain_tm, [(2, 10), (3, 8), (2, 8), (1, 9),
                                      (2, 7)])
    ll = _forward(pg, _onehot_scores(path, chain_tm.num_pdfs))
    assert ll > -1.0  # accepted (unweighted: 0.0)


def test_tolerance_accepts_shifted_boundary(tms):
    mono_tm, chain_tm = tms
    ali = _segment_ali(mono_tm, [(2, 30), (3, 24), (2, 24), (1, 27),
                                 (2, 21)])
    shifted = [(2, 11), (3, 7), (2, 8), (1, 9), (2, 7)]  # +1-frame shift
    path = _chain_pdf_path(chain_tm, shifted)
    scores = _onehot_scores(path, chain_tm.num_pdfs)

    pg0 = alignment_to_tolerance_numerator(ali, mono_tm, chain_tm, 3, 0, 0)
    assert _forward(pg0, scores) < -1e8  # rejected at zero tolerance

    pg5 = alignment_to_tolerance_numerator(ali, mono_tm, chain_tm, 3, 5, 5)
    assert _forward(pg5, scores) > -1.0  # accepted with tolerance 5

    # wrong phone order is still rejected even with tolerance
    wrong = _chain_pdf_path(chain_tm, [(3, 10), (2, 8), (2, 8), (1, 9),
                                       (2, 7)])
    assert _forward(pg5, _onehot_scores(wrong, chain_tm.num_pdfs)) < -1e8

    # exact path still accepted with tolerance
    exact = _chain_pdf_path(chain_tm, [(2, 10), (3, 8), (2, 8), (1, 9),
                                       (2, 7)])
    assert _forward(pg5, _onehot_scores(exact, chain_tm.num_pdfs)) > -1.0


def test_tolerance_graph_is_compact(tms):
    mono_tm, chain_tm = tms
    ali = _segment_ali(mono_tm, [(2, 30), (3, 24), (2, 24), (1, 27),
                                 (2, 21)])
    pg = alignment_to_tolerance_numerator(ali, mono_tm, chain_tm, 3, 5, 5)
    T_out = len(ali) // 3
    # states bounded by segments x (window ~ 2*tol/sub + seg frames)
    assert pg.num_states < 5 * (T_out + 1)
    assert pg.num_arcs <= 2 * pg.num_states


def test_union_weights(tms):
    mono_tm, chain_tm = tms
    ali_a = _segment_ali(mono_tm, [(2, 30), (3, 24), (2, 21)])
    ali_b = _segment_ali(mono_tm, [(2, 30), (1, 24), (2, 21)])
    ga = alignment_to_tolerance_numerator(ali_a, mono_tm, chain_tm, 3, 0, 0)
    gb = alignment_to_tolerance_numerator(ali_b, mono_tm, chain_tm, 3, 0, 0)
    u = union_graphs([ga, gb], [np.log(0.75), np.log(0.25)])
    path_a = _chain_pdf_path(chain_tm, [(2, 10), (3, 8), (2, 7)])
    path_b = _chain_pdf_path(chain_tm, [(2, 10), (1, 8), (2, 7)])
    lla = _forward(u, _onehot_scores(path_a, chain_tm.num_pdfs))
    llb = _forward(u, _onehot_scores(path_b, chain_tm.num_pdfs))
    assert lla == pytest.approx(np.log(0.75), abs=1e-5)
    assert llb == pytest.approx(np.log(0.25), abs=1e-5)


def test_chain_loss_with_tolerance_numerator(tms):
    """FB through the real jax objective with a tolerant numerator:
    finite objective, gradient defined."""
    import jax
    import jax.numpy as jnp
    from kaldi_tpu.chain.graphs import batch_pack
    from kaldi_tpu.chain.objective import ChainTrainingOptions, chain_loss
    from kaldi_tpu.chain.supervision import make_denominator_graph

    mono_tm, chain_tm = tms
    tree = monophone_context_dependency(
        PHONES, {p: 2 for p in PHONES})
    ali = _segment_ali(mono_tm, [(2, 30), (3, 24), (2, 24), (1, 27),
                                 (2, 21)])
    pg = alignment_to_tolerance_numerator(ali, mono_tm, chain_tm, 3, 5, 5)
    den = make_denominator_graph([[2, 3, 2, 1, 2]], chain_tm, tree)
    T_out = len(ali) // 3
    num_arrays = tuple(jnp.asarray(a) for a in batch_pack([pg]))
    rng = np.random.default_rng(0)
    out = jnp.asarray(rng.normal(size=(1, T_out, chain_tm.num_pdfs))
                      .astype(np.float32))
    objf, aux = chain_loss(ChainTrainingOptions(), den, num_arrays, out)
    assert np.isfinite(float(objf))
    g = jax.grad(lambda o: chain_loss(ChainTrainingOptions(), den,
                                      num_arrays, o)[0])(out)
    assert np.all(np.isfinite(np.asarray(g)))
