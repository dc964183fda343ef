"""x-vector training + extraction: embeddings separate synthetic
speakers; PLDA on xvectors scores same > diff; chain topology check."""

import numpy as np
import pytest

from kaldi_tpu.hmm import HmmTopology, TransitionModel
from kaldi_tpu.ivector.plda import train_plda
from kaldi_tpu.nnet3.xvector import (XvectorConfig, XvectorModel,
                                     extract_xvectors, train_xvector)
from kaldi_tpu.tree import monophone_context_dependency


def make_speaker_data(num_spk=4, utts_per_spk=6, T=50, D=12, seed=0):
    rng = np.random.default_rng(seed)
    spk_shift = rng.normal(scale=2.0, size=(num_spk, D))
    data = []
    for s in range(num_spk):
        for _ in range(utts_per_spk):
            x = spk_shift[s] + rng.normal(size=(T, D))
            data.append((x.astype(np.float32), s))
    return data


@pytest.mark.slow
def test_xvector_discriminates_speakers():
    data = make_speaker_data()
    cfg = XvectorConfig(feat_dim=12, num_speakers=4, hidden_dim=32,
                        bottleneck_dim=8, embed_dim=16, num_frame_layers=2)
    model, variables = train_xvector(cfg, data, num_epochs=15,
                                     batch_size=8, learning_rate=3e-3)
    embs = extract_xvectors(model, variables, [f for f, _ in data])
    labels = np.array([s for _, s in data])
    # same-speaker cosine similarity > different-speaker
    def cos(a, b):
        return a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9)
    same, diff = [], []
    for i in range(len(embs)):
        for j in range(i + 1, len(embs)):
            (same if labels[i] == labels[j] else diff).append(
                cos(embs[i], embs[j]))
    assert np.mean(same) > np.mean(diff) + 0.1
    # PLDA on the embeddings
    classes = {}
    for e, s in zip(embs, labels):
        classes.setdefault(str(s), []).append(e)
    plda = train_plda(classes)
    t0 = plda.transform_ivector(embs[0])
    llr_same = plda.log_likelihood_ratio(t0, 1, plda.transform_ivector(embs[1]))
    llr_diff = plda.log_likelihood_ratio(
        t0, 1, plda.transform_ivector(embs[-1]))
    assert llr_same > llr_diff


def test_chain_topology():
    topo = HmmTopology.chain_topology([1, 2, 3])
    assert not topo.is_hmm()
    assert topo.num_pdf_classes(1) == 2
    npc = {p: 2 for p in (1, 2, 3)}
    tree = monophone_context_dependency([1, 2, 3], npc)
    tm = TransitionModel(topo, tree)
    # each phone: 1 emitting state, 2 transitions
    assert tm.num_transition_states == 3
    assert tm.num_transition_ids == 6
    for ts in range(1, 4):
        sl = tm.self_loop_of(ts)
        assert sl and tm.is_self_loop(sl)
        # forward and self-loop use different pdfs (chain convention)
        fwd = tm.transition_state_to_forward_pdf(ts)
        slf = tm.transition_state_to_self_loop_pdf(ts)
        assert fwd != slf
    # serialization roundtrip (Tuples format with -1 marker)
    import io
    buf = io.BytesIO()
    tm.write(buf, True)
    buf.seek(0)
    tm2 = TransitionModel.read(io.BufferedReader(buf), True)
    assert tm2.tuples == tm.tuples
