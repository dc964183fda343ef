"""Endpointing + dynamic channel rebinding in the batched device
online pipeline (VERDICT r3 missing #4/#5): endpoint rules evaluated
per lane on device state, endpointed lanes finalize and accept the
next utterance mid-stream, and 4N utterances stream through N lanes
with results equal to the offline batched decode.

Parity: online2/online-endpoint.h:123,175 (rules) +
cudadecoder/cuda-online-pipeline-dynamic-batcher.h:38 (batcher)."""

import os
import sys

import numpy as np
import pytest

from kaldi_tpu.decoder.lexchain_ng import NgramLexDecoder
from kaldi_tpu.online.batched_device_pipeline import (
    BatchedDeviceOnlinePipelineNg, OnlineDynamicBatcher)
from kaldi_tpu.online.decoding import (EndpointRule,
                                       OnlineEndpointConfig)

sys.path.insert(0, os.path.dirname(__file__))
from test_lexchain_ng import build_graph


def identity_scorer(feats):
    return feats


def make_utts(g, rng, n, sil_tail=6):
    """Loglike matrices whose tail frames strongly favor the silence
    pdfs — real trailing silence for the endpoint rules to detect."""
    utts = []
    for i in range(n):
        T = int(rng.integers(6, 10))
        ll = rng.normal(size=(T + sil_tail, g.num_pdfs)) \
            .astype(np.float32)
        ll[T:, :] -= 4.0
        ll[T:, g.sil_pdf_fwd] += 8.0
        ll[T:, g.sil_pdf_self] += 8.0
        utts.append(ll)
    return utts


@pytest.fixture(scope="module")
def system():
    g, rng = build_graph(3, V=8, use_sil=True, synth_context=3)
    dec = NgramLexDecoder(g)
    return g, dec, rng


def test_ng_streaming_matches_offline(system):
    g, dec, rng = system
    B, Tc = 3, 4
    lens = [11, 7, 9]
    lls = [rng.normal(size=(T, g.num_pdfs)).astype(np.float32)
           for T in lens]
    pipe = BatchedDeviceOnlinePipelineNg(
        dec, identity_scorer, feat_dim=g.num_pdfs, num_lanes=B,
        chunk_frames=Tc, prune_k=dec.VC, prune_beam=1e9)
    for b in range(B):
        pipe.init_channel(b, f"utt{b}")
        pipe.accept_features(b, lls[b])
        pipe.input_finished(b)
    while pipe.compute():
        pass
    results = [pipe.finalize(b) for b in range(B)]
    Tmax = max(lens)
    batch = np.zeros((B, Tmax, g.num_pdfs), np.float32)
    for b in range(B):
        batch[b, :lens[b]] = lls[b]
    ref = dec.decode_batch(batch, acoustic_scale=1.0, lengths=lens)
    for b in range(B):
        assert results[b] is not None and ref[b] is not None
        words, tids, cost = results[b]
        assert words == ref[b][0], f"lane {b}"
        assert tids == ref[b][1], f"lane {b}"
        assert cost == pytest.approx(ref[b][2], abs=1e-3)


def test_endpoint_rotation_4n_through_n(system):
    """4N utterances with real trailing silence through N lanes;
    endpoint-triggered finalize/rebind; words match offline decode of
    each full utterance."""
    g, dec, rng = system
    N_LANES, Tc = 2, 4
    utts = make_utts(g, rng, 4 * N_LANES, sil_tail=8)
    pipe = BatchedDeviceOnlinePipelineNg(
        dec, identity_scorer, feat_dim=g.num_pdfs,
        num_lanes=N_LANES, chunk_frames=Tc, endpointing=True,
        prune_k=dec.VC, prune_beam=1e9)
    # frames here are abstract (identity scorer): frame_shift=1 and
    # rule thresholds in frames; rule: >=4 trailing-sil frames after
    # nonsilence was seen
    config = OnlineEndpointConfig(
        rule1=EndpointRule(False, 1e9, float("inf"), 0.0),
        rule2=EndpointRule(True, 4.0, float("inf"), 0.0),
        rule3=EndpointRule(True, 1e9, 8.0, 0.0),
        rule4=EndpointRule(True, 1e9, float("inf"), 0.0),
        rule5=EndpointRule(False, 0.0, float("inf"), 1e9))
    batcher = OnlineDynamicBatcher(pipe, endpoint_config=config,
                                   frame_shift=1.0)
    for i, ll in enumerate(utts):
        batcher.push(f"u{i:02d}", ll)
    results = batcher.run()
    assert len(results) == len(utts)
    assert any(batcher.endpointed.values()), \
        "no endpoint fired despite engineered trailing silence"
    # offline reference on the FULL utterances
    Tmax = max(len(x) for x in utts)
    batch = np.zeros((len(utts), Tmax, g.num_pdfs), np.float32)
    lens = []
    for i, ll in enumerate(utts):
        batch[i, :len(ll)] = ll
        lens.append(len(ll))
    ref = dec.decode_batch(batch, acoustic_scale=1.0, lengths=lens)
    n_match = 0
    for i in range(len(utts)):
        got = results[f"u{i:02d}"]
        assert got is not None and ref[i] is not None
        n_match += got[0] == ref[i][0]
    # endpointed lanes cut inside the trailing silence, so word
    # sequences must all match the offline decode
    assert n_match == len(utts), f"{n_match}/{len(utts)} word-equal"


def test_endpoint_requires_nonsilence(system):
    """rule2 (must_contain_nonsilence) does not fire on an utterance
    that is silence from the start; rule1 (pure silence) does."""
    g, dec, rng = system
    pipe = BatchedDeviceOnlinePipelineNg(
        dec, identity_scorer, feat_dim=g.num_pdfs, num_lanes=1,
        chunk_frames=4, endpointing=True, prune_k=dec.VC,
        prune_beam=1e9)
    T = 16
    ll = rng.normal(size=(T, g.num_pdfs)).astype(np.float32) - 4.0
    ll[:, g.sil_pdf_fwd] += 8.0
    ll[:, g.sil_pdf_self] += 8.0
    pipe.init_channel(0, "sil_only")
    pipe.accept_features(0, ll)
    pipe.input_finished(0)
    while pipe.compute():
        pass
    rule2_only = OnlineEndpointConfig(
        rule1=EndpointRule(False, 1e9, float("inf"), 0.0),
        rule2=EndpointRule(True, 4.0, float("inf"), 0.0),
        rule3=EndpointRule(True, 1e9, 8.0, 0.0),
        rule4=EndpointRule(True, 1e9, float("inf"), 0.0),
        rule5=EndpointRule(False, 0.0, float("inf"), 1e9))
    assert not pipe.endpoint_detected(0, rule2_only, frame_shift=1.0)
    rule1_fires = OnlineEndpointConfig(
        rule1=EndpointRule(False, 8.0, float("inf"), 0.0),
        rule2=EndpointRule(True, 1e9, float("inf"), 0.0),
        rule3=EndpointRule(True, 1e9, 8.0, 0.0),
        rule4=EndpointRule(True, 1e9, float("inf"), 0.0),
        rule5=EndpointRule(False, 0.0, float("inf"), 1e9))
    assert pipe.endpoint_detected(0, rule1_fires, frame_shift=1.0)
