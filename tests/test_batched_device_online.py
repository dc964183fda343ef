"""Device-resident batched online pipeline: streaming chunked decode
must match the offline batched decode exactly (the reference's
online/offline-equivalence contract for
batched-threaded-nnet3-cuda-online-pipeline), including ragged chunk
arrivals, idle lanes, and lane reuse."""

import numpy as np
import pytest

from kaldi_tpu.decoder.block_chain import BlockChainDecoder
from kaldi_tpu.online.batched_device_pipeline import \
    BatchedDeviceOnlinePipeline
from tests.test_block_chain import build_small


def identity_scorer(feats):
    return feats           # features ARE loglikes in these tests


@pytest.mark.parametrize("seed", [0, 1])
def test_streaming_matches_offline(seed):
    g = build_small(seed=seed)
    dec = BlockChainDecoder(g, interpret=True)
    rng = np.random.default_rng(seed + 7)
    B, Tc = 3, 4
    lens = [11, 7, 9]
    lls = [rng.normal(size=(T, g.num_pdfs)).astype(np.float32)
           for T in lens]
    pipe = BatchedDeviceOnlinePipeline(
        dec, identity_scorer, feat_dim=g.num_pdfs, num_lanes=B,
        chunk_frames=Tc)
    for b in range(B):
        pipe.init_channel(b, f"utt{b}")
    # ragged arrival: feed random-size pieces
    cursors = [0] * B
    while any(c < lens[b] for b, c in enumerate(cursors)):
        for b in range(B):
            if cursors[b] < lens[b]:
                n = int(rng.integers(1, 5))
                n = min(n, lens[b] - cursors[b])
                pipe.accept_features(b, lls[b][cursors[b]:cursors[b] + n])
                cursors[b] += n
        pipe.compute()
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
        r_words, r_tids, r_cost = ref[b]
        assert words == r_words, f"lane {b}"
        assert tids == r_tids, f"lane {b}"
        assert cost == pytest.approx(r_cost, abs=1e-3)


def test_partials_progress_and_lane_reuse():
    g = build_small(seed=0)
    dec = BlockChainDecoder(g, interpret=True)
    rng = np.random.default_rng(11)
    pipe = BatchedDeviceOnlinePipeline(
        dec, identity_scorer, feat_dim=g.num_pdfs, num_lanes=2,
        chunk_frames=4)
    ll1 = rng.normal(size=(8, g.num_pdfs)).astype(np.float32)
    pipe.init_channel(0, "a")
    pipe.accept_features(0, ll1[:4])
    pipe.compute()
    part = pipe.get_partial(0)
    assert part is not None and len(part[1]) == 4   # 4 frames aligned
    pipe.accept_features(0, ll1[4:])
    pipe.compute()
    final1 = pipe.finalize(0)
    ref1 = dec.decode_batch(ll1[None], 1.0)[0]
    assert final1[0] == ref1[0] and final1[1] == ref1[1]
    pipe.free_channel(0)
    # reuse lane 0 for a NEW utterance; lane 1 still idle
    ll2 = rng.normal(size=(6, g.num_pdfs)).astype(np.float32)
    pipe.init_channel(0, "b")
    pipe.accept_features(0, ll2)
    while pipe.compute():
        pass
    final2 = pipe.finalize(0)
    ref2 = dec.decode_batch(ll2[None], 1.0)[0]
    assert final2[0] == ref2[0] and final2[1] == ref2[1]
    assert final2[2] == pytest.approx(ref2[2], abs=1e-3)


def test_rotating_lanes_trim_bounds_history():
    """Committed-history trim: a rotating-lane session whose TOTAL
    frame count exceeds max_frames must keep streaming (history before
    the all-lane watermark is dropped), and every utterance must still
    match its offline decode exactly."""
    g = build_small(seed=0)
    dec = BlockChainDecoder(g, interpret=True)
    rng = np.random.default_rng(3)
    Tc = 4
    max_frames = 48
    pipe = BatchedDeviceOnlinePipeline(
        dec, identity_scorer, feat_dim=g.num_pdfs, num_lanes=2,
        chunk_frames=Tc, max_frames=max_frames)
    n_utt, T_u = 8, 12
    lls = [rng.normal(size=(T_u, g.num_pdfs)).astype(np.float32)
           for _ in range(n_utt)]
    refs = [dec.decode_batch(ll[None], 1.0)[0] for ll in lls]
    results = [None] * n_utt

    pipe.init_channel(0, "u0")
    pipe.accept_features(0, lls[0])
    while pipe.compute():
        pass
    for i in range(1, n_utt):
        lane, prev_lane = i % 2, (i - 1) % 2
        # overlap: utterance i starts BEFORE utterance i-1 is freed
        pipe.init_channel(lane, f"u{i}")
        pipe.accept_features(lane, lls[i])
        while pipe.compute():
            pass
        results[i - 1] = pipe.finalize(prev_lane)
        pipe.free_channel(prev_lane)
        assert pipe._total_frames <= max_frames, \
            "history not trimmed to the active window"
    results[n_utt - 1] = pipe.finalize((n_utt - 1) % 2)
    pipe.free_channel((n_utt - 1) % 2)

    # total streamed frames (8*12=96 plus chunk padding) far exceeds
    # max_frames=48 — only the watermark trim makes this session legal
    assert n_utt * T_u > max_frames
    for i in range(n_utt):
        assert results[i] is not None and refs[i] is not None, i
        words, tids, cost = results[i]
        assert words == refs[i][0], f"utt {i}"
        assert tids == refs[i][1], f"utt {i}"
        assert cost == pytest.approx(refs[i][2], abs=1e-3)


@pytest.mark.parametrize("seed,use_sil", [(0, True), (1, False)])
def test_lexchain_streaming_matches_offline(seed, use_sil):
    """Round-3 decoder in the online pipeline: chunked streaming over
    the shared-lexicon entry-LM graph == offline batch decode."""
    from kaldi_tpu.decoder.lexchain import LexChainDecoder, LexChainGraph
    from kaldi_tpu.online.batched_device_pipeline import \
        BatchedDeviceOnlinePipelineLex
    from tests.test_lexchain import random_lexicon, random_lm
    rng = np.random.default_rng(seed)
    lm = random_lm(7, rng)
    prons, pron_word, pron_cost = random_lexicon(7, rng)
    g = LexChainGraph.build(prons, lm, pron_word=pron_word,
                            pron_cost=pron_cost, num_pdfs=12,
                            use_sil=use_sil, sil_phone=4)
    dec = LexChainDecoder(g)
    B, Tc = 3, 4
    lens = [11, 7, 9]
    lls = [rng.normal(size=(T, g.num_pdfs)).astype(np.float32)
           for T in lens]
    pipe = BatchedDeviceOnlinePipelineLex(
        dec, identity_scorer, feat_dim=g.num_pdfs, num_lanes=B,
        chunk_frames=Tc)
    for b in range(B):
        pipe.init_channel(b, f"utt{b}")
    cursors = [0] * B
    while any(c < lens[b] for b, c in enumerate(cursors)):
        for b in range(B):
            if cursors[b] < lens[b]:
                n = min(int(rng.integers(1, 5)), lens[b] - cursors[b])
                pipe.accept_features(b, lls[b][cursors[b]:cursors[b] + n])
                cursors[b] += n
        pipe.compute()
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
