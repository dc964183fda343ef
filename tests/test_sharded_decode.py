"""Multi-chip batch-parallel decoding: lane-sharded block-chain decode
over the virtual 8-device CPU mesh must match the single-device batch
decoder exactly (SURVEY §2.13 batch-parallel decode; the reference's
nj=N GPU processes become one shard_map over the mesh)."""

import numpy as np
import pytest

from kaldi_tpu.decoder.block_chain import BlockChainDecoder
from tests.test_block_chain import build_small


@pytest.fixture(scope="module")
def mesh():
    import jax
    from jax.sharding import Mesh
    devs = np.array(jax.devices()[:8])
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return Mesh(devs, ("data",))


@pytest.mark.parametrize("seed", [0, 1])
def test_sharded_matches_single_device(seed, mesh):
    from kaldi_tpu.parallel.decode import ShardedBlockChainDecoder
    g = build_small(seed=seed)
    dec = BlockChainDecoder(g, interpret=True)
    rng = np.random.default_rng(seed + 3)
    B, T = 16, 9
    ll = rng.normal(size=(B, T, g.num_pdfs)).astype(np.float32)
    lens = rng.integers(5, T + 1, size=B).tolist()
    ref = dec.decode_batch(ll, acoustic_scale=1.0, lengths=lens)
    sharded = ShardedBlockChainDecoder(dec, mesh)
    got = sharded.decode_batch(ll, acoustic_scale=1.0, lengths=lens)
    for b in range(B):
        assert (got[b] is None) == (ref[b] is None)
        if ref[b] is None:
            continue
        assert got[b][0] == ref[b][0], f"lane {b} words"
        assert got[b][1] == ref[b][1], f"lane {b} tids"
        assert got[b][2] == pytest.approx(ref[b][2], abs=1e-3)


def test_indivisible_batch_rejected(mesh):
    from kaldi_tpu.base.logging import KaldiTpuError
    from kaldi_tpu.parallel.decode import ShardedBlockChainDecoder
    g = build_small(seed=0)
    dec = BlockChainDecoder(g, interpret=True)
    sharded = ShardedBlockChainDecoder(dec, mesh)
    ll = np.zeros((3, 4, g.num_pdfs), np.float32)
    with pytest.raises(KaldiTpuError):
        sharded.decode_batch(ll)


@pytest.mark.parametrize("seed,use_sil", [(0, True), (1, False)])
def test_sharded_lexchain_matches_single_device(seed, use_sil, mesh):
    """Round-3 decoder: lane-sharded LexChain decode == single-device
    (the batch-parallel path the flagship pipeline would use on a
    real multi-chip mesh)."""
    from kaldi_tpu.decoder.lexchain import LexChainDecoder, LexChainGraph
    from kaldi_tpu.parallel.decode import ShardedLexChainDecoder
    from tests.test_lexchain import random_lexicon, random_lm
    rng = np.random.default_rng(seed)
    lm = random_lm(7, rng)
    prons, pron_word, pron_cost = random_lexicon(7, rng)
    g = LexChainGraph.build(prons, lm, pron_word=pron_word,
                            pron_cost=pron_cost, num_pdfs=12,
                            use_sil=use_sil, sil_phone=4)
    dec = LexChainDecoder(g)
    B, T = 16, 9
    ll = rng.normal(size=(B, T, g.num_pdfs)).astype(np.float32)
    lens = rng.integers(5, T + 1, size=B).tolist()
    ref = dec.decode_batch(ll, acoustic_scale=1.0, lengths=lens)
    sharded = ShardedLexChainDecoder(dec, mesh)
    got = sharded.decode_batch(ll, acoustic_scale=1.0, lengths=lens)
    for b in range(B):
        assert (got[b] is None) == (ref[b] is None)
        if ref[b] is None:
            continue
        assert got[b][0] == ref[b][0], f"lane {b} words"
        assert got[b][1] == ref[b][1], f"lane {b} tids"
        assert got[b][2] == pytest.approx(ref[b][2], abs=1e-3)


def test_sharded_online_pipeline_matches_unsharded(mesh):
    """The ONLINE device pipeline under lane sharding: placing the
    resident carries on the mesh (lanes split over the data axis) must
    leave every streamed result identical — the multi-chip online
    configuration (channels spread over chips, no cross-chip traffic
    in the hot loop)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    from kaldi_tpu.decoder.lexchain import LexChainDecoder, LexChainGraph
    from kaldi_tpu.online.batched_device_pipeline import \
        BatchedDeviceOnlinePipelineLex
    from tests.test_lexchain import random_lexicon, random_lm
    rng = np.random.default_rng(2)
    lm = random_lm(6, rng)
    prons, pron_word, pron_cost = random_lexicon(6, rng)
    g = LexChainGraph.build(prons, lm, pron_word=pron_word,
                            pron_cost=pron_cost, num_pdfs=12,
                            use_sil=True, sil_phone=3)
    dec = LexChainDecoder(g)
    B, Tc = 8, 4
    lens = rng.integers(6, 13, size=B).tolist()
    lls = [rng.normal(size=(T, g.num_pdfs)).astype(np.float32)
           for T in lens]

    def run(shard: bool):
        pipe = BatchedDeviceOnlinePipelineLex(
            dec, lambda f: f, feat_dim=g.num_pdfs, num_lanes=B,
            chunk_frames=Tc)
        if shard:
            lane_sh = NamedSharding(mesh, P(None, "data"))
            pipe._cost = jax.device_put(pipe._cost, lane_sh)
            pipe._roots = jax.device_put(pipe._roots, lane_sh)
            pipe._sil = jax.device_put(pipe._sil, lane_sh)
        for b in range(B):
            pipe.init_channel(b, f"utt{b}")
        cursors = [0] * B
        r2 = np.random.default_rng(99)
        while any(c < lens[b] for b, c in enumerate(cursors)):
            for b in range(B):
                if cursors[b] < lens[b]:
                    n = min(int(r2.integers(1, 5)),
                            lens[b] - cursors[b])
                    pipe.accept_features(
                        b, lls[b][cursors[b]:cursors[b] + n])
                    cursors[b] += n
            pipe.compute()
        while pipe.compute():
            pass
        return [pipe.finalize(b) for b in range(B)]

    ref = run(False)
    got = run(True)
    for b in range(B):
        assert (got[b] is None) == (ref[b] is None)
        if ref[b] is None:
            continue
        assert got[b][0] == ref[b][0], f"lane {b} words"
        assert got[b][1] == ref[b][1], f"lane {b} tids"
        assert got[b][2] == pytest.approx(ref[b][2], abs=1e-3)
