"""Multi-chip batch-parallel decoding.

Parity: SURVEY.md §2.13 "batch-parallel decode" — the reference scales
decoding by running N processes over N GPUs (decode.sh nj=N with
cudadecoder instances). The TPU-native equivalent shards the LANE
dimension of ONE batched decode across a `jax.sharding.Mesh` with
`shard_map`: every chip runs the block-chain Pallas kernel on its
local lanes, there is NO cross-chip communication in the hot loop
(decoding is embarrassingly lane-parallel), and the host gets one
result batch back. The same pattern serves the online pipeline (shard
the streams).

Tested on the virtual 8-device CPU mesh (tests/conftest.py); on real
hardware the mesh axis maps onto ICI neighbors.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Sequence, Tuple

import numpy as np

from kaldi_tpu.base.logging import KaldiTpuError
from kaldi_tpu.decoder.block_chain import INF, BlockChainDecoder


class ShardedLexChainDecoder:
    """Lane-sharded wrapper around decoder.lexchain.LexChainDecoder —
    the round-3 shared-lexicon entry-LM decoder.  Identical contract
    to the single-device decode_batch; lanes split over the mesh's
    data axis with shard_map, no cross-chip traffic in the hot loop."""

    def __init__(self, decoder, mesh, axis: str = "data"):
        self.decoder = decoder
        self.mesh = mesh
        self.axis = axis
        self._jit = {}

    def _make(self, B_local: int, T: int):
        import jax
        import jax.numpy as jnp
        from jax.sharding import PartitionSpec as P
        try:
            from jax import shard_map
            sm_kwargs = {"check_vma": False}
        except ImportError:              # older jax
            from jax.experimental.shard_map import shard_map
            sm_kwargs = {"check_rep": False}

        dec = self.decoder
        g = dec.g
        N, Pv = g.N, g.P
        if B_local not in dec._jit:
            dec._jit[B_local] = dec._make_step(B_local)
        fwd, fol = dec._jit[B_local]
        eos = dec._c["eos"]

        def local_decode(am, active):
            cost0 = jnp.full((N, B_local), INF, jnp.float32)
            roots0 = jnp.full((Pv + 1, B_local), INF,
                              jnp.float32).at[Pv].set(0.0)
            sil0 = jnp.full((Pv + 1, B_local), INF, jnp.float32)
            cost, roots, sil, ys = fwd(cost0, roots0, sil0, am, active)
            fin_root = roots + eos
            fin_sil = sil + eos if g.use_sil else \
                jnp.full_like(fin_root, INF)
            allfin = jnp.concatenate([fin_root, fin_sil], axis=0)
            best_i = jnp.argmin(allfin, axis=0)
            best_cost = jnp.min(allfin, axis=0)
            final_state = jnp.where(
                best_i <= Pv,
                jnp.where(best_i == Pv, N + Pv, N + best_i),
                N + Pv + 1 + (best_i - (Pv + 1)))
            first, states = fol(ys, active, final_state)
            return states, best_cost, first

        sharded = shard_map(
            local_decode, mesh=self.mesh,
            in_specs=(P(None, None, self.axis), P(None, self.axis)),
            out_specs=(P(None, self.axis), P(self.axis), P(self.axis)),
            **sm_kwargs)
        return jax.jit(sharded)

    def decode_batch(self, loglikes, acoustic_scale: float = 1.0,
                     lengths: Optional[Sequence[int]] = None):
        import jax.numpy as jnp
        B, T, _ = loglikes.shape
        n_dev = self.mesh.shape[self.axis]
        if B % n_dev:
            raise KaldiTpuError(
                f"batch {B} not divisible by mesh axis {n_dev}")
        lengths = np.asarray(lengths if lengths is not None
                             else [T] * B, np.int64)
        key = (B // n_dev, T)
        if key not in self._jit:
            self._jit[key] = self._make(*key)
        am = jnp.transpose(jnp.asarray(loglikes) * (-acoustic_scale),
                           (1, 2, 0))
        active = jnp.asarray(np.arange(T)[:, None] < lengths[None, :])
        states, best_cost, first = self._jit[key](am, active)
        return self.decoder._traceback(np.asarray(states),
                                       np.asarray(first),
                                       np.asarray(best_cost), lengths)


class ShardedNgramLexDecoder:
    """Lane-sharded wrapper around decoder.lexchain_ng.NgramLexDecoder
    — the round-4 trigram x triphone production decoder.  Identical
    contract to the single-device decode_batch (including prune_k /
    prune_beam / exact_topk); lanes split over the mesh's data axis
    with shard_map, no cross-chip traffic in the hot loop."""

    def __init__(self, decoder, mesh, axis: str = "data"):
        self.decoder = decoder
        self.mesh = mesh
        self.axis = axis
        self._jit = {}

    def _make(self, B_local: int, K: int, beam: float,
              exact_topk: bool):
        import jax
        import jax.numpy as jnp
        from jax.sharding import PartitionSpec as P
        try:
            from jax import shard_map
            sm_kwargs = {"check_vma": False}
        except ImportError:              # older jax
            from jax.experimental.shard_map import shard_map
            sm_kwargs = {"check_rep": False}

        dec = self.decoder
        g = dec.g
        Nr, U = g.Nr, g.U
        dkey = (B_local, K, beam, bool(exact_topk))
        if dkey not in dec._jit:
            dec._jit[dkey] = dec._make_step(B_local, K, beam,
                                            exact_topk)
        fwd, fol = dec._jit[dkey]
        eos_slot = dec._c["eos_slot"]

        def local_decode(am, active):
            cost0 = jnp.full((Nr, B_local), INF, jnp.float32)
            roots0 = jnp.full((U + 1, B_local), INF,
                              jnp.float32).at[U].set(0.0)
            sil0 = jnp.full((U + 1, B_local), INF, jnp.float32)
            cost, roots, sil, ys = fwd(cost0, roots0, sil0, am, active)
            fin_root = roots + eos_slot
            fin_sil = sil + eos_slot if g.use_sil else \
                jnp.full_like(fin_root, INF)
            allfin = jnp.concatenate([fin_root, fin_sil], axis=0)
            best_i = jnp.argmin(allfin, axis=0)
            best_cost = jnp.min(allfin, axis=0)
            final_state = jnp.where(
                best_i <= U,
                jnp.where(best_i == U, Nr + U, Nr + best_i),
                Nr + U + 1 + (best_i - (U + 1)))
            first, states = fol(ys, active, final_state)
            return states, best_cost, first

        sharded = shard_map(
            local_decode, mesh=self.mesh,
            in_specs=(P(None, None, self.axis), P(None, self.axis)),
            out_specs=(P(None, self.axis), P(self.axis), P(self.axis)),
            **sm_kwargs)
        return jax.jit(sharded)

    def decode_batch(self, loglikes, acoustic_scale: float = 1.0,
                     lengths: Optional[Sequence[int]] = None,
                     prune_k: Optional[int] = None,
                     prune_beam: Optional[float] = None,
                     exact_topk: bool = True):
        import jax.numpy as jnp
        dec = self.decoder
        B, T, _ = loglikes.shape
        n_dev = self.mesh.shape[self.axis]
        if B % n_dev:
            raise KaldiTpuError(
                f"batch {B} not divisible by mesh axis {n_dev}")
        lengths = np.asarray(lengths if lengths is not None
                             else [T] * B, np.int64)
        K = dec.VC if prune_k is None else int(prune_k)
        from kaldi_tpu.decoder.lexchain_ng import BIG
        beam = float(BIG) if prune_beam is None else float(prune_beam)
        key = (B // n_dev, K, beam, bool(exact_topk))
        if key not in self._jit:
            self._jit[key] = self._make(*key)
        am = jnp.transpose(jnp.asarray(loglikes) * (-acoustic_scale),
                           (1, 2, 0))
        active = jnp.asarray(np.arange(T)[:, None] < lengths[None, :])
        states, best_cost, first = self._jit[key](am, active)
        return dec._traceback(np.asarray(states), np.asarray(first),
                              np.asarray(best_cost), lengths)


class ShardedBlockChainDecoder:
    """Lane-sharded wrapper around BlockChainDecoder.

    decode_batch(loglikes (B, T, P)) with B divisible by the mesh's
    'data' axis size; each device decodes B/n lanes with the same
    kernel the single-chip path uses."""

    def __init__(self, decoder: BlockChainDecoder, mesh,
                 axis: str = "data"):
        self.decoder = decoder
        self.mesh = mesh
        self.axis = axis
        self._jit = {}

    def _make(self, B_local: int, T: int):
        import jax
        import jax.numpy as jnp
        from jax.sharding import PartitionSpec as P
        try:
            from jax import shard_map
            sm_kwargs = {"check_vma": False}
        except ImportError:              # older jax
            from jax.experimental.shard_map import shard_map
            sm_kwargs = {"check_rep": False}

        dec = self.decoder
        g = dec.g
        U, V, N, Up = g.U, g.V, g.N, dec.Up
        if B_local not in dec._jit:
            dec._jit[B_local] = dec._make_step(B_local)
        fwd, fol = dec._jit[B_local]
        eos = dec._eos

        def local_decode(am, active):
            # am (T, P, B_local); active (T, B_local) — local shard
            cost0 = jnp.full((Up, N, B_local), INF, jnp.float32)
            ovr0 = jnp.full((Up, B_local), INF,
                            jnp.float32).at[V].set(0.0)
            cost, ovr, ys = fwd(cost0, ovr0, am, active)
            total = ovr[:V] + eos[:V, None]
            best_w = jnp.argmin(total, axis=0)
            best_cost = jnp.min(total, axis=0)
            final_state = U * N + best_w
            first, states = fol(ys, active, final_state)
            return states, best_cost, first

        sharded = shard_map(
            local_decode, mesh=self.mesh,
            in_specs=(P(None, None, self.axis), P(None, self.axis)),
            out_specs=(P(None, self.axis), P(self.axis), P(self.axis)),
            **sm_kwargs)
        return jax.jit(sharded)

    def decode_batch(self, loglikes, acoustic_scale: float = 1.0,
                     lengths: Optional[Sequence[int]] = None
                     ) -> List[Optional[Tuple[List[int], List[int],
                                              float]]]:
        import jax.numpy as jnp
        B, T, P_ = loglikes.shape
        n_dev = self.mesh.shape[self.axis]
        if B % n_dev:
            raise KaldiTpuError(
                f"batch {B} not divisible by mesh axis {n_dev}")
        lengths = np.asarray(lengths if lengths is not None
                             else [T] * B, np.int64)
        key = (B // n_dev, T)
        if key not in self._jit:
            self._jit[key] = self._make(*key)
        am = jnp.transpose(jnp.asarray(loglikes) * (-acoustic_scale),
                           (1, 2, 0))
        active = jnp.asarray(np.arange(T)[:, None] < lengths[None, :])
        states, best_cost, first = self._jit[key](am, active)
        states = np.asarray(states)
        best_cost = np.asarray(best_cost)
        first = np.asarray(first)
        # host traceback decode (same as BlockChainDecoder)
        g = self.decoder.g
        U, V, N = g.U, g.V, g.N
        root0 = U * N
        out = []
        for b in range(B):
            Tb = int(lengths[b])
            if best_cost[b] >= INF / 2:
                out.append(None)
                continue
            traj = [int(first[b])] + [int(states[t, b])
                                      for t in range(Tb)]
            words: List[int] = []
            tids: List[int] = []
            for t in range(1, Tb + 1):
                prev, cur = traj[t - 1], traj[t]
                if cur >= root0:
                    w = cur - root0
                    if prev == cur:
                        tids.append(g.self_tid(g.pdf_root_self[w]))
                    else:
                        tids.append(g.fwd_tid(g.pdf_wend_fwd[w]))
                        words.append(w + 1)
                else:
                    n = cur % N
                    if prev == cur:
                        tids.append(g.self_tid(g.pdf_self_row[n]))
                    else:
                        tids.append(g.fwd_tid(g.pdf_fwd_row[n]))
            out.append((words, tids, float(best_cost[b])))
        return out
