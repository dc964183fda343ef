"""Offline batched full-pipeline decoder: wav -> features -> acoustic
model -> device Viterbi search -> words, all batched on one chip.

TPU-native equivalent of the reference's offline batched GPU pipeline
`BatchedThreadedNnet3CudaPipeline2`
(src/cudadecoder/batched-threaded-nnet3-cuda-pipeline2.h:57, driven by
src/cudadecoderbin/batched-wav-nnet3-cuda2.cc — whose printed
`RealTimeX = total_audio/total_time` is the metric of record).  Where
the reference multiplexes utterance chunks onto GPU lanes with host
thread pools, the TPU design runs three fully-batched device programs
back to back:

  1. fused frontend (window/FFT/mel/DCT) over the padded wave batch
     (kaldi_tpu.feat.frontend, cudafeat equivalent);
  2. chain TDNN-F forward in bf16, one dispatch for the whole batch
     (BatchedStaticNnet3 equivalent, batched-static-nnet3.h:42);
  3. exact batched Viterbi over the decoding graph on device
     (BlockChainDecoder; cuda-decoder.h:171 lanes == batch dim).

Host work is only wave staging and the final word lookup, mirroring
the reference's device-search/host-assembly split.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from kaldi_tpu.base.logging import log


@dataclass
class PipelineStats:
    total_audio_s: float = 0.0
    wall_s: float = 0.0
    feat_s: float = 0.0
    am_s: float = 0.0
    search_s: float = 0.0

    @property
    def xrt(self) -> float:
        return self.total_audio_s / self.wall_s if self.wall_s else 0.0


class BatchedOfflinePipeline2:
    """decode_batch(waves) -> list of (word_ids, total_cost)."""

    def __init__(self, model, params, batch_stats, decoder,
                 feature_computer, acoustic_scale: float = 1.0,
                 sample_rate: float = 16000.0,
                 search_kwargs: Optional[dict] = None,
                 ivector_extractor=None):
        """model: ChainTdnnf (train=False); decoder: any duck-typed
        decode_batch (LexChainDecoder, NgramLexDecoder, ...);
        search_kwargs are forwarded to decoder.decode_batch (e.g.
        prune_k/prune_beam for the pruned expansions).

        ivector_extractor: optional BatchedIvectorExtractor — the
        batched device i-vector leg (cudafeat
        feature-online-batched-ivector-cuda.h:44): whole-utterance
        i-vectors computed on device from the same staged features and
        fed to the AM as its second input."""
        import jax
        import jax.numpy as jnp
        self.model = model
        self.decoder = decoder
        self.feats = feature_computer
        self.acoustic_scale = acoustic_scale
        self.sample_rate = sample_rate
        self.search_kwargs = dict(search_kwargs or {})
        self.ivec = ivector_extractor
        self._params = params
        self._batch_stats = batch_stats

        def am_forward(feats_b, ivecs_b=None):
            chain_out, _ = model.apply(
                {"params": params, "batch_stats": batch_stats},
                feats_b.astype(jnp.bfloat16),
                None if ivecs_b is None
                else ivecs_b.astype(jnp.bfloat16))
            return chain_out.astype(jnp.float32)

        self._am_forward = jax.jit(am_forward)

    def decode_batch(self, waves: Sequence[np.ndarray],
                     stats: Optional[PipelineStats] = None,
                     generate_lattices: bool = False,
                     lattice_beam: float = 8.0,
                     lat_stats: Optional[dict] = None,
                     num_waves: int = 1):
        """generate_lattices=False: per lane (word_ids, total_cost).
        generate_lattices=True: per lane (word_ids, total_cost,
        word Lattice) — the search runs in lattice mode (device dumps
        of top-J word predecessors, host assembly, cudadecoder's
        GetRawLattice + LatticePostprocessor split).

        num_waves > 1 splits the batch into contiguous waves whose
        host->device audio transfers are ALL started up front (async
        device_put), so wave i+1's ingest overlaps wave i's compute —
        the tunnel-attached chip's ~20MB/s link otherwise serializes
        with the compute (BASELINE.md).  The reference overlaps its
        H2D the same way with per-lane cudaMemcpyAsync streams
        (cudadecoder/batched-threaded-nnet3-cuda-pipeline2.h:57)."""
        import jax
        import jax.numpy as jnp
        t_all = time.time()
        B = len(waves)
        W = max(1, min(int(num_waves), B))
        bounds = np.linspace(0, B, W + 1).astype(int)
        chunks = [waves[bounds[i]:bounds[i + 1]] for i in range(W)
                  if bounds[i + 1] > bounds[i]]
        # stage + launch ALL ingest transfers before any compute
        t0 = time.time()
        stageds = []
        for cw in chunks:
            batch, lengths, nframes, bucket_f = \
                self.feats.stage_batch(cw)
            stageds.append((jax.device_put(batch), lengths, nframes,
                            bucket_f))
        t_feat = time.time() - t0
        t_am = t_search = 0.0
        out: list = []
        for cw, staged in zip(chunks, stageds):
            # 1. features: fused batched device program; the features
            # STAY on device for the AM
            t0 = time.time()
            feats_d, dims = self.feats.compute_batch_device(
                staged=staged)
            T = int(feats_d.shape[1])
            t_feat += time.time() - t0
            # 2. acoustic model (one batched dispatch, bf16); padded
            # feature rows are garbage but masked by out_lens
            t0 = time.time()
            if self.ivec is not None:
                ivecs = self.ivec.extract_batch(feats_d, dims)
                loglikes = self._am_forward(feats_d, ivecs)
            else:
                loglikes = self._am_forward(feats_d)
            sub = max(1, -(-T // loglikes.shape[1]))
            out_lens = -(-dims // sub)
            t_am += time.time() - t0
            # 3. device search (+ lattice assembly)
            t0 = time.time()
            if generate_lattices:
                from kaldi_tpu.lat.functions import lattice_best_path
                lats = self.decoder.decode_batch_lattice(
                    loglikes, self.acoustic_scale, lengths=out_lens,
                    lattice_beam=lattice_beam, stats=lat_stats)
                for lt in lats:
                    if lt is None:
                        out.append(None)
                        continue
                    _ali, words, cost = lattice_best_path(lt)
                    out.append((words, cost, lt))
            else:
                hyps = self.decoder.decode_batch(
                    loglikes, self.acoustic_scale, lengths=out_lens,
                    **self.search_kwargs)
                out.extend(None if h is None else (h[0], h[2])
                           for h in hyps)
            t_search += time.time() - t0
        wall = time.time() - t_all
        if stats is not None:
            stats.total_audio_s += sum(len(w) for w in waves) / \
                self.sample_rate
            stats.wall_s += wall
            stats.feat_s += t_feat
            stats.am_s += t_am
            stats.search_s += t_search
        return out
