"""Acoustic model architectures.

ChainTdnnf mirrors the reference's flagship chain TDNN-F recipe
(egs/librispeech/s5/local/chain/tuning/run_tdnn_1d.sh: 17 TDNN-F
layers, dim 1536 / bottleneck 160, frame-subsampling 3, chain + xent
output heads; ~22.6M params) as a single jittable flax module. The
xconfig DSL → this module mapping lives in nnet3/xconfig (importer
milestone).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from kaldi_tpu.nnet3.components import BatchNorm, Prefinal, TdnnfLayer


@dataclass(frozen=True)
class ChainTdnnfConfig:
    feat_dim: int = 40
    ivector_dim: int = 0
    num_pdfs: int = 3456
    hidden_dim: int = 1536
    bottleneck_dim: int = 160
    prefinal_dim: int = 256
    num_layers: int = 17
    # layer index (1-based among tdnnf layers) after which to subsample
    subsample_layer: int = 8
    frame_subsampling_factor: int = 3
    # time_stride per layer: layer 1 uses 1..; mirrors tdnn_1d: first
    # layer stride 1, layer after subsampling stride 3, one stride-0 layer
    dropout: float = 0.0

    def time_strides(self) -> Sequence[int]:
        out = []
        for i in range(1, self.num_layers + 1):
            if i <= 3:
                out.append(1)
            elif i == 4:
                out.append(0)
            else:
                out.append(3 if i > self.subsample_layer else 1)
        return out


class ChainTdnnf(nn.Module):
    cfg: ChainTdnnfConfig
    train: bool = True

    @nn.compact
    def __call__(self, feats: jnp.ndarray,
                 ivectors: Optional[jnp.ndarray] = None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """feats: (B, T, feat_dim); ivectors: (B, ivector_dim) or None.
        Returns (chain_out, xent_out), each (B, ceil(T/sub), num_pdfs)."""
        cfg = self.cfg
        x = feats
        if ivectors is not None and cfg.ivector_dim:
            iv = jnp.repeat(ivectors[:, None, :], x.shape[1], axis=1)
            x = jnp.concatenate([x, iv], axis=-1)
        # lda-equivalent input affine (the reference uses a fixed LDA-like
        # transform; a learned input affine is equivalent capacity)
        x = nn.Dense(cfg.hidden_dim, name="input_affine")(x)
        x = nn.relu(x)
        x = BatchNorm(use_running_average=not self.train, name="input_bn")(x)

        strides = cfg.time_strides()
        for i, ts in enumerate(strides, start=1):
            sub = (cfg.frame_subsampling_factor
                   if i == cfg.subsample_layer else 1)
            x = TdnnfLayer(dim=cfg.hidden_dim,
                           bottleneck_dim=cfg.bottleneck_dim,
                           time_stride=ts, subsample=sub,
                           train=self.train, name=f"tdnnf{i}")(x)
            if cfg.dropout > 0 and self.train:
                x = nn.Dropout(cfg.dropout, deterministic=False)(x)

        pre_chain = Prefinal(cfg.hidden_dim, cfg.prefinal_dim,
                             train=self.train, name="prefinal_chain")(x)
        chain_out = nn.Dense(cfg.num_pdfs, name="output_affine")(pre_chain)
        pre_xent = Prefinal(cfg.hidden_dim, cfg.prefinal_dim,
                            train=self.train, name="prefinal_xent")(x)
        xent_out = nn.Dense(cfg.num_pdfs, name="output_xent_affine")(pre_xent)
        xent_out = jax.nn.log_softmax(xent_out, axis=-1)
        return chain_out, xent_out


def count_params(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
