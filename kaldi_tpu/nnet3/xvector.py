"""x-vector speaker embeddings (parity: the sre16/voxceleb xvector
recipes — TDNN frame layers, statistics pooling, embedding layers,
softmax speaker classification; extraction taps the embedding layer).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from kaldi_tpu.base.logging import log
from kaldi_tpu.nnet3.components import BatchNorm, StatisticsPooling, TdnnfLayer


@dataclass(frozen=True)
class XvectorConfig:
    feat_dim: int = 24
    num_speakers: int = 100
    hidden_dim: int = 128
    bottleneck_dim: int = 32
    embed_dim: int = 64
    num_frame_layers: int = 3


class XvectorModel(nn.Module):
    cfg: XvectorConfig
    train: bool = True

    @nn.compact
    def __call__(self, feats: jnp.ndarray,
                 mask: Optional[jnp.ndarray] = None,
                 return_embedding: bool = False):
        cfg = self.cfg
        x = nn.Dense(cfg.hidden_dim, name="frame0")(feats)
        x = nn.relu(x)
        x = BatchNorm(use_running_average=not self.train, name="bn0")(x)
        for i in range(cfg.num_frame_layers):
            x = TdnnfLayer(dim=cfg.hidden_dim,
                           bottleneck_dim=cfg.bottleneck_dim,
                           time_stride=i + 1, train=self.train,
                           name=f"frame{i + 1}")(x)
        pooled = StatisticsPooling(name="stats")(x, mask)
        emb = nn.Dense(cfg.embed_dim, name="embed_a")(pooled)
        if return_embedding:
            return emb
        y = nn.relu(emb)
        y = BatchNorm(use_running_average=not self.train, name="bn_emb")(y)
        y = nn.Dense(cfg.embed_dim, name="embed_b")(y)
        y = nn.relu(y)
        logits = nn.Dense(cfg.num_speakers, name="output")(y)
        return jax.nn.log_softmax(logits, axis=-1)


def train_xvector(cfg: XvectorConfig,
                  utterances: Sequence[Tuple[np.ndarray, int]],
                  num_epochs: int = 10, batch_size: int = 16,
                  learning_rate: float = 1e-3, seed: int = 0):
    """utterances: (feats (T, D), speaker_id). Fixed-size chunks assumed
    (pad/crop upstream). Returns (model, variables)."""
    model = XvectorModel(cfg, train=True)
    T = utterances[0][0].shape[0]
    rng = jax.random.PRNGKey(seed)
    variables = model.init(rng, jnp.zeros((2, T, cfg.feat_dim)))
    params, batch_stats = variables["params"], variables.get("batch_stats", {})
    tx = optax.adam(learning_rate)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, batch_stats, opt_state, feats, labels):
        def loss_fn(p, bs):
            logp, upd = model.apply({"params": p, "batch_stats": bs}, feats,
                                    mutable=["batch_stats"])
            ll = jnp.take_along_axis(logp, labels[:, None], axis=-1)
            return -ll.mean(), upd["batch_stats"]
        (loss, new_bs), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch_stats)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), new_bs, opt_state, loss

    rng_np = np.random.default_rng(seed)
    order = np.arange(len(utterances))
    for epoch in range(num_epochs):
        rng_np.shuffle(order)
        losses = []
        for i in range(0, len(order) - batch_size + 1, batch_size):
            idx = order[i:i + batch_size]
            feats = jnp.asarray(np.stack([utterances[j][0] for j in idx]))
            labels = jnp.asarray(np.array([utterances[j][1] for j in idx]))
            params, batch_stats, opt_state, loss = step(
                params, batch_stats, opt_state, feats, labels)
            losses.append(float(loss))
        log(f"xvector epoch {epoch}: loss {np.mean(losses):.4f}")
    return model, {"params": params, "batch_stats": batch_stats}


def extract_xvectors(model: XvectorModel, variables,
                     feats_list: Sequence[np.ndarray]) -> np.ndarray:
    """Batched embedding extraction (nnet3-xvector-compute)."""
    eval_model = XvectorModel(model.cfg, train=False)
    Tmax = max(f.shape[0] for f in feats_list)
    B = len(feats_list)
    batch = np.zeros((B, Tmax, model.cfg.feat_dim), np.float32)
    mask = np.zeros((B, Tmax), np.float32)
    for i, f in enumerate(feats_list):
        batch[i, :f.shape[0]] = f
        mask[i, :f.shape[0]] = 1.0
    emb = eval_model.apply(variables, jnp.asarray(batch),
                           mask=jnp.asarray(mask), return_embedding=True)
    return np.asarray(emb)
