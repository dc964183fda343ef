"""RNN language model (capability parity: src/rnnlm — embedding +
recurrent core + trainers, SURVEY.md §2.8).

TPU-first redesign: where the reference avoids the full softmax with
importance sampling (sampling-lm-estimate.h) because of GPU memory
bandwidth of its era, the flax LSTM below just computes the full
softmax inside one jitted step — vocabularies at the reference's scale
(~200k) fit comfortably in a single MXU matmul; sampled softmax can be
reintroduced for extreme vocabularies later.
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

BOS, EOS = 1, 2  # conventional ids; 0 = padding


@dataclass(frozen=True)
class RnnLmConfig:
    vocab_size: int = 1000
    embed_dim: int = 128
    hidden_dim: int = 256
    num_layers: int = 1


class RnnLm(nn.Module):
    cfg: RnnLmConfig

    @nn.compact
    def __call__(self, tokens: jnp.ndarray, init_state=None,
                 return_hidden: bool = False):
        """tokens (B, T) -> (logprobs (B, T, V), final_state); with
        return_hidden, (hidden (B, T, H), final_state) BEFORE the
        output projection (for sampled-softmax training)."""
        cfg = self.cfg
        x = nn.Embed(cfg.vocab_size, cfg.embed_dim, name="embed")(tokens)
        states = []
        for l in range(cfg.num_layers):
            cell = nn.OptimizedLSTMCell(cfg.hidden_dim, name=f"lstm{l}")
            B = tokens.shape[0]
            if init_state is None:
                carry = cell.initialize_carry(
                    jax.random.PRNGKey(0), (B, x.shape[-1]))
            else:
                carry = init_state[l]
            def scan_fn(cell, carry, xt):
                return cell(carry, xt)
            scanned = nn.transforms.scan(
                scan_fn, variable_broadcast="params",
                split_rngs={"params": False}, in_axes=1, out_axes=1)
            carry, x = scanned(cell, carry, x)
            states.append(carry)
        if return_hidden:
            return x, states
        logits = nn.Dense(cfg.vocab_size, name="output")(x)
        return jax.nn.log_softmax(logits, axis=-1), states


def _pad_batch(seqs: Sequence[Sequence[int]]) -> Tuple[np.ndarray, np.ndarray]:
    T = max(len(s) for s in seqs) + 1
    B = len(seqs)
    inp = np.zeros((B, T), np.int32)
    tgt = np.zeros((B, T), np.int32)
    for b, s in enumerate(seqs):
        full = [BOS] + list(s) + [EOS]
        inp[b, :len(full) - 1] = full[:-1]
        tgt[b, :len(full) - 1] = full[1:]
    return inp, tgt


def train_rnnlm(cfg: RnnLmConfig, sentences: Sequence[Sequence[int]],
                num_epochs: int = 5, batch_size: int = 16,
                learning_rate: float = 1e-3, seed: int = 0):
    """Returns (model, params). Sentences are word-id lists (ids >= 3;
    0=pad, 1=<s>, 2=</s>)."""
    model = RnnLm(cfg)
    rng = jax.random.PRNGKey(seed)
    inp0, _ = _pad_batch(sentences[:2])
    params = model.init(rng, jnp.asarray(inp0))["params"]
    tx = optax.adam(learning_rate)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, inp, tgt):
        def loss_fn(p):
            logp, _ = model.apply({"params": p}, inp)
            mask = (tgt != 0).astype(jnp.float32)
            ll = jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
            return -(ll * mask).sum() / jnp.maximum(mask.sum(), 1.0)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    order = np.arange(len(sentences))
    rng_np = np.random.default_rng(seed)
    for epoch in range(num_epochs):
        rng_np.shuffle(order)
        losses = []
        for i in range(0, len(order) - batch_size + 1, batch_size):
            batch = [sentences[j] for j in order[i:i + batch_size]]
            inp, tgt = _pad_batch(batch)
            params, opt_state, loss = step(params, opt_state,
                                           jnp.asarray(inp), jnp.asarray(tgt))
            losses.append(float(loss))
        log(f"rnnlm epoch {epoch}: loss {np.mean(losses):.4f}")
    return model, params


def sentence_logprob(model: RnnLm, params, sentence: Sequence[int]) -> float:
    inp, tgt = _pad_batch([sentence])
    logp, _ = model.apply({"params": params}, jnp.asarray(inp))
    mask = (tgt != 0)
    ll = np.asarray(jnp.take_along_axis(logp, jnp.asarray(tgt)[..., None],
                                        axis=-1))[0, :, 0]
    return float(ll[mask[0]].sum())
