"""Sampled-softmax RNNLM machinery.

Parity targets:
  * rnnlm/sampling-lm-estimate.h:197 SamplingLmEstimator — estimates a
    small pruned n-gram "proposal" LM from the training text; its job
    is ONLY to be a good importance-sampling distribution, so higher-
    order n-grams are kept additively on top of the unigram
    distribution and aggressively pruned.
  * rnnlm/sampler.h:87 Sampler — draws k DISTINCT words with
    first-order inclusion probabilities q(i) = min(alpha * p(i), 1),
    alpha solved so sum q = k.
  * rnnlm/rnnlm-example-utils.cc ProcessRnnlmOutput — the sampled
    training objective: exact numerator logit for the target word plus
    an importance-weighted denominator  sum_i exp(l_i) / q_i  over the
    sample, which is an unbiased estimate of the full partition
    function; with the reference's  log Z ~ Z - 1  self-normalization
    trick the gradient only ever touches the sampled output rows.

TPU-first design: like the reference (rnnlm-example.h), ONE sample set
is shared by the whole minibatch chunk, so the output projection stays
a dense (B*T, H) x (H, k) matmul on the MXU instead of a per-position
gather — this is the entire point of the scheme on accelerators.
Sampling itself is host-side numpy (cheap, data-dependent shapes);
everything after the sample ids is jitted.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from kaldi_tpu.base.logging import KaldiTpuError, log

BOS, EOS = 1, 2  # shared with rnnlm.model


@dataclass
class SamplingLmOptions:
    """Mirrors SamplingLmEstimatorOptions (sampling-lm-estimate.h:34)."""
    vocab_size: int = 1000
    ngram_order: int = 2
    backoff_factor: float = 2.0     # keep (h,w) if p(w|h) > factor*u(w)
    bos_factor: float = 5.0         # looser keep bar for the <s> state
    unigram_power: float = 0.8      # flatten unigram (reference default)
    unigram_factor: float = 100.0


class SamplingLm:
    """Pruned additive n-gram proposal LM of ARBITRARY order
    (sampling-lm-estimate.h:197 keeps a higher-order n-gram only where
    it beats its backoff distribution by `backoff_factor`; the
    representation is additive so every history's distribution stays
    normalized):

      p(w | h) = backoff_weight(h) * p(w | backoff(h)) + sparse_h(w)

    with h a tuple of up to ngram_order-1 previous words (most recent
    LAST) and backoff(h) = h[1:] down to the flattened unigram."""

    def __init__(self, opts: SamplingLmOptions):
        self.opts = opts
        V = opts.vocab_size
        self.unigram_counts = np.zeros(V, np.float64)
        # counts[o][hist tuple of len o] -> {word: count}
        self.counts: List[Dict[tuple, Dict[int, float]]] = [
            {} for _ in range(max(opts.ngram_order - 1, 1))]
        self.unigram: Optional[np.ndarray] = None
        self.sparse: Dict[tuple, List[Tuple[int, float]]] = {}
        self.backoff_weight: Dict[tuple, float] = {}

    def process_line(self, weight: float, sentence: Sequence[int]) -> None:
        """sentence: word ids, no BOS, not EOS-terminated
        (SamplingLmEstimator::ProcessLine contract)."""
        seq = [BOS] + [int(w) for w in sentence] + [EOS]
        H = self.opts.ngram_order - 1
        for i in range(1, len(seq)):
            w = seq[i]
            if not (0 <= w < self.opts.vocab_size):
                raise KaldiTpuError(f"word id {w} out of range")
            self.unigram_counts[w] += weight
            for o in range(1, min(H, i) + 1):
                h = tuple(seq[i - o:i])
                d = self.counts[o - 1].setdefault(h, {})
                d[w] = d.get(w, 0.0) + weight

    def _value(self, hist: tuple, w: int) -> float:
        """p(w | hist) under the additive pruned representation."""
        if not hist:
            return float(self.unigram[w])
        bw = self.backoff_weight.get(hist)
        kept = self.sparse.get(hist)
        lower = self._value(hist[1:], w)
        if bw is None:
            return lower
        v = bw * lower
        if kept:
            for wd, pr in kept:
                if wd == w:
                    v += pr
                    break
        return v

    def estimate(self) -> None:
        opts = self.opts
        u = self.unigram_counts.copy()
        u[0] = 0.0
        # flatten: u^power, renormalized (reference's unigram_power —
        # fatter tails give the sampler better coverage of rare words)
        nz = u > 0
        u[nz] = u[nz] ** opts.unigram_power
        total = u.sum()
        if total <= 0:
            raise KaldiTpuError("SamplingLm: no data")
        self.unigram = (u / total).astype(np.float64)
        # floor over the WHOLE vocab (except padding id 0): words the
        # corpus never shows must still be sampleable, or their output
        # logits receive no downward pressure and the model cannot
        # self-normalize.  Any floor keeps the den estimator unbiased —
        # the importance weights compensate — it only trades variance.
        V = self.opts.vocab_size
        floor = 0.05 / max(V - 1, 1)
        keep = np.arange(V) > 0
        self.unigram = np.maximum(self.unigram, np.where(keep, floor, 0.0))
        self.unigram /= self.unigram.sum()
        # low orders first: higher orders prune against the (already
        # estimated) backoff distribution
        n_kept = 0
        for o in range(1, len(self.counts) + 1):
            for h, cnts in self.counts[o - 1].items():
                tot_h = sum(cnts.values())
                factor = opts.bos_factor if h == (BOS,) else \
                    opts.backoff_factor
                kept: List[Tuple[int, float]] = []
                kept_mass = 0.0
                for w, c in cnts.items():
                    p = c / tot_h
                    if p > factor * self._value(h[1:], w):
                        # additive: keep the part above the backoff
                        # mixture so the total stays a distribution
                        kept.append((w, p))
                        kept_mass += p
                if kept and kept_mass <= 1.0 + 1e-12:
                    # kept_mass == 1 (deterministic history) leaves a
                    # zero backoff weight — still a valid distribution
                    self.sparse[h] = kept
                    self.backoff_weight[h] = max(1.0 - kept_mass, 0.0)
                    n_kept += len(kept)
        log(f"SamplingLm(order {opts.ngram_order}): "
            f"{len(self.sparse)} histories with sparse corrections, "
            f"{n_kept} kept n-grams")

    def distribution(self, hist) -> Tuple[float, List[Tuple[int, float]]]:
        """(total unigram weight, [(word, prob), ...]) for one history
        — the sparse corrections of ALL backoff levels scaled by the
        backoff weights above them, so the pair is exactly additive
        over the flattened unigram."""
        h = tuple(hist) if isinstance(hist, (tuple, list, np.ndarray)) \
            else (int(hist),)
        h = tuple(int(x) for x in h)
        uw = 1.0
        out: List[Tuple[int, float]] = []
        while h:
            bw = self.backoff_weight.get(h)
            if bw is not None:
                for wd, pr in self.sparse.get(h, []):
                    out.append((wd, uw * pr))
                uw *= bw
            h = h[1:]
        return uw, out

    def chunk_distribution(self, hists: Sequence) -> np.ndarray:
        """Average proposal distribution over the histories appearing
        in a minibatch chunk — the reference sums the minibatch's
        per-position distributions before sampling (rnnlm-example.cc),
        since one sample set serves the whole chunk."""
        V = self.opts.vocab_size
        p = np.zeros(V, np.float64)
        n = max(len(hists), 1)
        uw = 0.0
        for h in hists:
            w, kept = self.distribution(h)
            uw += w
            for wd, pr in kept:
                p[wd] += pr
        p += uw * self.unigram
        return p / n


class Sampler:
    """sampler.h:87: k distinct words, inclusion prob min(alpha*p, 1)."""

    def __init__(self, seed: int = 0):
        self.rng = np.random.default_rng(seed)

    @staticmethod
    def inclusion_probs(p: np.ndarray, k: int) -> np.ndarray:
        """q(i) = min(alpha p(i), 1) with sum q = k (exact alpha via
        the sorted-prefix solve)."""
        p = np.asarray(p, np.float64)
        nz = p > 0
        if nz.sum() <= k:
            return (p > 0).astype(np.float64)
        order = np.argsort(-p)
        ps = p[order]
        # after capping the j largest at 1: alpha = (k - j) / suffix_sum
        suffix = np.cumsum(ps[::-1])[::-1]
        q = np.zeros_like(p)
        # cap the j largest at 1; smallest j whose rescaled remainder
        # stays under 1 is the consistent solution
        for j in range(k):
            alpha = (k - j) / suffix[j]
            if alpha * ps[j] < 1.0:
                q[order[:j]] = 1.0
                q[order[j:]] = alpha * p[order[j:]]
                return q
        q[order[:k]] = 1.0
        return q

    def sample(self, p: np.ndarray, k: int
               ) -> Tuple[np.ndarray, np.ndarray]:
        """(sample_ids (<=k,), inclusion_probs for those ids).
        Systematic PPS sampling without replacement: exactly matches
        the first-order inclusion probabilities q."""
        q = self.inclusion_probs(p, k)
        c = np.cumsum(q)
        total = c[-1]                      # == k up to fp error
        r = self.rng.uniform(0, 1)
        points = r + np.arange(int(round(total)))
        ids = np.searchsorted(c, points, side="left")
        ids = np.unique(ids)
        ids = ids[ids < len(q)]
        return ids.astype(np.int32), q[ids]


def sample_for_chunk(lm: SamplingLm, sampler: Sampler,
                     hists: np.ndarray, targets: np.ndarray,
                     num_samples: int) -> Tuple[np.ndarray, np.ndarray]:
    """One shared sample set for a minibatch chunk: the union of the
    chunk's target words (inclusion prob 1, like the reference's
    guarantee that output words are always in the sample) and
    `num_samples` words drawn from the averaged proposal.

    Returns (sample_ids (S,), weights (S,)) where weights are the
    importance weights 1/q used in the denominator."""
    tgt = np.unique(targets[targets > 0])
    p = lm.chunk_distribution(hists)
    p[tgt] = 0.0                       # targets enter with q=1 anyway
    psum = p.sum()
    ids, q = (np.zeros(0, np.int32), np.zeros(0)) if psum <= 0 else \
        sampler.sample(p / psum, num_samples)
    sample = np.concatenate([tgt, ids[~np.isin(ids, tgt)]])
    w = np.concatenate([np.ones(len(tgt)),
                        1.0 / np.maximum(q[~np.isin(ids, tgt)], 1e-8)])
    return sample.astype(np.int32), w.astype(np.float32)


def train_rnnlm_sampled(cfg, sentences: Sequence[Sequence[int]],
                        num_samples: int = 64, num_epochs: int = 5,
                        batch_size: int = 16, learning_rate: float = 1e-3,
                        seed: int = 0, l2: float = 1e-4,
                        sampling_order: int = 2):
    """Sampled-softmax RNNLM training (the reference's
    rnnlm-train/ProcessRnnlmOutput objective):

      J = sum_t  l(target_t)  -  sum_i (1/q_i) exp(l_i)   (+ const)

    The second term is an unbiased one-sample estimate of Z_t summed
    over positions; its gradient touches only the S sampled output
    rows. Models trained this way are approximately self-normalized,
    so inference can use raw logits OR a full log-softmax.

    Returns (model, params)."""
    import jax
    import jax.numpy as jnp
    import optax

    from kaldi_tpu.rnnlm.model import RnnLm, _pad_batch

    model = RnnLm(cfg)
    rng = jax.random.PRNGKey(seed)
    inp0, _ = _pad_batch(sentences[:2])
    params = model.init(rng, jnp.asarray(inp0))["params"]
    tx = optax.adam(learning_rate)
    opt_state = tx.init(params)

    # proposal LM from the same corpus (any order; see SamplingLm)
    lm = SamplingLm(SamplingLmOptions(vocab_size=cfg.vocab_size,
                                      ngram_order=sampling_order))
    for s in sentences:
        lm.process_line(1.0, s)
    lm.estimate()
    sampler = Sampler(seed)
    H = max(sampling_order - 1, 1)

    def hists_of(inp, tgt):
        if H == 1:
            return inp.ravel()
        out = []
        B_, T_ = inp.shape
        for bb in range(B_):
            for tt in range(T_):
                if tgt[bb, tt] > 0:
                    out.append(tuple(
                        int(x) for x in inp[bb, max(0, tt - H + 1):
                                            tt + 1]))
        return out

    # pad sample count to a fixed S so one jit serves every step
    S = num_samples + batch_size * 8

    @jax.jit
    def step(params, opt_state, inp, tgt_pos, sample_ids, weights):
        """inp (B,T) int32; tgt_pos (B,T) index of the target inside
        sample_ids, -1 for padding; sample_ids (S,), weights (S,)
        (0 for padding slots)."""
        def loss_fn(p):
            h, _ = model.apply({"params": p}, inp, return_hidden=True)
            W = p["output"]["kernel"]          # (H, V)
            b = p["output"]["bias"]            # (V,)
            Ws = W[:, sample_ids]              # (H, S) — MXU matmul next
            bs = b[sample_ids]
            logits = jnp.einsum("bth,hs->bts", h, Ws) + bs
            mask = (tgt_pos >= 0).astype(jnp.float32)
            num = jnp.take_along_axis(
                logits, jnp.maximum(tgt_pos, 0)[..., None], axis=-1
            )[..., 0] * mask
            # denominator: unbiased estimate of Z via importance
            # weights; exp clipped for safety early in training
            den = (jnp.exp(jnp.clip(logits, -30.0, 30.0))
                   * weights[None, None, :]).sum(-1) * mask
            n_tok = jnp.maximum(mask.sum(), 1.0)
            objf = (num - den).sum() / n_tok + 1.0
            l2_term = l2 * sum(jnp.sum(x * x) for x in
                               jax.tree.leaves(p))
            return -(objf) + l2_term
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
            ids, w = sample_for_chunk(lm, sampler, hists_of(inp, tgt),
                                      tgt.ravel(), num_samples)
            if len(ids) > S:
                ids, w = ids[:S], w[:S]
            pad = S - len(ids)
            ids_p = np.concatenate([ids, np.zeros(pad, np.int32)])
            w_p = np.concatenate([w, np.zeros(pad, np.float32)])
            # position of each target inside the sample (-1 = pad)
            pos_of = np.full(cfg.vocab_size, -1, np.int64)
            pos_of[ids] = np.arange(len(ids))
            tgt_pos = np.where(tgt > 0, pos_of[tgt], -1)
            params, opt_state, loss = step(
                params, opt_state, jnp.asarray(inp),
                jnp.asarray(tgt_pos), jnp.asarray(ids_p),
                jnp.asarray(w_p))
            losses.append(float(loss))
        log(f"rnnlm-sampled epoch {epoch}: loss {np.mean(losses):.4f} "
            f"(S={S} of V={cfg.vocab_size})")
    return model, params
