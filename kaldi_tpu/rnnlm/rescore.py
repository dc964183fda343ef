"""RNNLM lattice/n-best rescoring (parity:
rnnlm/rnnlm-lattice-rescoring.h RnnlmDeterministicFst + the
lmrescore_nbest / pruned-rescoring scripts).

RnnLmDeterministic exposes the same deterministic-automaton interface
as DeterministicLm (lm/rescore.py), with states = RNN hidden states —
so the same lattice composition performs rnnlm rescoring. N-best
rescoring batches whole hypotheses through the jitted model.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from kaldi_tpu.rnnlm.model import BOS, EOS, RnnLm, sentence_logprob


class RnnLmDeterministic:
    """Deterministic on-demand automaton over word ids backed by the
    RNN. States are interned by their token history (like the
    reference, which bounds histories to max-ngram-order for state
    merging; here full histories with memoized hidden states)."""

    def __init__(self, model: RnnLm, params, lm_word_of: Dict[int, int]):
        """lm_word_of: lattice word-id -> rnnlm token id."""
        self.model = model
        self.params = params
        self.map = lm_word_of
        self._states: Dict[Tuple[int, ...], Tuple] = {}

        @jax.jit
        def _step(params, token, carry):
            logp, new_states = model.apply(
                {"params": params}, token[None, None], init_state=carry)
            return logp[0, 0], new_states
        self._step_fn = _step
        self._init_hidden()

    def _init_hidden(self):
        token = jnp.asarray(BOS, jnp.int32)
        logp, carry = self._step_fn(self.params, token, None)
        self._states[()] = (carry, np.asarray(logp))

    def start(self) -> Tuple[int, ...]:
        return ()

    def step(self, hist: Tuple[int, ...], word_id: int
             ) -> Tuple[Tuple[int, ...], float]:
        carry, logp = self._states[hist]
        tok = self.map.get(word_id, 0)
        cost = -float(logp[tok])
        new_hist = hist + (word_id,)
        if new_hist not in self._states:
            nl, nc = self._step_fn(self.params,
                                   jnp.asarray(tok, jnp.int32), carry)
            self._states[new_hist] = (nc, np.asarray(nl))
        return new_hist, cost

    def final(self, hist: Tuple[int, ...]) -> float:
        _, logp = self._states[hist]
        return -float(logp[EOS])


def rnnlm_rescore_nbest(model: RnnLm, params,
                        nbest: Sequence[Tuple[List[int], List[int], float]],
                        lm_word_of: Dict[int, int],
                        old_lm_scores: Optional[Sequence[float]] = None,
                        rnnlm_weight: float = 0.5
                        ) -> List[Tuple[List[int], List[int], float]]:
    """Rescore n-best entries (ali, words, cost): new cost =
    cost - weight*old_lm + weight*rnnlm_negloglike. With
    old_lm_scores=None the rnnlm score is simply added."""
    out = []
    for i, (ali, words, cost) in enumerate(nbest):
        toks = [lm_word_of.get(w, 0) for w in words]
        ll = sentence_logprob(model, params, toks)
        new_cost = cost + rnnlm_weight * (-ll)
        if old_lm_scores is not None:
            new_cost -= rnnlm_weight * (-old_lm_scores[i])
        out.append((ali, words, new_cost))
    out.sort(key=lambda t: t[2])
    return out
