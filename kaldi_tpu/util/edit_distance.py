"""Edit distance / WER (parity: bin/compute-wer.cc, bin/align-text.cc)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Sequence, Tuple


@dataclass
class WerStats:
    errors: int = 0
    ref_words: int = 0
    ins: int = 0
    dels: int = 0
    subs: int = 0
    sentences: int = 0
    wrong_sentences: int = 0

    @property
    def wer(self) -> float:
        return 100.0 * self.errors / max(self.ref_words, 1)

    def add(self, ref: Sequence[str], hyp: Sequence[str]) -> None:
        i, d, s = edit_distance_counts(ref, hyp)
        self.ins += i
        self.dels += d
        self.subs += s
        self.errors += i + d + s
        self.ref_words += len(ref)
        self.sentences += 1
        if i + d + s:
            self.wrong_sentences += 1

    def report(self) -> str:
        return (f"%WER {self.wer:.2f} [ {self.errors} / {self.ref_words}, "
                f"{self.ins} ins, {self.dels} del, {self.subs} sub ]")


def edit_distance_counts(ref: Sequence, hyp: Sequence
                         ) -> Tuple[int, int, int]:
    """Returns (insertions, deletions, substitutions) of the best
    alignment (sub/del/ins costs 1, like compute-wer)."""
    R, H = len(ref), len(hyp)
    # dp[j] = (total, ins, del, sub)
    prev = [(j, j, 0, 0) for j in range(H + 1)]
    for i in range(1, R + 1):
        cur = [(i, 0, i, 0)]
        for j in range(1, H + 1):
            # substitution / correct
            t, ii, dd, ss = prev[j - 1]
            if ref[i - 1] != hyp[j - 1]:
                cand = (t + 1, ii, dd, ss + 1)
            else:
                cand = (t, ii, dd, ss)
            # deletion (ref word dropped)
            t, ii, dd, ss = prev[j]
            if t + 1 < cand[0]:
                cand = (t + 1, ii, dd + 1, ss)
            # insertion
            t, ii, dd, ss = cur[j - 1]
            if t + 1 < cand[0]:
                cand = (t + 1, ii + 1, dd, ss)
            cur.append(cand)
        prev = cur
    _, i, d, s = prev[H]
    return i, d, s


def align_text(ref: Sequence[str], hyp: Sequence[str],
               eps: str = "<eps>") -> List[Tuple[str, str]]:
    """Best alignment as (ref_word-or-eps, hyp_word-or-eps) pairs."""
    R, H = len(ref), len(hyp)
    dp = [[0] * (H + 1) for _ in range(R + 1)]
    for i in range(R + 1):
        dp[i][0] = i
    for j in range(H + 1):
        dp[0][j] = j
    for i in range(1, R + 1):
        for j in range(1, H + 1):
            dp[i][j] = min(dp[i - 1][j - 1] + (ref[i - 1] != hyp[j - 1]),
                           dp[i - 1][j] + 1, dp[i][j - 1] + 1)
    out = []
    i, j = R, H
    while i > 0 or j > 0:
        if (i > 0 and j > 0
                and dp[i][j] == dp[i - 1][j - 1] + (ref[i - 1] != hyp[j - 1])):
            out.append((ref[i - 1], hyp[j - 1]))
            i, j = i - 1, j - 1
        elif i > 0 and dp[i][j] == dp[i - 1][j] + 1:
            out.append((ref[i - 1], eps))
            i -= 1
        else:
            out.append((eps, hyp[j - 1]))
            j -= 1
    out.reverse()
    return out
