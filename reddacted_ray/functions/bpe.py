"""Self-contained byte-pair-encoding trainer/encoder (the container has
no tokenizers package): classic Sennrich-style word-level BPE over a
frequency-weighted vocabulary. Deterministic — ties on pair frequency
break to the lexicographically smallest pair — so a retrain on the same
corpus reproduces the merge table bit-for-bit.

Reference parity note: the reference engine has no tokenizer; this is a
graft addition (task brief: token counting / tokenizer statistics for
training-data pipelines).
"""

from __future__ import annotations

from collections import Counter
from typing import Dict, List, Sequence, Tuple

Pair = Tuple[str, str]


def train_merges(vocab: Dict[str, int], n_merges: int) -> List[Pair]:
    """Learn up to ``n_merges`` merges from {word: frequency}.

    Runs on the driver over the DISTINCT vocabulary only (never the
    corpus); cost is O(n_merges * vocab symbols)."""
    words: List[Tuple[List[str], int]] = [
        (list(w), f) for w, f in sorted(vocab.items()) if len(w) >= 2
    ]
    merges: List[Pair] = []
    for _ in range(n_merges):
        counts: Counter = Counter()
        for syms, f in words:
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        tok = best[0] + best[1]
        for syms, _ in words:
            i = 0
            while i < len(syms) - 1:
                if syms[i] == best[0] and syms[i + 1] == best[1]:
                    syms[i:i + 2] = [tok]
                else:
                    i += 1
    return merges


def encode(word: str, ranks: Dict[Pair, int]) -> List[str]:
    """Encode one word with a trained merge table ({pair: rank});
    lowest-rank pair merges first (ties impossible: ranks unique)."""
    syms = list(word)
    while len(syms) >= 2:
        best_rank, best_i = None, -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def encoded_lengths(words: Sequence[str],
                    merges: List[Pair]) -> Dict[str, int]:
    """Token count per DISTINCT word — the batch kernel memoizes on the
    distinct set so the per-word Python cost is vocabulary-bounded."""
    ranks = {p: i for i, p in enumerate(merges)}
    return {w: len(encode(w, ranks)) for w in set(words)}
