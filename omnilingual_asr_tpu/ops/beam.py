"""CTC prefix beam search (host-side, LM-free).

Greedy best-path decoding (ops/ctc.py) is the serving default; this module
provides the standard prefix beam search for accuracy-critical offline runs:
it sums probability over all alignments of each prefix (p_blank/p_nonblank
per prefix) instead of committing to the single best path.

Top-K class pruning per frame keeps the host cost linear and small: with
K=8 candidates per frame and beams<=16 a 30 s window decodes in
milliseconds. Engine integration note: timestamps still come from the
greedy alignment (beam rescoring refines text only), so the search operates
per segment span.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, List, Tuple

import numpy as np

LOG_ZERO = -1e30


def _logsumexp2(a: float, b: float) -> float:
    if a <= LOG_ZERO:
        return b
    if b <= LOG_ZERO:
        return a
    m = a if a > b else b
    return m + math.log(math.exp(a - m) + math.exp(b - m))


@dataclass
class BeamHypothesis:
    prefix: Tuple[int, ...]   # emitted class ids (no blanks)
    score: float              # total log prob (blank + nonblank)


def ctc_prefix_beam_search(logp: np.ndarray, *, beam_size: int = 8,
                           blank_id: int = 0,
                           topk: int = 8) -> List[BeamHypothesis]:
    """Prefix beam search over per-frame log-probs.

    logp: [T, V] log-softmax scores.
    Returns beams sorted best-first.
    """
    T, V = logp.shape
    k = min(topk, V)
    # p_b / p_nb per prefix: log prob of the prefix ending in blank / nonblank.
    beams: Dict[Tuple[int, ...], Tuple[float, float]] = {(): (0.0, LOG_ZERO)}

    for t in range(T):
        frame = logp[t]
        cand = np.argpartition(-frame, k - 1)[:k]
        if blank_id not in cand:
            cand = np.append(cand, blank_id)
        nxt: Dict[Tuple[int, ...], Tuple[float, float]] = {}

        def acc(prefix, p_b, p_nb):
            ob, onb = nxt.get(prefix, (LOG_ZERO, LOG_ZERO))
            nxt[prefix] = (_logsumexp2(ob, p_b), _logsumexp2(onb, p_nb))

        for prefix, (p_b, p_nb) in beams.items():
            p_tot = _logsumexp2(p_b, p_nb)
            for c in cand:
                c = int(c)
                p_c = float(frame[c])
                if c == blank_id:
                    acc(prefix, p_tot + p_c, LOG_ZERO)
                elif prefix and c == prefix[-1]:
                    # repeat char: extends only the blank-ended paths;
                    # the nonblank-ended ones collapse into the same prefix.
                    acc(prefix + (c,), LOG_ZERO, p_b + p_c)
                    acc(prefix, LOG_ZERO, p_nb + p_c)
                else:
                    acc(prefix + (c,), LOG_ZERO, p_tot + p_c)

        # prune
        scored = sorted(nxt.items(),
                        key=lambda kv: -_logsumexp2(*kv[1]))[:beam_size]
        beams = dict(scored)

    out = [BeamHypothesis(prefix=p, score=_logsumexp2(pb, pnb))
           for p, (pb, pnb) in beams.items()]
    out.sort(key=lambda h: -h.score)
    return out


def exhaustive_ctc_best(logp: np.ndarray, blank_id: int = 0) -> Tuple[Tuple[int, ...], float]:
    """Brute-force reference: enumerate ALL alignment paths, collapse, and
    sum probabilities per label sequence. Exponential — tiny tests only."""
    T, V = logp.shape
    totals: Dict[Tuple[int, ...], float] = {}

    def walk(t, path_lp, collapsed, prev):
        if t == T:
            key = tuple(collapsed)
            totals[key] = _logsumexp2(totals.get(key, LOG_ZERO), path_lp)
            return
        for c in range(V):
            nc = list(collapsed)
            if c != blank_id and c != prev:
                nc.append(c)
            walk(t + 1, path_lp + float(logp[t, c]), nc,
                 c if c != blank_id else blank_id)

    walk(0, 0.0, [], blank_id)
    best = max(totals.items(), key=lambda kv: kv[1])
    return best[0], best[1]
