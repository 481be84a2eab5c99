"""MAPQ V2 — the reference's default mapping-quality model.

Transliteration of the *decision table semantics* of BowtieMapq2
(unique.h:171-400): inputs are the best score, the best unchosen ("second
best") score if any, the perfect score and the minimum valid score for the
read length(s); output 0..42 (e2e) / 0..44 (local).
"""

from typing import Optional

import numpy as np


def _F(x: float) -> float:
    """C float literal promoted to double: the reference compares against
    `diff * (double)0.8f` etc. (unique.h:225+), so thresholds like 0.8 carry
    float32 representation error (0.8f -> 0.800000011920929). Reproducing
    this is required for MAPQ bit-parity."""
    return float(np.float32(x))


def mapq_v2(best: int, secbest: Optional[int], sc_per: int, sc_min: int,
            local: bool) -> int:
    diff = max(1, sc_per - sc_min)
    best_over = best - sc_min
    if not local:  # monotone / end-to-end
        if secbest is None:
            if best_over >= diff * _F(0.8): return 42
            if best_over >= diff * _F(0.7): return 40
            if best_over >= diff * _F(0.6): return 24
            if best_over >= diff * _F(0.5): return 23
            if best_over >= diff * _F(0.4): return 8
            if best_over >= diff * _F(0.3): return 3
            return 0
        bestdiff = abs(abs(best) - abs(secbest))
        if bestdiff >= diff * _F(0.9):
            return 39 if best_over == diff else 33
        if bestdiff >= diff * _F(0.8):
            return 38 if best_over == diff else 27
        if bestdiff >= diff * _F(0.7):
            return 37 if best_over == diff else 26
        if bestdiff >= diff * _F(0.6):
            return 36 if best_over == diff else 22
        if bestdiff >= diff * _F(0.5):
            if best_over == diff: return 35
            if best_over >= diff * _F(0.84): return 25
            if best_over >= diff * _F(0.68): return 16
            return 5
        if bestdiff >= diff * _F(0.4):
            if best_over == diff: return 34
            if best_over >= diff * _F(0.84): return 21
            if best_over >= diff * _F(0.68): return 14
            return 4
        if bestdiff >= diff * _F(0.3):
            if best_over == diff: return 32
            if best_over >= diff * _F(0.88): return 18
            if best_over >= diff * _F(0.67): return 15
            return 3
        if bestdiff >= diff * _F(0.2):
            if best_over == diff: return 31
            if best_over >= diff * _F(0.88): return 17
            if best_over >= diff * _F(0.67): return 11
            return 0
        if bestdiff >= diff * _F(0.1):
            if best_over == diff: return 30
            if best_over >= diff * _F(0.88): return 12
            if best_over >= diff * _F(0.67): return 7
            return 0
        if bestdiff > 0:
            return 6 if best_over >= diff * _F(0.67) else 2
        return 1 if best_over >= diff * _F(0.67) else 0
    else:  # local
        if secbest is None:
            if best_over >= diff * _F(0.8): return 44
            if best_over >= diff * _F(0.7): return 42
            if best_over >= diff * _F(0.6): return 41
            if best_over >= diff * _F(0.5): return 36
            if best_over >= diff * _F(0.4): return 28
            if best_over >= diff * _F(0.3): return 24
            return 22
        bestdiff = abs(abs(best) - abs(secbest))
        if bestdiff >= diff * _F(0.9): return 40
        if bestdiff >= diff * _F(0.8): return 39
        if bestdiff >= diff * _F(0.7): return 38
        if bestdiff >= diff * _F(0.6): return 37
        if bestdiff >= diff * _F(0.5):
            if best_over == diff: return 35
            if best_over >= diff * _F(0.5): return 25
            return 20
        if bestdiff >= diff * _F(0.4):
            if best_over == diff: return 34
            if best_over >= diff * _F(0.5): return 21
            return 19
        if bestdiff >= diff * _F(0.3):
            if best_over == diff: return 33
            if best_over >= diff * _F(0.5): return 18
            return 16
        if bestdiff >= diff * _F(0.2):
            if best_over == diff: return 32
            if best_over >= diff * _F(0.5): return 17
            return 12
        if bestdiff >= diff * _F(0.1):
            if best_over == diff: return 31
            if best_over >= diff * _F(0.5): return 14
            return 9
        if bestdiff > 0:
            return 11 if best_over >= diff * _F(0.5) else 2
        return 1 if best_over >= diff * _F(0.5) else 0
