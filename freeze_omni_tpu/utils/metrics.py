"""Evaluation metrics: CER / WER (edit distance).

Tooling for the reference's headline ASR tables (BASELINE.md: CER on aishell-
class sets, WER on LibriSpeech): normalized Levenshtein distance at character
and word granularity.
"""

from __future__ import annotations

import re
from typing import List, Sequence, Tuple


def edit_distance(ref: Sequence, hyp: Sequence) -> int:
    n, m = len(ref), len(hyp)
    if n == 0:
        return m
    prev = list(range(m + 1))
    for i in range(1, n + 1):
        cur = [i] + [0] * m
        for j in range(1, m + 1):
            cost = 0 if ref[i - 1] == hyp[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
        prev = cur
    return prev[m]


def normalize_text(text: str, lower: bool = True) -> str:
    text = re.sub(r"[^\w\s一-鿿]", " ", text)
    text = re.sub(r"\s+", " ", text).strip()
    return text.lower() if lower else text


def cer(ref: str, hyp: str) -> float:
    r = normalize_text(ref).replace(" ", "")
    h = normalize_text(hyp).replace(" ", "")
    return edit_distance(r, h) / max(len(r), 1)


def wer(ref: str, hyp: str) -> float:
    r = normalize_text(ref).split()
    h = normalize_text(hyp).split()
    return edit_distance(r, h) / max(len(r), 1)


def corpus_score(pairs: List[Tuple[str, str]], char_level: bool
                 ) -> float:
    """Length-weighted corpus CER/WER over (ref, hyp) pairs."""
    errs = 0
    total = 0
    for ref, hyp in pairs:
        if char_level:
            r = normalize_text(ref).replace(" ", "")
            h = normalize_text(hyp).replace(" ", "")
        else:
            r = normalize_text(ref).split()
            h = normalize_text(hyp).split()
        errs += edit_distance(r, h)
        total += len(r)
    return errs / max(total, 1)
