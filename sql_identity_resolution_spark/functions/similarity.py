"""Vectorized pairwise string-similarity scorers (pandas UDFs over Arrow batches).

Per BASELINE.json north_star: "batched Jaro-Winkler/Levenshtein/token-Jaccard
scoring in vectorized pandas UDFs (no per-row Python)". These run only on
post-blocking candidate pairs (the reference's EXACT rules never score — a
shared normalized value IS the match, docs/concepts/matching-algorithm.md:33-36;
scoring is this engine's additive SCORED-rule layer for LSH candidates).

Texts are capped at ``MAX_LEN`` chars before O(n·m) algorithms — similarity of
long near-dup transcripts is decided by their prefix window plus the
token-level score, and the cap bounds worst-case cost per pair.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAX_LEN = 512

try:  # optional C implementation, not in the sandbox image
    import Levenshtein as _lev  # type: ignore

    _HAVE_C_LEV = True
except Exception:  # pragma: no cover
    _HAVE_C_LEV = False


def _levenshtein(a: str, b: str) -> int:
    """Two-row DP with the inner loop fully numpy-vectorized.

    ``cur[j] = min(m[j], cur[j-1]+1)`` where ``m[j] = min(prev[j]+1,
    prev[j-1]+cost_j)`` has a left-to-right dependency; substituting
    ``d[j] = cur[j]-j`` turns it into a prefix minimum:
    ``d = cummin([i, m-1..len(b)]); cur = d + arange``.
    """
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    if _HAVE_C_LEV:
        return _lev.distance(a, b)
    arr_b = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32)
    idx = np.arange(len(b) + 1, dtype=np.int64)
    prev = idx.copy()
    for i, ca in enumerate(a, start=1):
        cost = (arr_b != ord(ca)).astype(np.int64)
        m = np.minimum(prev[1:] + 1, prev[:-1] + cost)
        d = np.minimum.accumulate(np.concatenate(([np.int64(i)], m - idx[1:])))
        prev = d + idx
    return int(prev[-1])


def levenshtein_ratio(a_ser: pd.Series, b_ser: pd.Series) -> pd.Series:
    out = np.empty(len(a_ser), dtype=np.float64)
    for i, (a, b) in enumerate(zip(a_ser, b_ser)):
        a = ("" if a is None else str(a))[:MAX_LEN]
        b = ("" if b is None else str(b))[:MAX_LEN]
        m = max(len(a), len(b))
        out[i] = 1.0 if m == 0 else 1.0 - _levenshtein(a, b) / m
    return pd.Series(out)


def token_jaccard(a_ser: pd.Series, b_ser: pd.Series) -> pd.Series:
    out = np.empty(len(a_ser), dtype=np.float64)
    for i, (a, b) in enumerate(zip(a_ser, b_ser)):
        sa = set(("" if a is None else str(a)).split())
        sb = set(("" if b is None else str(b)).split())
        if not sa and not sb:
            out[i] = 1.0
        else:
            u = len(sa | sb)
            out[i] = (len(sa & sb) / u) if u else 1.0
    return pd.Series(out)


def _jaro(a: str, b: str) -> float:
    """Jaro similarity in O(|a|+|b|) amortized instead of the naive
    O(|a|·window) double loop.

    The greedy rule ("first unmatched b-position in the window whose char
    equals a[i]") only ever consumes positions of a[i]'s OWN character, and
    the window's lower bound is nondecreasing in i — so one sorted position
    list + advancing pointer per character replays the exact same assignment:
    each b position is inspected at most twice total. Was the VERDICT-flagged
    per-pair Python bottleneck for rules selecting this scorer."""
    if a == b:
        return 1.0
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0.0
    window = max(la, lb) // 2 - 1
    if window < 0:
        window = 0
    pos: dict[str, list[int]] = {}
    for j, cb in enumerate(b):
        pos.setdefault(cb, []).append(j)
    ptr = dict.fromkeys(pos, 0)
    a_idx: list[int] = []  # i of each match, in a-order
    b_idx: list[int] = []  # j of each match (collected, then sorted)
    for i, ca in enumerate(a):
        plist = pos.get(ca)
        if plist is None:
            continue
        k = ptr[ca]
        lo, hi = i - window, i + window + 1
        n = len(plist)
        while k < n and plist[k] < lo:  # below-window positions never re-qualify
            k += 1
        ptr[ca] = k
        if k < n and plist[k] < hi:
            a_idx.append(i)
            b_idx.append(plist[k])
            ptr[ca] = k + 1
    matches = len(a_idx)
    if matches == 0:
        return 0.0
    t = sum(1 for i, j in zip(a_idx, sorted(b_idx)) if a[i] != b[j]) // 2
    return (matches / la + matches / lb + (matches - t) / matches) / 3.0


def jaro_winkler(a_ser: pd.Series, b_ser: pd.Series, prefix_weight: float = 0.1) -> pd.Series:
    out = np.empty(len(a_ser), dtype=np.float64)
    for i, (a, b) in enumerate(zip(a_ser, b_ser)):
        a = ("" if a is None else str(a))[:MAX_LEN]
        b = ("" if b is None else str(b))[:MAX_LEN]
        if _HAVE_C_LEV:
            out[i] = _lev.jaro_winkler(a, b)
            continue
        j = _jaro(a, b)
        prefix = 0
        for ca, cb in zip(a[:4], b[:4]):
            if ca == cb:
                prefix += 1
            else:
                break
        out[i] = j + prefix * prefix_weight * (1.0 - j)
    return pd.Series(out)


_SCORERS = {
    "token_jaccard": token_jaccard,
    "levenshtein_ratio": levenshtein_ratio,
    "jaro_winkler": jaro_winkler,
}


def pair_scorer_udf(name: str):
    """Factory: (left_text, right_text) → double similarity in [0,1]."""
    fn = _SCORERS[name]

    @F.pandas_udf(T.DoubleType())
    def _udf(a: pd.Series, b: pd.Series) -> pd.Series:
        return fn(a, b)

    return _udf
