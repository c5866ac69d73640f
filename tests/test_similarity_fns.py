"""Pure-function tests for the pairwise scorers (no Spark session needed)."""

from __future__ import annotations

import random
import string

import pandas as pd

from sql_identity_resolution_spark.functions.similarity import (
    _jaro,
    _levenshtein,
    jaro_winkler,
    levenshtein_ratio,
    token_jaccard,
)


def _jaro_naive(a: str, b: str) -> float:
    """Textbook O(n·window) Jaro — the oracle for the linear-time version."""
    if a == b:
        return 1.0
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0.0
    window = max(max(la, lb) // 2 - 1, 0)
    match_a, match_b = [False] * la, [False] * lb
    matches = 0
    for i, ca in enumerate(a):
        for j in range(max(0, i - window), min(lb, i + window + 1)):
            if not match_b[j] and b[j] == ca:
                match_a[i] = match_b[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    t = k = 0
    for i in range(la):
        if match_a[i]:
            while not match_b[k]:
                k += 1
            if a[i] != b[k]:
                t += 1
            k += 1
    t //= 2
    return (matches / la + matches / lb + (matches - t) / matches) / 3.0


def test_jaro_linear_equals_naive_fuzz():
    rng = random.Random(123)
    cases = [("martha", "marhta"), ("dixon", "dicksonx"), ("", "x"), ("abc", "abc"), ("a", "b")]
    for _ in range(2000):
        a = "".join(rng.choices(string.ascii_lowercase[:6], k=rng.randint(0, 20)))
        b = "".join(rng.choices(string.ascii_lowercase[:6], k=rng.randint(0, 20)))
        cases.append((a, b))
    for a, b in cases:
        assert abs(_jaro(a, b) - _jaro_naive(a, b)) < 1e-12, (a, b)


def test_jaro_winkler_known_values():
    out = jaro_winkler(pd.Series(["martha", "dwayne"]), pd.Series(["marhta", "duane"]))
    assert abs(out[0] - 0.9611) < 1e-3
    assert abs(out[1] - 0.84) < 1e-2


def test_levenshtein_and_ratios():
    assert _levenshtein("kitten", "sitting") == 3
    assert _levenshtein("", "abc") == 3
    r = levenshtein_ratio(pd.Series(["kitten"]), pd.Series(["sitting"]))
    assert abs(r[0] - (1 - 3 / 7)) < 1e-12
    j = token_jaccard(pd.Series(["a b c", ""]), pd.Series(["b c d", ""]))
    assert abs(j[0] - 0.5) < 1e-12 and j[1] == 1.0
