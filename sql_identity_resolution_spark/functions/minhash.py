"""MinHash + LSH band keys as a vectorized pandas UDF (Arrow-batched).

Standard MinHash/LSH (Broder 1997; Leskovec-Rajaraman-Ullman MMDS ch.3): shingle
the normalized text, hash shingles to u64, apply ``num_perm`` universal-hash
permutations, emit one key per band over the signature. Each band key is
prefixed with its band index so keys from different bands can never collide —
which lets the whole LSH layer ride the reference's generic
``(identifier_type, identifier_value_norm)`` blocking machinery unchanged
(one identifier_type, e.g. ``LSH_TEXT``, many band-key values per entity).

No per-row Python UDFs (BASELINE.json input_hint bans them): this is a pandas
UDF over Arrow batches; inner math is numpy over the shingle×perm matrix.
Seeds are fixed constants ⇒ deterministic across executors and runs
(hashlib.blake2b, not PYTHONHASHSEED-dependent built-in hash()).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

_MERSENNE = np.uint64((1 << 61) - 1)


def _perm_params(num_perm: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, (1 << 61) - 1, size=num_perm, dtype=np.uint64) | np.uint64(1)
    b = rng.randint(0, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
    return a, b


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Character k-shingles → stable u64 hashes."""
    if not text:
        return np.empty(0, dtype=np.uint64)
    if len(text) <= k:
        grams = [text]
    else:
        grams = [text[i : i + k] for i in range(len(text) - k + 1)]
    out = np.empty(len(grams), dtype=np.uint64)
    for i, g in enumerate(grams):
        out[i] = int.from_bytes(hashlib.blake2b(g.encode("utf-8"), digest_size=8).digest(), "little")
    return out


def minhash_band_keys(
    texts: pd.Series, num_perm: int = 64, bands: int = 16, shingle_k: int = 5, seed: int = 42
) -> pd.Series:
    """pd.Series[str] → pd.Series[list[str]] of ``band_idx:hex`` keys."""
    assert num_perm % bands == 0, "bands must divide num_perm"
    rows = num_perm // bands
    a, b = _perm_params(num_perm, seed)
    out: list[list[str] | None] = []
    for text in texts:
        if text is None or not str(text).strip():
            out.append([])
            continue
        h = _shingle_hashes(str(text), shingle_k)
        if h.size == 0:
            out.append([])
            continue
        # (n_shingles, num_perm) universal hash, min over shingles = signature
        sig = ((h[:, None] * a[None, :] + b[None, :]) & _MERSENNE).min(axis=0)
        keys = []
        for band in range(bands):
            chunk = sig[band * rows : (band + 1) * rows].tobytes()
            digest = hashlib.blake2b(chunk, digest_size=8).hexdigest()
            keys.append(f"{band}:{digest}")
        out.append(keys)
    return pd.Series(out)


def minhash_band_keys_udf(num_perm: int = 64, bands: int = 16, shingle_k: int = 5, seed: int = 42):
    """Factory for the Spark pandas UDF: string column → array<string> band keys."""

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _udf(texts: pd.Series) -> pd.Series:
        return minhash_band_keys(texts, num_perm=num_perm, bands=bands, shingle_k=shingle_k, seed=seed)

    return _udf


def simhash64(texts: pd.Series, shingle_k: int = 4) -> pd.Series:
    """64-bit SimHash (Charikar 2002) over char shingles; pd.Series[str]→pd.Series[int64].
    Used by the near-dup dedup operator (bit-banded for blocking)."""
    out = np.zeros(len(texts), dtype=np.int64)
    bit_idx = np.arange(64, dtype=np.uint64)
    for i, text in enumerate(texts):
        if text is None or not str(text).strip():
            out[i] = 0
            continue
        h = _shingle_hashes(str(text), shingle_k)
        if h.size == 0:
            out[i] = 0
            continue
        bits = (h[:, None] >> bit_idx[None, :]) & np.uint64(1)  # (n, 64)
        votes = (2 * bits.astype(np.int64) - 1).sum(axis=0)
        out[i] = int(np.uint64(((votes > 0).astype(np.uint64) << bit_idx).sum()).astype(np.int64))
    return pd.Series(out)


def simhash64_udf(shingle_k: int = 4):
    @F.pandas_udf(T.LongType())
    def _udf(texts: pd.Series) -> pd.Series:
        return simhash64(texts, shingle_k=shingle_k)

    return _udf
