"""MinHash + LSH band keys as a vectorized pandas UDF (Arrow-batched).

Standard MinHash/LSH (Broder 1997; Leskovec-Rajaraman-Ullman MMDS ch.3): shingle
the normalized text, hash shingles to u64, apply ``num_perm`` universal-hash
permutations, emit one key per band over the signature. Each band key is
prefixed with its band index so keys from different bands can never collide —
which lets the whole LSH layer ride the reference's generic
``(identifier_type, identifier_value_norm)`` blocking machinery unchanged
(one identifier_type, e.g. ``LSH_TEXT``, many band-key values per entity).

Hashing scheme (chosen for BOTH speed and cross-engine reproducibility):

- shingle hash: polynomial rolling hash over codepoints,
  ``h(g) = Σ_j cp(g[j])·257^(k−1−j) mod 2^61−1`` — fully vectorized in numpy
  (one sliding-window matmul per text, no per-shingle hashlib loop: ~10×
  faster than the digest-per-shingle approach it replaces) and exactly
  reproducible in ANSI SQL (``ord``/``substring``/integer arithmetic), which
  is what lets DuckDB oracles verify the MinHash/SimHash operators
  end-to-end. Exponents stay < 257^5 so every intermediate fits in uint64
  with NO modular reduction until the end — bit-exact on both engines.
- permutations: Carter-Wegman ``(a·h + b) mod p`` with p = 2^31−1, so the
  products stay < 2^62 (no overflow in either numpy uint64 or SQL UBIGINT);
  evaluated per-permutation over distinct shingles with a Mersenne-fold mod
  (see ``minhash_band_keys``) so the hot loop is cache-resident, not
  DRAM-bound.
- band key: ``band:md5(sig0-sig1-…)[:16]`` — one md5 per band (16/doc, off
  the per-shingle hot path) keeps keys at 19 bytes instead of ~45 for the
  raw decimal form; identifiers/members are the pipeline's biggest shuffle,
  so band-key width is shuffle width. DuckDB reproduces it with
  ``md5(string_agg(...))``.

No per-row Python UDFs (BASELINE.json input_hint bans them): this is a pandas
UDF over Arrow batches; inner math is numpy over the shingle×perm matrix.
Seeds are fixed constants ⇒ deterministic across executors and runs.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

_MERSENNE61 = np.uint64((1 << 61) - 1)
_P31 = np.uint64((1 << 31) - 1)  # 2147483647, Mersenne prime
_POLY_BASE = np.uint64(257)
_MAX_SHINGLE_K = 5  # 257^4·cp < 2^53 per term ⇒ Σ of 5 terms exact in uint64


def _perm_params(num_perm: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    """Universal-hash constants a∈[1,p), b∈[0,p) with p=2^31−1. The same
    constants are embedded as literals in the DuckDB oracle SQL."""
    rng = np.random.RandomState(seed)
    a = rng.randint(1, (1 << 31) - 1, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, (1 << 31) - 1, size=num_perm, dtype=np.uint64)
    return a, b


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Character k-shingles → u64 polynomial hashes mod 2^61−1, vectorized.

    A text shorter than ``k`` is a single shingle (the whole text) — mirrored
    by the oracle's ``CASE WHEN len(t) <= k THEN [t] …``.
    """
    assert k <= _MAX_SHINGLE_K, f"shingle_k>{_MAX_SHINGLE_K} would overflow the exact u64 path"
    if not text:
        return np.empty(0, dtype=np.uint64)
    cp = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
    if len(cp) <= k:
        windows = cp[None, :]
        kk = len(cp)
    else:
        windows = np.lib.stride_tricks.sliding_window_view(cp, k)
        kk = k
    powers = _POLY_BASE ** np.arange(kk - 1, -1, -1, dtype=np.uint64)
    return (windows * powers[None, :]).sum(axis=1) % _MERSENNE61


def _mod_m31(x: np.ndarray) -> np.ndarray:
    """x mod (2^31−1) for x < 2^62 via two Mersenne folds — no integer
    division (the division in ``%`` dominated the signature hot loop)."""
    x = (x & _P31) + (x >> np.uint64(31))
    x = (x & _P31) + (x >> np.uint64(31))
    return np.where(x == _P31, np.uint64(0), x)


_SIG_DOC_CHUNK = 256  # docs per batched signature chunk (~10 MB working set)
_SIG_PERM_BLOCK = 8  # permutations per pass: bounds the (Σ shingles × block) matrix


def minhash_band_keys(
    texts: pd.Series, num_perm: int = 64, bands: int = 16, shingle_k: int = 5, seed: int = 42
) -> pd.Series:
    """pd.Series[str] → pd.Series[list[str]] of ``band:md5(...)`` keys.

    Signature build is batched ACROSS documents: distinct shingle hashes of
    ~256 docs concatenate into one vector, each 8-permutation block is one
    fused numpy pass, and per-document minima fall out of a segmented
    ``np.minimum.reduceat``. Per-doc numpy-call overhead (the actual hot cost
    at transcript sizes — ~700 distinct shingles/doc) drops to ~1/256th, the
    working set stays cache-sized, and the Mersenne fold replaces modulo
    division. Identical output to the naive (n×64) matrix; ~8× faster per
    core and core-scalable. (One-permutation hashing was evaluated and
    rejected: 10× band-collision inflation at transcript-sized shingle sets.)
    """
    assert num_perm % bands == 0, "bands must divide num_perm"
    rows = num_perm // bands
    a, b = _perm_params(num_perm, seed)
    n = len(texts)
    out: list[list[str]] = [[] for _ in range(n)]
    hus: list[np.ndarray] = []
    pos: list[int] = []
    for i, text in enumerate(texts):
        if text is None or not str(text).strip():
            continue
        h = _shingle_hashes(str(text), shingle_k)
        if h.size == 0:
            continue
        hus.append(np.unique(h % _P31))  # dedup: repeated shingles can't change a min
        pos.append(i)

    buf = tmp = None
    for c0 in range(0, len(hus), _SIG_DOC_CHUNK):
        chunk = hus[c0 : c0 + _SIG_DOC_CHUNK]
        starts = np.zeros(len(chunk), dtype=np.int64)
        np.cumsum([len(x) for x in chunk[:-1]], out=starts[1:])
        cat = np.concatenate(chunk)
        sig = np.empty((len(chunk), num_perm), dtype=np.uint64)
        # in-place permutation passes over preallocated buffers: the naive
        # `_mod_m31(cat[:,None]*a+b)` allocated ~7 temporaries per pass and
        # was memory-bandwidth-bound (1.33 of 2.8 s single-core at 4k docs);
        # identical arithmetic, ~2x less traffic. Buffers are reused across
        # chunks (same max shape).
        if buf is None or buf.shape[0] < len(cat):
            buf = np.empty((len(cat), _SIG_PERM_BLOCK), dtype=np.uint64)
            tmp = np.empty_like(buf)
        b_ = buf[: len(cat)]
        t_ = tmp[: len(cat)]
        for j0 in range(0, num_perm, _SIG_PERM_BLOCK):
            w = min(_SIG_PERM_BLOCK, num_perm - j0)
            bw, tw = b_[:, :w], t_[:, :w]
            np.multiply(cat[:, None], a[None, j0 : j0 + w], out=bw)
            bw += b[None, j0 : j0 + w]
            # two Mersenne folds, in place (≡ _mod_m31)
            np.right_shift(bw, np.uint64(31), out=tw)
            bw &= _P31
            bw += tw
            np.right_shift(bw, np.uint64(31), out=tw)
            bw &= _P31
            bw += tw
            bw[bw == _P31] = 0
            sig[:, j0 : j0 + w] = np.minimum.reduceat(bw, starts, axis=0)
        # decimal text per signature value in one C-level pass (was a
        # str(int(x)) genexpr per element — ~13% of the operator); format is
        # identical: uint64 < 2^31 renders as the same plain digits
        sig_str = sig.astype("U10")
        for d in range(len(chunk)):
            keys = []
            row = sig_str[d]
            for band in range(bands):
                digest = hashlib.md5(
                    "-".join(row[band * rows : (band + 1) * rows]).encode("ascii")
                ).hexdigest()[:16]
                keys.append(f"{band}:{digest}")
            out[pos[c0 + d]] = keys
    return pd.Series(out)


def minhash_band_keys_udf(num_perm: int = 64, bands: int = 16, shingle_k: int = 5, seed: int = 42):
    """Factory for the Spark pandas UDF: string column → array<string> band keys."""

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _udf(texts: pd.Series) -> pd.Series:
        return minhash_band_keys(texts, num_perm=num_perm, bands=bands, shingle_k=shingle_k, seed=seed)

    return _udf


_SIMHASH_SEED = 7  # distinct from the MinHash permutation seed


def simhash64(texts: pd.Series, shingle_k: int = 4) -> pd.Series:
    """64-bit SimHash (Charikar 2002) over char shingles; pd.Series[str]→pd.Series[int64].
    Used by the near-dup dedup operator (bit-banded for blocking).

    Bit j's vote comes from the PARITY of an independent Carter-Wegman hash
    ``(a_j·h + b_j) mod 2^31−1`` of the shingle hash — 64 pairwise-independent
    bits. Using the polynomial hash's raw bits instead correlates signatures
    of unrelated documents (poly hashes of prefix-sharing shingles share high
    bits), which at corpus scale floods the chunk-blocked verify join with
    false candidates (observed 600× pair inflation on the sf0.01 documents
    table). Same exact-u64 arithmetic as MinHash ⇒ same DuckDB oracle scheme."""
    a, b = _perm_params(64, seed=_SIMHASH_SEED)
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
        h31 = h % _P31
        bits = ((h31[:, None] * a[None, :] + b[None, :]) % _P31) & np.uint64(1)  # (n, 64)
        votes = (2 * bits.astype(np.int64) - 1).sum(axis=0)
        out[i] = int(np.uint64(((votes > 0).astype(np.uint64) << bit_idx).sum()).astype(np.int64))
    return pd.Series(out)


def simhash64_udf(shingle_k: int = 4):
    @F.pandas_udf(T.LongType())
    def _udf(texts: pd.Series) -> pd.Series:
        return simhash64(texts, shingle_k=shingle_k)

    return _udf
