"""JVM-side (codegen'd) text canonicalization helpers.

The reference canonicalizes identifiers with LOWER/UPPER driven by rule metadata
(``sql/duckdb/core/idr_run.py:235-243``; ``dbt_idr/macros/idr_utils.sql:82-88``)
and normalizes phones with REGEXP_REPLACE supplied as a metadata expression
(``sql/databricks/notebooks/Scale_Test_Data_Generator.py:482-491``). All of these
stay inside whole-stage codegen here — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_text(col: Column | str) -> Column:
    """Canonical text normal form used for blocking keys and similarity input:
    lowercase, strip non-alphanumerics to single spaces, trim."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"[^a-z0-9]+", " "))


def digits_only(col: Column | str) -> Column:
    """Phone-style normalization (reference metadata expr REGEXP_REPLACE(...'[^0-9]',''))."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, r"[^0-9]", "")


def canonicalize(col: Column, mode: str) -> Column:
    """Rule-driven canonicalization (idr_run.py:235-243; dbt adds UPPERCASE).
    DIGITS is this engine's named form of the reference's metadata-level
    phone-digits expression."""
    mode = (mode or "NONE").upper()
    if mode == "LOWERCASE":
        return F.lower(col)
    if mode == "UPPERCASE":
        return F.upper(col)
    if mode == "DIGITS":
        return digits_only(col)
    return col
