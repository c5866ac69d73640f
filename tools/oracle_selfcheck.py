"""Self-check mirroring the driver's correctness gate: run every
``__spark_entry__.queries()`` entry on Spark AND its ``oracle_sql()`` SQL on
DuckDB over the same sf parquet dir, compare row count, name-sorted schema,
and values (exact for non-floats, isclose for floats, row-order-insensitive).

Usage: python tools/oracle_selfcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return v


def _canon(pdf):
    cols = sorted(pdf.columns)
    rows = [tuple(_norm_cell(v) for v in row) for row in pdf[cols].itertuples(index=False)]
    rows.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return cols, rows


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    import __spark_entry__ as entry
    from sql_identity_resolution_spark.session import build_session

    spark = build_session(app_name="oracle-selfcheck", master="local[8]")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    queries, oracles = entry.queries(), entry.oracle_sql()
    report, bad = {}, 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            spdf = sdf.toPandas()
            if name not in oracles:
                report[name] = {"rows": len(spdf), "oracle": "none (rows-only check)"}
                continue
            opdf = con.execute(oracles[name]).fetchdf()
            scols, srows = _canon(spdf)
            ocols, orows = _canon(opdf)
            ok_schema = scols == ocols
            ok_rows = len(srows) == len(orows)
            ok_vals = srows == orows
            report[name] = {
                "rows_match": ok_rows,
                "schema_match": ok_schema,
                "values_match": ok_vals,
                "spark_rows": len(srows),
                "oracle_rows": len(orows),
            }
            if not (ok_schema and ok_rows and ok_vals):
                bad += 1
                if not ok_schema:
                    report[name]["spark_cols"] = scols
                    report[name]["oracle_cols"] = ocols
                elif not ok_vals:
                    diff = [
                        (s, o) for s, o in zip(srows, orows) if s != o
                    ][:3]
                    report[name]["first_diffs"] = [repr(d)[:300] for d in diff]
        except Exception as e:  # noqa: BLE001 — report, keep checking the rest
            bad += 1
            report[name] = {"err": f"{type(e).__name__}: {e}"[:500]}
        print(f"{name}: {json.dumps(report[name])[:200]}", flush=True)
    spark.stop()
    print(json.dumps({"checked": len(report), "failures": bad}))
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
