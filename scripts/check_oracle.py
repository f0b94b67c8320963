"""Local stand-in for the driver's t2 correctness gate.

Runs every __spark_entry__.queries() entry at sf0.01 and compares to
its oracle_sql() in DuckDB: row count, column names, and an
order-insensitive value comparison (columns sorted by name, rows
sorted by all columns). Prints one line per query.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
       CHECK_ORACLE_JSON=path python scripts/check_oracle.py
         also writes a per-query JSON record (the full-suite
         certification artifact; the driver's own snapshot has
         historically listed only the first 50 queries).
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402

from block_explorer_spark import get_spark, schemas  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    # sf1-scale oracles (q83's recursive-CTE closure) exhausted the
    # default in-cwd .tmp temp store in round 9; give DuckDB most of
    # the box's RAM before it spills, and point any spill at an
    # explicit directory so a full run can't die on a relative path.
    tmp = os.environ.get("CHECK_ORACLE_DUCK_TMP", "/tmp/duckdb_oracle_tmp")
    os.makedirs(tmp, exist_ok=True)
    con.execute(f"PRAGMA temp_directory='{tmp}'")
    con.execute(
        f"PRAGMA memory_limit='{os.environ.get('CHECK_ORACLE_DUCK_MEM', '80GB')}'"
    )
    for t in schemas.TPCH_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def normalize(rows: list[tuple], cols: list[str]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def norm_val(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return round(v, 9)
        if isinstance(v, (bytes, bytearray, memoryview)):
            return bytes(v)
        if hasattr(v, "isoformat"):
            return v.isoformat()
        if isinstance(v, int):
            return float(v) if -(2**52) < v < 2**52 else v
        return v

    out = [tuple(norm_val(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


def main() -> int:
    spark = get_spark("oracle-check")
    con = duck_con(SF_DIR)
    queries = entrymod.queries()
    # oracles that embed corpus-derived model literals (q96/q97 BPE
    # merges) must derive them from the SAME sf dir being certified
    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = SF_DIR
    oracles = entrymod.oracle_sql()
    failures = 0
    record: dict[str, dict] = {}
    for name, fn in queries.items():
        if ONLY and name not in ONLY:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            record[name] = {"status": "spark_error", "err": str(e)[:400]}
            failures += 1
            _flush(record)
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            record[name] = {"status": "rows_only", "spark_rows": len(srows)}
            _flush(record)
            continue
        try:
            rel = con.sql(oracles[name])
            ocols = [c.lower() for c in rel.columns]
            orows = rel.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            record[name] = {"status": "oracle_error", "err": str(e)[:400]}
            failures += 1
            _flush(record)
            continue
        status = []
        if len(srows) != len(orows):
            status.append(f"rowcount {len(srows)} vs {len(orows)}")
        if sorted(c.lower() for c in scols) != sorted(ocols):
            status.append(f"schema {sorted(scols)} vs {sorted(ocols)}")
        if not status:
            sn = normalize(srows, [c.lower() for c in scols])
            on = normalize(orows, ocols)
            if sn != on:
                diff = [(a, b) for a, b in zip(sn, on) if a != b][:3]
                status.append(f"values differ, first diffs: {diff}")
        if status:
            print(f"FAIL  {name}: {'; '.join(status)} [{time.time()-t0:.1f}s]")
            record[name] = {"status": "mismatch", "detail": "; ".join(status)[:400]}
            failures += 1
        else:
            print(f"OK    {name}: {len(srows)} rows [{time.time()-t0:.1f}s]")
            # values_match is the honest name: the check is a
            # normalized sorted-value comparison, not a hash.
            # hash_match is kept one more round for artifact-diffing
            # tools that read the older certification files.
            record[name] = {
                "status": "ok",
                "rows": len(srows),
                "rows_match": True,
                "schema_match": True,
                "values_match": True,
                "hash_match": True,
            }
        _flush(record)
    _flush(record, final=True)
    return 1 if failures else 0


def _flush(record: dict, final: bool = False) -> None:
    """Write the artifact after EVERY query, not only at exit: a long
    certification run (sf1 takes over an hour) that is cut off must
    keep its certified prefix. partial=True marks in-flight files so a
    truncated run is never mistaken for a complete one."""
    out_path = os.environ.get("CHECK_ORACLE_JSON")
    if not out_path:
        return
    import json

    doc = {"sf_dir": SF_DIR, "n_queries": len(record), "queries": record}
    if not final:
        doc["partial"] = True
    tmp = out_path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(doc, fh, indent=1, sort_keys=True)
    os.replace(tmp, out_path)
    if final:
        print(f"# record -> {out_path}")


if __name__ == "__main__":
    raise SystemExit(main())
