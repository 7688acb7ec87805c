"""Local mirror of the driver's DuckDB-oracle correctness harness.

Runs every ``queries()`` entry on Spark and, when an ``oracle_sql()``
entry exists, the oracle on DuckDB over the same parquet tables;
compares row count, column names, and an order-insensitive value hash
(columns sorted by name, rows sorted, values canonicalized).

Usage:  python tools/check.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import hashlib
import math
import sys
import time
from datetime import date, datetime
from decimal import Decimal

sys.path.insert(0, "/root/repo")


def canon(v):
    """Canonicalize a cell value for cross-engine comparison."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # repr keeps full double precision; both engines produce the
        # same bits when the query follows the decimal-sum convention.
        return repr(v)
    if isinstance(v, Decimal):
        return repr(float(v))
    if isinstance(v, datetime):
        return v.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple, dict, set)):
        # The external driver's canonicalizer sorts a pandas frame and
        # hard-errors on unhashable cells (the q293 round-12 red). The
        # mirror must never accept MORE than the driver, so complex
        # cells fail loudly at build time: scalarize in the query
        # (array_join / array_to_string) instead.
        raise TypeError(
            f"complex-typed output cell ({type(v).__name__}): the "
            "driver harness requires scalar cells — emit the value "
            "scalarized (e.g. array_join(col, ','))"
        )
    return str(v)


def table_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import os

    import duckdb

    import __spark_entry__ as entrymod

    if os.environ.get("CHECK_VANILLA"):
        # mimic the external driver: plain session, default confs
        # (200 shuffle partitions, no engine-specific settings)
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .config("spark.ui.enabled", "false")
            .appName("correctness-check-vanilla")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")
    else:
        from metadata_ingestion_poc_spark.session import get_spark

        spark = get_spark("correctness-check")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        el = time.time() - t0
        if name not in oracles:
            print(f"rows-only {name}: {len(srows)} rows  [{el:.1f}s]")
            n_rowsonly += 1
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        problems = []
        # The external driver canonicalizes through pandas, where
        # DuckDB degrades HUGEINT/DECIMAL cells to float64 ("30143.0")
        # while Spark emits int64 ("30143") — rows/schema match but
        # every hash differs (the 4-round q276 red). fetchall() cannot
        # see that, so flag the TYPES explicitly.
        try:
            wide = [
                (c, t)
                for (c, t, *_) in con.execute(
                    "DESCRIBE (" + oracles[name] + ")"
                ).fetchall()
                if "HUGEINT" in t
                or t.startswith("DECIMAL")
                or t.startswith("UINT")
                or t.startswith("UBIGINT")
            ]
            if wide:
                problems.append(
                    f"oracle emits driver-degrading column types {wide}: "
                    "CAST to BIGINT/DOUBLE/VARCHAR in the oracle SQL"
                )
        except Exception:
            pass
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"schema spark={sorted(scols)} duck={sorted(dcols)}")
        if not problems:
            hs, hd = table_hash(scols, srows), table_hash(dcols, drows)
            if hs != hd:
                problems.append(f"value-hash spark={hs} duck={hd}")
                # show first differing row for debugging
                order_s = sorted(range(len(scols)), key=lambda i: scols[i])
                order_d = sorted(range(len(dcols)), key=lambda i: dcols[i])
                ls = sorted("|".join(canon(r[i]) for i in order_s) for r in srows)
                ld = sorted("|".join(canon(r[i]) for i in order_d) for r in drows)
                for a, b in zip(ls, ld):
                    if a != b:
                        problems.append(f"  spark: {a}")
                        problems.append(f"  duck : {b}")
                        break
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems[:1]))
            for p in problems[1:]:
                print(p)
            n_fail += 1
        else:
            print(f"PASS {name}: {len(srows)} rows  [{el:.1f}s]")
            n_pass += 1

    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
