#!/usr/bin/env python
"""Faithful driver-compare for every contract entry at any scale factor.

Replicates the driver's correctness gate exactly (raw Spark collect()
vs DuckDB fetchall(), str-normalized, order-insensitive) — unlike a
pandas-based compare, this surfaces dtype divergences such as DATE vs
TIMESTAMP. The pytest suite runs the same check at sf0.01
(tests/test_entry_contract.py); this script sweeps other SFs, which
has caught SF-dependent bugs the small fixtures miss.

    python scripts/verify_contract.py [--sf-dir /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm(v):
    if isinstance(v, float):
        return "nan" if math.isnan(v) else f"{v:.9g}"
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return str(v)


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--only", nargs="*", default=None,
                    help="restrict to these query names")
    args = ap.parse_args()

    import duckdb

    import __spark_entry__ as entry_mod
    from searchengine_spark.session import get_spark

    spark = get_spark("verify-contract")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf_dir}/{t}.parquet'"
        )

    queries, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    if args.only:
        queries = {n: q for n, q in queries.items() if n in args.only}
    bad = []
    times: dict[str, float] = {}       # Spark side only
    otimes: dict[str, float] = {}      # DuckDB oracle + canonicalize
    # driver order (queries() priority order), not sorted — so this
    # sweep's cumulative timing mirrors the driver's sweep exactly
    for name in queries:
        t0 = time.monotonic()
        sdf = queries[name](spark, args.sf_dir)
        srows, scols = sdf.collect(), sdf.columns
        times[name] = time.monotonic() - t0
        sql = oracles.get(name)
        if sql is None:
            print(f"{name}: rows-only ({len(srows)} rows, "
                  f"{times[name]:.2f}s)")
            continue
        t0 = time.monotonic()
        res = con.sql(sql)
        drows, dcols = res.fetchall(), list(res.columns)
        ok = (
            sorted(scols) == sorted(dcols)
            and len(srows) == len(drows)
            and _canon([[r[c] for c in scols] for r in srows], scols)
            == _canon(drows, dcols)
        )
        otimes[name] = time.monotonic() - t0
        print(f"{name}: {'OK' if ok else 'MISMATCH'} "
              f"({len(srows)} rows, spark {times[name]:.2f}s, "
              f"oracle {otimes[name]:.2f}s)")
        if not ok:
            bad.append(name)
    print(f"\n{args.sf_dir}: {len(queries) - len(bad)}/{len(queries)} ok, "
          f"spark total {sum(times.values()):.1f}s, "
          f"oracle total {sum(otimes.values()):.1f}s; slowest spark: "
          + ", ".join(f"{n}={t:.1f}s" for n, t in
                      sorted(times.items(), key=lambda kv: -kv[1])[:8]))
    if bad:
        print("mismatches:", bad)
        raise SystemExit(1)


if __name__ == "__main__":
    main()
