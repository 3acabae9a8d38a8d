"""Local stand-in for the driver's correctness gate: run each queries() entry
via Spark and its oracle_sql() via DuckDB at sf0.01, compare row count,
schema-ish shape, and order-insensitive values.

Usage: python tools/check_correctness.py [sf_dir] [--only name1,name2,...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 6))
    if isinstance(v, bool):
        return str(v)
    return str(v)


def frame_to_key_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm_cell(r[i]) for i in order))
    out.sort()
    return [c for _, c in sorted(zip(cols, cols))], out


def main() -> None:
    args = sys.argv[1:]
    only: set[str] | None = None
    if "--only" in args:
        i = args.index("--only")
        only = set(args[i + 1].split(","))
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"

    import __spark_entry__ as e
    from confluent_data_ingestion_spark.session import get_spark

    spark = get_spark("cdis-correctness")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = e.queries()
    oracles = e.oracle_sql()
    failures = 0
    from confluent_data_ingestion_spark.caching import release_caches

    for name, fn in qs.items():
        if only is not None and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        srows = sdf.collect()
        release_caches()  # drop per-query persisted blocks (63 queries)
        scols = sdf.columns
        if name not in oracles:
            print(f"{name:32s} rows={len(srows):7d}  (no oracle — rows-only)")
            continue
        ddf = con.execute(oracles[name])
        dcols = [d[0] for d in ddf.description]
        drows = ddf.fetchall()
        status = []
        if sorted(scols) != sorted(dcols):
            status.append(f"COLS spark={sorted(scols)} duck={sorted(dcols)}")
        if len(srows) != len(drows):
            status.append(f"COUNT spark={len(srows)} duck={len(drows)}")
        if not status:
            _, s_keyed = frame_to_key_rows(scols, [[r[c] for c in scols] for r in srows])
            _, d_keyed = frame_to_key_rows(dcols, [[r[dcols.index(c)] for c in dcols] for r in drows])
            if s_keyed != d_keyed:
                diff = [i for i, (a, b) in enumerate(zip(s_keyed, d_keyed)) if a != b][:3]
                samples = [(s_keyed[i], d_keyed[i]) for i in diff]
                status.append(f"VALUES mismatch at {len([1 for a,b in zip(s_keyed,d_keyed) if a!=b])} rows, e.g. {samples}")
        if status:
            failures += 1
            print(f"{name:32s} FAIL  " + " | ".join(status))
        else:
            print(f"{name:32s} OK    rows={len(srows)}")

    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
