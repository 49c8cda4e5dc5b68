"""Local replica of the driver's DuckDB parity gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares row count, column names,
and an order-insensitive value hash (rows sorted, columns sorted by name).

Usage: python tools/parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(df) -> tuple[int, list[str], int]:
    """(row_count, sorted column names, order-insensitive value hash)."""
    import pandas as pd

    cols = sorted(df.columns)
    df = df[cols]
    recs = []
    for row in df.itertuples(index=False):
        rec = []
        for v in row:
            if isinstance(v, float):
                rec.append(f"{v:.9g}")
            elif v is None or (isinstance(v, float) and pd.isna(v)):
                rec.append("<null>")
            else:
                rec.append(str(v))
        recs.append("\x1f".join(rec))
    recs.sort()
    return len(recs), cols, hash(tuple(recs))


def main() -> int:
    import duckdb

    import __spark_entry__ as entrymod
    from osmalyzer_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("parity", parallelism=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok   {name}: rows={len(spark_pdf)} (rows-only, no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            continue
        try:
            duck_pdf = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error {type(e).__name__}: {e}")
            failures += 1
            continue
        sn, sc, sh = normalize(spark_pdf)
        dn, dc, dh = normalize(duck_pdf)
        status = "ok  " if (sn, sc, sh) == (dn, dc, dh) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(
            f"{status} {name}: spark rows={sn} duck rows={dn} "
            f"cols {'match' if sc == dc else f'{sc} vs {dc}'} "
            f"hash {'match' if sh == dh else 'MISMATCH'} [{time.time()-t0:.1f}s]"
        )
        if status == "FAIL" and sn and dn and sc == dc:
            sp = spark_pdf[sorted(spark_pdf.columns)].sort_values(sorted(spark_pdf.columns)).head(3)
            dp = duck_pdf[sorted(duck_pdf.columns)].sort_values(sorted(duck_pdf.columns)).head(3)
            print("  spark head:\n", sp.to_string())
            print("  duck head:\n", dp.to_string())
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
