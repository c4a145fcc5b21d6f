"""Driver-mimicking correctness check: run every __spark_entry__ query on
Spark and its oracle on DuckDB over the same sf dir; compare row sets
(columns sorted by name, rows sorted, exact value equality).

    python scripts/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if hasattr(v, "item"):
                v = v.item()
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = round(v, 9)
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return out, [cols[i] for i in order]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from confluence2md_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            print(f"FAIL {name}: spark error: {ex}")
            n_fail += 1
            continue
        wall = time.monotonic() - t0
        if name not in oracles:
            print(f"rows {name}: {len(srows)} rows ({wall:.1f}s) [rows-only]")
            n_rows_only += 1
            if len(srows) == 0 and name not in ("dedup_minhash_pairs", "dedup_simhash_pairs"):
                print(f"  WARN: 0 rows")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as ex:
            print(f"FAIL {name}: duckdb error: {ex}")
            n_fail += 1
            continue
        s_norm, s_c = normalize(srows, scols)
        d_norm, d_c = normalize(drows, dcols)
        if s_c != d_c:
            print(f"FAIL {name}: column mismatch spark={s_c} duck={d_c}")
            n_fail += 1
        elif s_norm != d_norm:
            print(f"FAIL {name}: rows spark={len(s_norm)} duck={len(d_norm)}")
            sset, dset = set(s_norm), set(d_norm)
            for x in list(sset - dset)[:3]:
                print(f"  spark-only: {x}")
            for x in list(dset - sset)[:3]:
                print(f"  duck-only:  {x}")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(s_norm)} rows ({wall:.1f}s)")
            n_pass += 1
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_rows_only} rows-only ==")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
