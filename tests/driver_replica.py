"""Local replica of the driver's correctness gate: run each queries()
entry on Spark and its oracle_sql() on DuckDB at a given sf_dir, compare
row count, column names, and order-insensitive values.

Usage: python tests/driver_replica.py [sf_dir]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(rows, cols):
    out = []
    for row in rows:
        vals = []
        for c in cols:
            v = row[c] if not isinstance(row, tuple) else row[cols.index(c)]
            if isinstance(v, float):
                v = round(v, 9)
                if v == -0.0:
                    v = 0.0
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=repr)


def main(sf_dir: str, only: list[str] | None = None) -> int:
    from gopensearch_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark(app_name="driver-replica", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    if only:
        qs = {k: v for k, v in qs.items() if k in only}
    failures = []
    for name, fn in qs.items():
        df = fn(spark, sf_dir)
        cols = df.columns
        spark_rows = normalize([r.asDict() for r in df.collect()], cols)
        if name not in oracles:
            print(f"  {name:28s} rows-only: {len(spark_rows)} rows (no oracle)")
            continue
        res = con.execute(oracles[name])
        ocols = [d[0] for d in res.description]
        orows = normalize(res.fetchall(), ocols)
        ok_schema = sorted(cols) == sorted(ocols)
        # compare on name-sorted column order like the driver
        order = sorted(cols)
        sidx = [cols.index(c) for c in order]
        oidx = [ocols.index(c) for c in order] if ok_schema else []
        s_sorted = sorted([tuple(r[i] for i in sidx) for r in spark_rows], key=repr)
        o_sorted = sorted([tuple(r[i] for i in oidx) for r in orows], key=repr) if ok_schema else []
        ok = ok_schema and s_sorted == o_sorted
        status = "OK " if ok else "FAIL"
        print(f"  {name:28s} {status} spark={len(spark_rows)} oracle={len(orows)} schema={'ok' if ok_schema else f'{cols} vs {ocols}'}")
        if not ok:
            failures.append(name)
            for i, (a, b) in enumerate(zip(s_sorted, o_sorted)):
                if a != b:
                    print(f"     first diff row {i}: spark={a} oracle={b}")
                    break
            if len(s_sorted) != len(o_sorted):
                only_s = [r for r in s_sorted if r not in o_sorted][:3]
                only_o = [r for r in o_sorted if r not in s_sorted][:3]
                print(f"     only-spark: {only_s}\n     only-oracle: {only_o}")
    print(f"\n{len(failures)} failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01",
                  only=sys.argv[2:] or None))
