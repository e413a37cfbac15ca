"""Driver-mimic: run every __spark_entry__ query on Spark AND its DuckDB
oracle at sf0.01, compare row count + schema (sorted column names) +
order-insensitive values. Usage:

    python tools/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]
    rows = []
    for row in df.itertuples(index=False):
        vals = []
        for v in row:
            if isinstance(v, float):
                vals.append(("f", float(v)))
            elif hasattr(v, "item"):
                vals.append(("n", v.item()))
            else:
                vals.append(("s", str(v)))
        rows.append(tuple(vals))
    return sorted(rows, key=repr)


def approx_equal(a: list[tuple], b: list[tuple]) -> tuple[bool, bool, str]:
    """(exact, approx, first_diff)."""
    if len(a) != len(b):
        return False, False, f"row count {len(a)} vs {len(b)}"
    exact = True
    for ra, rb in zip(a, b):
        for va, vb in zip(ra, rb):
            if va == vb:
                continue
            if va[0] == "f" and vb[0] == "f":
                if math.isclose(va[1], vb[1], rel_tol=1e-9, abs_tol=1e-9):
                    exact = False
                    continue
            return False, False, f"{va} vs {vb} in row {ra[:4]}"
    return exact, True, ""


def main() -> None:
    import __spark_entry__ as E
    from pathways2go_spark.session import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'"
        )
    qs, os_ = E.queries(), E.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf).toPandas()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: spark error {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        sql = os_.get(name)
        if sql is None:
            print(f"  ok {name}: rows-only ({len(sdf)} rows, no oracle)")
            n_pass += 1
            continue
        try:
            odf = con.execute(sql).df()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: oracle error {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        if sorted(sdf.columns) != sorted(odf.columns):
            print(f"FAIL {name}: cols {sorted(sdf.columns)} vs {sorted(odf.columns)}")
            n_fail += 1
            continue
        exact, approx, diff = approx_equal(canon(sdf), canon(odf))
        if exact:
            print(f"  ok {name}: EXACT ({len(sdf)} rows)")
            n_pass += 1
        elif approx:
            print(f"WARN {name}: approx-only ({len(sdf)} rows) — hash would MISMATCH")
            n_fail += 1
        else:
            print(f"FAIL {name}: {diff}")
            n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
