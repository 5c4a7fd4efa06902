"""Simulate the DRIVER's correctness gate (not the pytest mirror): run a
registered query on a VANILLA SparkSession and its oracle through DuckDB's
pandas conversion (`.df()`), then compare the pandas values the way the
driver does — sort columns by name, canonicalize, hash.

Usage: python tests/driver_sim.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def canon_frame(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    rows = []
    for row in df.itertuples(index=False):
        parts = []
        for v in row:
            if v is None or v != v:  # None / NaN / NaT
                parts.append("~null~")
            else:
                parts.append(repr(v))
        rows.append("|".join(parts))
    rows.sort()
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from pyspark.sql import SparkSession

    # deliberately vanilla: no engine session config, like the driver
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from etl_moodle_and_mass_email_sending_spark import registry

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    names = sys.argv[2:] or sorted(registry.oracle_sql())
    qs, oracles = registry.queries(), registry.oracle_sql()
    bad = 0
    for name in names:
        try:
            sdf = qs[name](spark, sf_dir).toPandas()
            ddf = con.execute(oracles[name]).df()
            ok_rows = len(sdf) == len(ddf)
            ok_cols = sorted(sdf.columns) == sorted(ddf.columns)
            ok_hash = canon_frame(sdf) == canon_frame(ddf)
            status = "OK" if (ok_rows and ok_cols and ok_hash) else "FAIL"
            if status == "FAIL":
                bad += 1
                print(
                    f"{status} {name}: rows {len(sdf)}/{len(ddf)} "
                    f"cols_match={ok_cols} hash_match={ok_hash}"
                )
                if ok_rows and ok_cols and not ok_hash:
                    s = sdf[sorted(sdf.columns)].head(3)
                    d = ddf[sorted(ddf.columns)].head(3)
                    print("  spark dtypes:", dict(s.dtypes.astype(str)))
                    print("  duck  dtypes:", dict(d.dtypes.astype(str)))
            else:
                print(f"{status} {name} ({len(sdf)} rows)")
        except Exception as e:  # noqa: BLE001
            bad += 1
            print(f"ERR {name}: {type(e).__name__}: {str(e)[:200]}")
    print(f"\n{'ALL GREEN' if not bad else f'{bad} FAILURES'}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
