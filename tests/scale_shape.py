"""8x scale-shape harness — the methodology behind SCALE.md's per-wave
"8x facts" numbers, committed so every future wave reproduces them the
same way instead of re-deriving the experiment ad hoc.

Stages a scaled copy of the testbed under the engine's scratch root:
fact tables (orders / lineitem / events / documents / embeddings)
replicated ``--reps`` times with key offsets (each replica's primary
keys shifted by rep * 1e9 so join/group keys stay unique and
per-replica fixtures don't collide), dimension tables symlinked
unchanged. Then runs each named registered query warm (1 warm-up +
median of 3 timed runs) at the base sf_dir and the scaled dir and
prints the wall-clock ratio — the number a wave's SCALE.md entry
records. A ratio near 1x means added data absorbed into idle
parallelism (no serial bottleneck amplified); the property that
transfers to the 1000-executor case.

This is a PERF-SHAPE harness, not a correctness one: replicated
documents are 8x exact duplicates with offset ids, so dedup-family
OUTPUT changes — only the plan shape and wall time are being read.

Usage: python tests/scale_shape.py [--sf-dir DIR] [--reps N] query ...
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KEY_OFFSET = 1_000_000_000

# fact table -> columns shifted per replica (keys that must stay unique;
# l_orderkey shifts WITH o_orderkey so the order/lineitem join keeps its
# per-replica cardinality instead of fanning out across replicas)
FACT_KEYS = {
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
DIMS = ("region", "nation", "customer", "supplier", "part")


def stage_scaled(spark, sf_dir: str, reps: int) -> str:
    from pyspark.sql import functions as F

    from etl_moodle_and_mass_email_sending_spark.catalog import load_table
    from etl_moodle_and_mass_email_sending_spark.operators.util import (
        scratch_dir,
    )

    out = scratch_dir(f"scale{reps}x_")
    for name in DIMS:
        os.symlink(
            os.path.join(sf_dir, f"{name}.parquet"),
            os.path.join(out, f"{name}.parquet"),
        )
    for name, keys in FACT_KEYS.items():
        base = load_table(spark, sf_dir, name)
        parts = []
        for rep in range(reps):
            df = base
            for k in keys:
                df = df.withColumn(k, F.col(k) + F.lit(rep * KEY_OFFSET))
            parts.append(df)
        union = parts[0]
        for p in parts[1:]:
            union = union.unionByName(p)
        union.write.parquet(os.path.join(out, f"{name}.parquet"))
    return out


def run_warm(fn, spark, sf_dir: str, n: int = 3) -> float:
    fn(spark, sf_dir).collect()  # warm-up (staging, broadcast, codegen)
    times = []
    for _ in range(n):
        t0 = time.monotonic()
        fn(spark, sf_dir).collect()
        times.append(time.monotonic() - t0)
    return statistics.median(times)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    from etl_moodle_and_mass_email_sending_spark import registry
    from etl_moodle_and_mass_email_sending_spark.session import get_spark

    spark = get_spark(app_name="scale-shape")
    qmap = registry.queries()
    unknown = [q for q in args.queries if q not in qmap]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")

    print(f"staging {args.reps}x facts from {args.sf_dir} ...")
    scaled = stage_scaled(spark, args.sf_dir, args.reps)
    print(f"staged at {scaled}")

    for q in args.queries:
        base_t = run_warm(qmap[q], spark, args.sf_dir)
        scaled_t = run_warm(qmap[q], spark, scaled)
        print(
            f"{q}: base {base_t:.2f} s, {args.reps}x {scaled_t:.2f} s, "
            f"ratio {scaled_t / base_t:.2f}x"
        )


if __name__ == "__main__":
    main()
