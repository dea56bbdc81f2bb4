"""Multi-table fan-out bench — evidence for VERDICT r3 #2: with T
destination tables in one change log, a micro-batch should cost
~max(per-table apply) wall, not sum(tables) — the serial loop paid
T x the fixed per-apply driver planning cost even on an idle cluster.

Builds a synthetic T-table log (uniform spread), runs run_sync_multi with
multi_apply_parallelism=1 (the old serial loop) and =8, on the SAME
session and data, and reports wall + per-table state equality.

Usage: python tools/multi_bench.py [--tables 16] [--rows 64000]
           [--cpus 16] [--batches 4]
Prints one JSON line:
  {"tables": T, "rows": N, "serial_sec": x, "parallel_sec": y,
   "speedup": x/y, "states_equal": true}
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tables", type=int, default=16)
    ap.add_argument("--rows", type=int, default=64_000)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", 16)))
    ap.add_argument("--batches", type=int, default=4)
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    base = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
    work = tempfile.mkdtemp(prefix="multi-bench-", dir=base)
    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("multi-bench")
        .config("spark.sql.shuffle.partitions", str(args.cpus))
        .config("spark.scheduler.mode", "FAIR")
        .config("spark.local.dir", os.path.join(work, "sparktmp"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    try:
        from estuary_spark.config import SyncConfig
        from estuary_spark.multi import read_final_state_multi, run_sync_multi

        T = args.tables
        log_dir = os.path.join(work, "log")
        (
            spark.range(args.rows)
            .select(
                F.col("id").alias("lsn"),
                F.when(F.pmod(F.col("id"), F.lit(10)) < 8, F.lit("insert"))
                .when(F.pmod(F.col("id"), F.lit(10)) < 9, F.lit("update"))
                .otherwise(F.lit("delete"))
                .alias("op"),
                F.concat(F.lit("db.t"), F.pmod(F.col("id"), F.lit(T)).cast("string")).alias(
                    "src_table"
                ),
                F.concat(F.lit("c"), F.pmod(F.col("id"), F.lit(500)).cast("string")).alias(
                    "conv_id"
                ),
                F.pmod(F.col("id"), F.lit(40)).cast("int").alias("turn_idx"),
                F.md5(F.col("id").cast("string")).alias("text"),
            )
            .repartitionByRange(8, "lsn")
            .write.parquet(log_dir)
        )

        def run(par: int, tag: str) -> tuple[float, set]:
            cfg = SyncConfig(
                source_log_dir=log_dir,
                target_table_dir=os.path.join(work, f"tables-{tag}"),
                n_buckets=8,
                envelope_cols=("lsn", "op"),
                table_col="src_table",
                multi_apply_parallelism=par,
            )
            t0 = time.perf_counter()
            run_sync_multi(spark, cfg, events_per_batch=args.rows // args.batches)
            wall = time.perf_counter() - t0
            state = {
                (r["_dst_table"], r["conv_id"], r["turn_idx"], r["text"])
                for r in read_final_state_multi(spark, cfg).collect()
            }
            return wall, state

        # warm the JVM/JIT on a throwaway run so the comparison is fair
        run(1, "warm")
        serial, s_state = run(1, "serial")
        parallel, p_state = run(8, "parallel")
        print(
            json.dumps(
                {
                    "tables": T,
                    "rows": args.rows,
                    "batches": args.batches,
                    "cpus": args.cpus,
                    "serial_sec": round(serial, 2),
                    "parallel_sec": round(parallel, 2),
                    "speedup": round(serial / parallel, 2),
                    "states_equal": s_state == p_state,
                    "state_rows": len(p_state),
                }
            )
        )
    finally:
        spark.stop()
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
