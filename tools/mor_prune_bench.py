"""Production-shape MoR bench: bucket-pruned lineage path under load.

The 10^10-event deployment runs thousands of buckets and a micro-batch's
active entities hash to a strict subset of them; the per-batch lineage
target read is then bucket-pruned (apply.py auto-prune at >= 256 buckets)
so its scan cost is O(touched buckets), not O(table). r2 exercised that
path only in a unit test (test_mor.py) — this bench drives it under load
and shows the target-scan phase time tracking TOUCHED bucket count while
the unpruned variant pays the full-table scan regardless.

Shape: a base table of ``--base-convs`` conversations x ``--turns`` turns
over ``--n-buckets`` buckets (compacted, so the lineage read scans base
files); then update waves, each touching a WINDOW of conversations. Wave
windows double in size (75, 150, 300, ... convs) while total events per
wave stay constant, so across waves only the touched-bucket count moves —
pruned lineage time must move with it, unpruned must stay flat.

Writes BENCH/MOR_PRUNE.md and prints one JSON line per wave + a summary.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import re
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["ESTUARY_PROFILE"] = "1"  # must precede estuary_spark.apply import

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from estuary_spark.apply import apply_batch  # noqa: E402
from estuary_spark.config import SyncConfig  # noqa: E402
from estuary_spark.maintenance import compact  # noqa: E402
from estuary_spark.session import get_spark  # noqa: E402
from estuary_spark.tables import BUCKET_COL, LakeTable, bucket_expr  # noqa: E402

PHASE_RE = re.compile(r"\[apply (mor-[a-z]+)\] ([0-9.]+)s")


def parse_phases(text: str) -> dict[str, float]:
    out: dict[str, float] = {}
    for name, sec in PHASE_RE.findall(text):
        out[name] = out.get(name, 0.0) + float(sec)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=16)
    ap.add_argument("--n-buckets", type=int, default=512)
    ap.add_argument("--base-convs", type=int, default=2_000_000)
    ap.add_argument("--turns", type=int, default=40)
    ap.add_argument("--events-per-wave", type=int, default=1_200_000)
    ap.add_argument("--windows", type=int, nargs="*", default=[8, 16, 32, 64, 128])
    args = ap.parse_args()

    root = os.environ.get("ESTUARY_MORBENCH_DIR", "/dev/shm/estuary-morprune")
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    spark = get_spark("mor-prune-bench", cores=args.cpus, shuffle_partitions=2 * args.cpus)
    spark.sparkContext.setLogLevel("ERROR")

    cols = ["lsn", "op", "conv_id", "turn_idx", "text"]
    n_base = args.base_convs * args.turns
    base_log = os.path.join(root, "base_log")
    (
        spark.range(n_base)
        .select(
            F.col("id").alias("lsn"),
            F.lit("insert").alias("op"),
            F.concat(F.lit("c"), (F.col("id") % args.base_convs).cast("string")).alias("conv_id"),
            (F.col("id") / args.base_convs).cast("int").alias("turn_idx"),
            F.md5(F.col("id").cast("string")).alias("text"),
        )
        .repartition(2 * args.cpus)
        .write.parquet(base_log)
    )

    def mk_table(name: str, prune: bool) -> tuple[SyncConfig, LakeTable]:
        cfg = SyncConfig(
            source_log_dir=base_log,  # unused: batches applied directly
            target_table_dir=os.path.join(root, name),
            n_buckets=args.n_buckets,
            envelope_cols=("lsn", "op"),
            write_mode="mor",
            compact_every=0,
            mor_prune_buckets=prune,
        )
        from estuary_spark.runner import open_or_create_table

        base_df = spark.read.parquet(base_log)
        t = open_or_create_table(spark, cfg, base_df)
        apply_batch(spark, t, base_df, cfg, 0, offset_range=(0, n_base - 1))
        # fold the base delta into base files so wave lineage reads scan a
        # realistic compacted table, then JIT-warm with one throwaway wave
        compact(spark, t, max_files_per_bucket=10**9, max_delta_files_per_bucket=0)
        return cfg, t

    tables = {"pruned": mk_table("t_pruned", True), "unpruned": mk_table("t_unpruned", False)}

    # wave logs: window convs x all turns x versions, constant total events
    wave_dirs: list[tuple[int, str, int]] = []
    next_lsn = n_base
    conv_lo = 0
    for w, window in enumerate(args.windows):
        versions = max(1, args.events_per_wave // (window * args.turns))
        n = window * args.turns * versions
        d = os.path.join(root, f"wave{w}")
        (
            spark.range(n)
            .select(
                (F.lit(next_lsn) + F.col("id")).alias("lsn"),
                F.lit("update").alias("op"),
                F.concat(F.lit("c"), (F.lit(conv_lo) + F.col("id") % window).cast("string")).alias("conv_id"),
                ((F.col("id") / window).cast("long") % args.turns).cast("int").alias("turn_idx"),
                F.md5((F.col("id") + 7).cast("string")).alias("text"),
            )
            .repartition(2 * args.cpus)
            .write.parquet(d)
        )
        wave_dirs.append((window, d, next_lsn))
        next_lsn += n
        conv_lo += window  # disjoint windows keep wave states independent

    # JIT warmup: one small unrecorded wave per table (disjoint convs,
    # LSNs past every measured wave) so wave-0 numbers aren't inflated by
    # codegen compilation
    warm_n = 50 * args.turns
    warm_df = (
        spark.range(warm_n)
        .select(
            (F.lit(next_lsn) + F.col("id")).alias("lsn"),
            F.lit("update").alias("op"),
            F.concat(F.lit("c"), (F.lit(conv_lo) + F.col("id") % 50).cast("string")).alias("conv_id"),
            ((F.col("id") / 50).cast("long") % args.turns).cast("int").alias("turn_idx"),
            F.md5(F.col("id").cast("string")).alias("text"),
        )
    )
    warm_dir = os.path.join(root, "warm")
    warm_df.repartition(args.cpus).write.parquet(warm_dir)
    for cfg, t in tables.values():
        with contextlib.redirect_stdout(io.StringIO()):
            apply_batch(
                spark, t, spark.read.parquet(warm_dir), cfg, 9,
                offset_range=(next_lsn, next_lsn + warm_n - 1),
            )

    results: list[dict] = []
    total_buckets = args.n_buckets
    for w, (window, d, lsn0) in enumerate(wave_dirs):
        wave_df = spark.read.parquet(d)
        hi = int(wave_df.agg(F.max("lsn")).first()[0])
        touched = (
            wave_df.select(bucket_expr("conv_id", args.n_buckets).alias(BUCKET_COL))
            .distinct()
            .count()
        )
        row: dict = {
            "wave": w,
            "window_convs": window,
            "events": wave_df.count(),
            "touched_buckets": touched,
            "total_buckets": total_buckets,
        }
        for mode, (cfg, t) in tables.items():
            buf = io.StringIO()
            t0 = time.time()
            with contextlib.redirect_stdout(buf):
                res = apply_batch(spark, t, wave_df, cfg, 10 + w, offset_range=(lsn0, hi))
            wall = time.time() - t0
            phases = parse_phases(buf.getvalue())
            assert not res.skipped
            row[mode] = {
                "wall_s": round(wall, 2),
                "lineage_s": round(phases.get("mor-lineage", 0.0), 2),
                "touched_probe_s": round(phases.get("mor-touched", 0.0), 2),
                "commit_s": round(phases.get("mor-commit", 0.0), 2),
            }
        print(json.dumps(row), flush=True)
        results.append(row)

    hdr = (
        f"base {args.base_convs:,} convs x {args.turns} turns = {n_base:,} rows, "
        f"{args.n_buckets} buckets, MoR, compacted before waves; each wave "
        f"~{args.events_per_wave:,} update events over a conv window"
    )
    lines = [
        "",
        "## Production-shape MoR: bucket-pruned lineage under load",
        "",
        f"{hdr}. `pruned` = `mor_prune_buckets=True` (the >= 256-bucket",
        "auto default); `unpruned` forces the full-table lineage scan.",
        "Windows double while events/wave stay constant, so only the",
        "touched-bucket count moves across waves.",
        "",
        "| wave | window convs | events | touched/total buckets | pruned lineage (s) | pruned wall (s) | unpruned lineage (s) | unpruned wall (s) |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for r in results:
        lines.append(
            f"| {r['wave']} | {r['window_convs']} | {r['events']:,} "
            f"| {r['touched_buckets']}/{r['total_buckets']} "
            f"| {r['pruned']['lineage_s']} | {r['pruned']['wall_s']} "
            f"| {r['unpruned']['lineage_s']} | {r['unpruned']['wall_s']} |"
        )
    lines += [
        "",
        "Reading: pruned lineage time tracks touched buckets (the target",
        "scan is O(touched)); unpruned stays ~flat at the full-table scan",
        "cost regardless of how few buckets a batch touches. At 10^10 rows",
        "the unpruned column is the one that stops scaling.",
        "",
    ]
    md = "\n".join(lines)
    out_path = os.path.join(REPO, "BENCH", "MOR_PRUNE.md")
    with open(out_path, "w") as fh:
        fh.write(md.lstrip("\n"))
    baseline = os.path.join(REPO, "BENCH", "BASELINE.md")
    if os.path.exists(baseline):
        with open(baseline) as fh:
            content = fh.read()
        marker = "## Production-shape MoR: bucket-pruned lineage under load"
        if marker in content:
            content = content.split(marker)[0].rstrip() + "\n"
        with open(baseline, "w") as fh:
            fh.write(content + md)
    print(json.dumps({"metric": "mor_prune_bench", "waves": len(results), "md": out_path}))


if __name__ == "__main__":
    main()
