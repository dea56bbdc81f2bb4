"""Streaming end-to-end latency bench (VERDICT r3 #7): feed the
Structured Streaming sync at a FIXED event rate and report the
steady-state micro-batch latency distribution — the engine-side analogue
of the reference's 300 ms ring-buffer flush SLA
(``SettingConstant.scala:21`` in /root/reference: estuary flushes a batch
when the ring buffer fills OR every 300 ms, so its ingest latency floor
is the flush cadence; here the floor is the trigger interval plus one
micro-batch's apply+commit).

Method: a feeder thread appends one parquet event file every
``--interval-ms`` (pyarrow direct write — no Spark job), each row
stamped with its write time (``ts_written``, envelope — never reaches the
table). The production streaming runner (``run_sync_streaming``, MoR)
tails the directory with a processingTime trigger; an ``on_batch``
observer records, per micro-batch, AFTER the snapshot commit:

  * e2e_max_ms — now - min(ts_written in batch): the OLDEST event's
    ingest latency (file landed -> visible in a committed snapshot);
  * e2e_min_ms — now - max(ts_written): the newest event's;
  * apply_ms   — the engine's own apply+commit wall (BatchResult).

Usage:
  python tools/streaming_bench.py [--rate 10000] [--interval-ms 500]
      [--duration-s 45] [--trigger-ms 500] [--cpus 16] [--buckets 64]

Prints one JSON line with p50/p95/p99/max of each series plus the
sustained rate. See BENCH/STREAMING.md for results + the knobs.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def write_file(log_dir: str, idx: int, lsn: int, n: int) -> int:
    """One event file (pyarrow direct — no Spark job), rows stamped with
    their write time. Returns the next lsn."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    now_ms = int(time.time() * 1000)
    ids = list(range(lsn, lsn + n))
    cols = {
        "lsn": pa.array(ids, pa.int64()),
        "op": pa.array(["update"] * n),
        "conv_id": pa.array([f"c{x % 20000}" for x in ids]),
        "turn_idx": pa.array([x % 16 for x in ids], pa.int32()),
        "text": pa.array([f"v{x}" for x in ids]),
        "ts_written": pa.array([now_ms] * n, pa.int64()),
    }
    tmp = os.path.join(log_dir, f".feed-{idx:06d}.parquet")
    pq.write_table(pa.table(cols), tmp)
    os.rename(tmp, os.path.join(log_dir, f"feed-{idx:06d}.parquet"))
    return lsn + n


def feeder(log_dir: str, rate: int, interval_ms: int, stop: threading.Event, fed: dict) -> None:
    per_file = max(1, int(rate * interval_ms / 1000))
    i = fed.get("next_idx", 0)
    while not stop.is_set():
        t0 = time.time()
        fed["lsn"] = write_file(log_dir, i, fed["lsn"], per_file)
        fed["events"] = fed.get("events", 0) + per_file
        i += 1
        sleep = interval_ms / 1000 - (time.time() - t0)
        if sleep > 0:
            time.sleep(sleep)
        else:
            fed["behind"] = fed.get("behind", 0) + 1


def pct(sorted_vals: list[float], p: float) -> float:
    if not sorted_vals:
        return float("nan")
    return sorted_vals[min(len(sorted_vals) - 1, int(len(sorted_vals) * p))]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rate", type=int, default=10_000, help="events/sec fed")
    ap.add_argument("--interval-ms", type=int, default=500, help="one file per interval")
    ap.add_argument("--duration-s", type=int, default=45)
    ap.add_argument("--trigger-ms", type=int, default=500)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", 16)))
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--max-files-per-trigger", type=int, default=8)
    ap.add_argument("--warmup-batches", type=int, default=6,
                    help="exclude the first N batches (JIT warm-up) from stats")
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    base = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
    work = tempfile.mkdtemp(prefix="stream-bench-", dir=base)
    log_dir = os.path.join(work, "log")
    os.makedirs(log_dir)
    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("streaming-bench")
        .config("spark.sql.shuffle.partitions", str(args.cpus))
        .config("spark.local.dir", os.path.join(work, "sparktmp"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.streaming.metricsEnabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    try:
        from estuary_spark.config import SyncConfig
        from estuary_spark.streaming.runner import run_sync_streaming

        cfg = SyncConfig(
            source_log_dir=log_dir,
            target_table_dir=os.path.join(work, "table"),
            n_buckets=args.buckets,
            envelope_cols=("lsn", "op", "ts_written"),
            write_mode="mor",
            compact_every=16,
        )

        stop = threading.Event()
        fed = {"lsn": 0, "events": 0, "next_idx": 1}
        # seed one file so the stream can infer schema / create the table
        per_file = max(1, int(args.rate * args.interval_ms / 1000))
        fed["lsn"] = write_file(log_dir, 0, 0, per_file)
        fed["events"] = per_file

        lat: list[dict] = []

        def on_batch(batch_df, batch_id, res) -> None:
            row = batch_df.agg(
                F.min("ts_written").alias("lo"),
                F.max("ts_written").alias("hi"),
                F.count(F.lit(1)).alias("n"),
            ).first()
            if row["lo"] is None:
                return
            now_ms = time.time() * 1000
            lat.append(
                {
                    "batch_id": batch_id,
                    "n": int(row["n"]),
                    "e2e_max_ms": now_ms - int(row["lo"]),
                    "e2e_min_ms": now_ms - int(row["hi"]),
                    "apply_ms": res.wall_ms,
                }
            )

        fthread = threading.Thread(
            target=feeder, args=(log_dir, args.rate, args.interval_ms, stop, fed)
        )
        t0 = time.time()
        run = run_sync_streaming(
            spark,
            cfg,
            checkpoint_location=os.path.join(work, "ckpt"),
            max_files_per_trigger=args.max_files_per_trigger,
            available_now=False,
            processing_time=f"{args.trigger_ms} milliseconds",
            on_batch=on_batch,
        )
        q = run["query"]
        fthread.start()
        time.sleep(args.duration_s)
        stop.set()
        fthread.join()
        # drain what's left, then stop
        deadline = time.time() + 30
        while time.time() < deadline:
            done = sum(x["n"] for x in lat)
            if done >= fed["events"]:
                break
            time.sleep(0.5)
        q.stop()
        wall = time.time() - t0

        steady = [x for x in lat if x["batch_id"] >= args.warmup_batches]
        out = {
            "rate_events_per_sec": args.rate,
            "interval_ms": args.interval_ms,
            "trigger_ms": args.trigger_ms,
            "cpus": args.cpus,
            "buckets": args.buckets,
            "duration_s": args.duration_s,
            "events_fed": fed["events"],
            "events_applied": sum(x["n"] for x in lat),
            "batches": len(lat),
            "steady_batches": len(steady),
            "sustained_events_per_sec": round(sum(x["n"] for x in lat) / wall, 1),
            "feeder_fell_behind": fed.get("behind", 0),
        }
        for series in ("e2e_max_ms", "e2e_min_ms", "apply_ms"):
            vals = sorted(x[series] for x in steady)
            out[series] = {
                "p50": round(pct(vals, 0.50)),
                "p95": round(pct(vals, 0.95)),
                "p99": round(pct(vals, 0.99)),
                "max": round(vals[-1]) if vals else None,
            }
        print(json.dumps(out))
    finally:
        try:
            spark.stop()
        finally:
            shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
