"""Commit-metadata microbench — evidence for the sharded-manifest design
(VERDICT r3 #1): drive thousands of snapshot commits on a >=1k-bucket
table through the REAL metadata code path (``_commit_delta_meta`` /
``_commit_cow_meta`` — exactly what ``commit_delta``/``commit`` run after
their parquet writes) with fabricated data-file paths, and show that
per-commit metadata latency stays FLAT as history accumulates.

What "flat" requires, and what this measures:
  * snapshot JSON stays O(shards + properties) — file lists live in
    per-bucket-range shard files, only touched shards are rewritten;
  * the live-commit-dir range map is maintained incrementally
    (``_update_commit_ranges``), never by a full inventory scan;
  * periodic compaction (emulated as the same COW metadata commit a real
    compaction makes) + snapshot expiry bound live commit dirs and the
    manifest-dir listing, as a real deployment's maintenance job does.

Usage:
  python tools/meta_bench.py [--commits 5000] [--buckets 1024]
      [--touched 32] [--shard-buckets 64] [--compact-every 256] [--json]

Prints a human table plus one JSON line:
  {"commits": N, "buckets": B, "first500_ms": x, "last500_ms": y,
   "flat_ratio": y/x, "p50_ms": ..., "p99_ms": ...}
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

from pyspark.sql import types as T  # noqa: E402  (types only — no JVM session)

from estuary_spark.tables import LakeTable  # noqa: E402

SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("text", T.StringType()),
    ]
)


def fake_delta(table: LakeTable, i: int, buckets: list[int]) -> float:
    """One delta commit's metadata phase; returns elapsed seconds."""
    t0 = time.perf_counter()
    m0 = table.manifest()
    rel = os.path.join("data", f"delta-{m0['version'] + 1:010d}-b{i:06d}")
    nb = {str(b): [os.path.join(rel, f"_bp={b}", "part-0.parquet")] for b in buckets}
    table._commit_delta_meta(
        m0, rel, nb, (i * 100, i * 100 + 99), i,
        T.StructType.fromJson(m0["schema"]), None,
    )
    return time.perf_counter() - t0


def fake_compact(table: LakeTable, i: int, n_buckets: int) -> float:
    """Compaction's metadata phase: a COW commit replacing every bucket
    with one fresh base file (folding all deltas), then snapshot expiry —
    what jobs/maintenance_job.py does on a live table."""
    t0 = time.perf_counter()
    m0 = table.manifest()
    rel = os.path.join("data", f"commit-{m0['version'] + 1:010d}-c{i:06d}")
    new_files = {
        str(b): [os.path.join(rel, f"_bp={b}", "part-0.parquet")]
        for b in range(n_buckets)
    }
    table._commit_cow_meta(
        m0, m0, rel, new_files, list(range(n_buckets)), None, None,
        T.StructType.fromJson(m0["schema"]), {"compaction": {"emulated": True}}, None,
    )
    table.expire_snapshots(keep=2)
    return time.perf_counter() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--commits", type=int, default=5000)
    ap.add_argument("--buckets", type=int, default=1024)
    ap.add_argument("--touched", type=int, default=32)
    ap.add_argument("--shard-buckets", type=int, default=64)
    ap.add_argument("--compact-every", type=int, default=256)
    ap.add_argument("--json", action="store_true", help="JSON line only")
    args = ap.parse_args()

    base = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
    root = tempfile.mkdtemp(prefix="meta-bench-", dir=base)
    try:
        t = LakeTable.create(
            os.path.join(root, "t"), SCHEMA, n_buckets=args.buckets,
            key_cols=["conv_id", "turn_idx"], shard_buckets=args.shard_buckets,
        )
        lat: list[float] = []
        compact_lat: list[float] = []
        for i in range(args.commits):
            # deterministic spread: each commit touches `touched` buckets
            # starting at a rotating offset (hot path: most batches touch a
            # subset of buckets; all-bucket batches only change the constant)
            touched = [(i * 7 + j * (args.buckets // args.touched)) % args.buckets
                       for j in range(args.touched)]
            lat.append(fake_delta(t, i, sorted(set(touched))))
            if args.compact_every and (i + 1) % args.compact_every == 0:
                compact_lat.append(fake_compact(t, i, args.buckets))

        lat_ms = [x * 1000 for x in lat]
        k = min(500, len(lat_ms) // 4)
        first = sum(lat_ms[:k]) / k
        last = sum(lat_ms[-k:]) / k
        s = sorted(lat_ms)
        out = {
            "commits": args.commits,
            "buckets": args.buckets,
            "touched_per_commit": args.touched,
            "shard_buckets": args.shard_buckets,
            "compact_every": args.compact_every,
            "first500_ms": round(first, 3),
            "last500_ms": round(last, 3),
            "flat_ratio": round(last / first, 3),
            "p50_ms": round(s[len(s) // 2], 3),
            "p99_ms": round(s[int(len(s) * 0.99)], 3),
            "max_ms": round(s[-1], 3),
            "compact_mean_ms": round(
                sum(compact_lat) / len(compact_lat) * 1000, 3
            ) if compact_lat else None,
            "snapshot_bytes": os.path.getsize(
                os.path.join(t._mdir, f"v{t.current_version():010d}.json")
            ),
        }
        if not args.json:
            win = 500
            print(f"{'commit window':>16}  mean ms")
            for w0 in range(0, len(lat_ms), max(win, len(lat_ms) // 10)):
                wnd = lat_ms[w0:w0 + win]
                print(f"{w0:>8}-{w0 + len(wnd):<7}  {sum(wnd) / len(wnd):7.3f}")
        print(json.dumps(out))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
