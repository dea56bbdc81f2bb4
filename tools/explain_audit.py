"""Physical-plan audit: capture `.explain("formatted")` evidence that the
engine's plans have the shape a 100 TB deployment needs — filters pushed
to the parquet scan, column pruning, whole-stage codegen around the hot
expressions, broadcast where one side is small, and no Python in the hot
path. Writes BENCH/PLANS.md.

Usage: python tools/explain_audit.py [sf_dir]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def formatted_plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def grade(plan: str, wants: list[tuple]) -> list[str]:
    """Check plan text for claimed properties.

    Each want is (label, needles, expect_present): needles is a string or
    a tuple of acceptable alternatives; expect_present=False asserts the
    needle must NOT appear (e.g. no CartesianProduct)."""
    out = []
    for label, needles, expect in wants:
        if isinstance(needles, str):
            needles = (needles,)
        found = any(n in plan for n in needles)
        ok = found if expect else not found
        shown = " | ".join(needles)
        out.append(f"  - {'PASS' if ok else 'MISS'}: {label} (`{shown}`{'' if expect else ' absent'})")
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from pyspark.sql import functions as F

    from estuary_spark.session import get_spark

    spark = get_spark("explain-audit", cores=8, shuffle_partitions=8)
    sections: list[tuple[str, str, list[str]]] = []

    # ---- 1. log scan with LSN range filter (the per-batch source read)
    from estuary_spark.sources.log_source import ParquetLogSource

    import tempfile

    from estuary_spark.generator import LogSpec, write_log

    work = tempfile.mkdtemp(prefix="plan-audit-")
    log_dir = os.path.join(work, "log")
    write_log(spark, LogSpec(n_convs=200, max_turns=8, seed=3), log_dir)
    src = ParquetLogSource(log_dir)
    scan = src.read_batch(spark, start_lsn=1000, end_lsn=50_000).select("conv_id", "turn_idx", "lsn")
    p = formatted_plan(scan)
    sections.append(
        (
            "Per-batch log scan (LSN range + projection)",
            p,
            grade(
                p,
                [
                    ("LSN predicate pushed to parquet", "PushedFilters: [IsNotNull(lsn), GreaterThanOrEqual(lsn,1000)", True),
                    ("column pruning (3-col ReadSchema)", "ReadSchema: struct<lsn:bigint,conv_id:string,turn_idx:int>", True),
                    ("whole-stage codegen", ("codegen id", "WholeStageCodegen"), True),
                ],
            ),
        )
    )

    # ---- 2. the LWW reduce (salted two-phase aggregation)
    from estuary_spark.operators.lww import lww_reduce

    log_df = src.read_batch(spark)
    w = lww_reduce(
        log_df.select("conv_id", "turn_idx", "lsn", "op", "text"),
        ["conv_id", "turn_idx"],
        salt_factor=0,
    )
    p = formatted_plan(w)
    sections.append(
        (
            "LWW reduce (map-side partial aggregate = the local pre-merge reduce)",
            p,
            grade(
                p,
                [
                    # max_by over a wide struct payload is sort-based (struct
                    # agg buffers are not hash-aggregable): the partial
                    # SortAggregate before the Exchange IS the local
                    # pre-merge reduce bounding per-key fan-in
                    ("map-side partial (local pre-merge) aggregate", ("SortAggregate", "HashAggregate"), True),
                    ("hash exchange on the key", "hashpartitioning(conv_id", True),
                    ("one wide shuffle only (no extra sort exchange)", "Exchange rangepartitioning", False),
                ],
            ),
        )
    )

    # ---- 3. broadcast in the exact top-k similarity (small query side)
    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    if os.path.exists(emb_path):
        from estuary_spark.functions.similarity import cosine_topk

        emb = spark.read.parquet(emb_path).withColumn(
            "embedding", F.col("embedding").cast("array<double>")
        )
        q = emb.filter(F.col("vec_id") < 5).select(F.col("vec_id").alias("query_id"), "embedding")
        c = emb.filter(F.col("vec_id") >= 5)
        p = formatted_plan(cosine_topk(c, q, k=5))
        sections.append(
            (
                "Exact cosine top-k (broadcast the small query side)",
                p,
                grade(
                    p,
                    [
                        ("query side broadcast (no corpus shuffle)", "BroadcastNestedLoopJoin", True),
                        ("corpus predicate pushed", "PushedFilters: [IsNotNull(vec_id), GreaterThanOrEqual(vec_id,5)]", True),
                        ("no shuffle of the corpus", "hashpartitioning(vec_id", False),
                    ],
                ),
            )
        )

    # ---- 4. minhash LSH candidate join (equi-join, not cross join)
    docs_path = os.path.join(sf_dir, "documents.parquet")
    if os.path.exists(docs_path):
        from estuary_spark.functions.dedup import minhash_lsh_candidates

        docs = spark.read.parquet(docs_path)
        p = formatted_plan(minhash_lsh_candidates(docs, num_hashes=16, bands=4))
        sections.append(
            (
                "MinHash LSH candidates (band-bucket equi-join)",
                p,
                grade(
                    p,
                    [
                        ("equi-join on (band, bhash)", ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin"), True),
                        ("no cartesian product", "CartesianProduct", False),
                        ("no nested-loop join", "NestedLoop", False),
                    ],
                ),
            )
        )

    # ---- 5. oracle-checkable poly-minhash exact-jaccard (r2: replaced the
    # all-pairs join — must be banded equi-join + verify, no cross join)
    if os.path.exists(docs_path):
        from estuary_spark.functions.dedup import minhash_poly_pairs

        docs = spark.read.parquet(docs_path)
        p = formatted_plan(minhash_poly_pairs(docs, threshold=0.2, num_hashes=16))
        sections.append(
            (
                "Exact n-gram Jaccard via poly-minhash candidates (r2 rewrite)",
                p,
                grade(
                    p,
                    [
                        ("banded candidate equi-join", ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin"), True),
                        ("no all-pairs nested-loop join", "NestedLoop", False),
                        ("no cartesian product", "CartesianProduct", False),
                    ],
                ),
            )
        )

    # ---- 6. embedding near-dup with parameterized hyperplane-LSH blocking
    if os.path.exists(emb_path):
        from estuary_spark.functions.dedup import embedding_near_dup_pairs

        emb = spark.read.parquet(emb_path).withColumn(
            "embedding", F.col("embedding").cast("array<double>")
        )
        p = formatted_plan(
            embedding_near_dup_pairs(emb, threshold=0.2, n_planes=6, n_tables=4, dim=64)
        )
        sections.append(
            (
                "Embedding near-dup (multi-table hyperplane-LSH blocks, r2 rewrite)",
                p,
                grade(
                    p,
                    [
                        ("bucket equi-join", ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin"), True),
                        ("no cartesian product", "CartesianProduct", False),
                        ("no nested-loop join", "NestedLoop", False),
                    ],
                ),
            )
        )

    # ---- 7. CDC-out change feed: driver-side commit pruning + pushed LSN
    # bounds + one fold shuffle; and the consumer-side apply_changes as a
    # broadcast anti-join (no state shuffle in the catch-up case)
    from estuary_spark.config import SyncConfig
    from estuary_spark.generator import LogSpec, write_log
    from estuary_spark.operators.changes import apply_changes
    from estuary_spark.runner import run_sync
    from estuary_spark.tables import LakeTable

    cwork = tempfile.mkdtemp(prefix="audit-changes-")
    write_log(spark, LogSpec(n_convs=40, max_turns=6, seed=61), os.path.join(cwork, "log"))
    ccfg = SyncConfig(
        source_log_dir=os.path.join(cwork, "log"),
        target_table_dir=os.path.join(cwork, "t"),
        n_buckets=8,
        write_mode="mor",
        compact_every=0,
    )
    run_sync(spark, ccfg, events_per_batch=300)
    ct = LakeTable(ccfg.target_table_dir)
    chis = sorted(
        r[1]
        for d, r in ct.manifest()["properties"]["commit_lsn_ranges"].items()
        if "delta-" in d
    )
    cut = chis[len(chis) // 2]
    feed = ct.read_changes(spark, start_lsn=cut + 1)
    n_total = sum(
        len(fl)
        for kind in ("files", "delta_files")
        for fl in ct.manifest().get(kind, {}).values()
    )
    n_opened = len(set(feed.inputFiles()))
    p = formatted_plan(feed)
    checks = grade(
        p,
        [
            ("LSN lower bound pushed to scan", "GreaterThanOrEqual(_lsn", True),
            ("single fold aggregate (max_by), no join", ("max_by", "SortAggregate", "HashAggregate"), True),
            # max_by with a struct buffer falls back to SortAggregate
            # (var-width agg buffer) — a PER-PARTITION sort of the pruned
            # O(changed rows) input. The scale killer would be a GLOBAL
            # sort (rangepartitioning exchange); assert its absence.
            ("no global sort exchange", "rangepartitioning", False),
        ],
    )
    checks.append(
        f"  - {'PASS' if n_opened < n_total else 'MISS'}: commit pruning opened "
        f"{n_opened}/{n_total} live files for a tail catch-up"
    )
    sections.append(("CDC-out change feed (read_changes, tail catch-up)", p, checks))

    state0 = ct.read_changes(spark, 0, end_lsn=cut).filter(F.col("_change_type") == "upsert")
    p = formatted_plan(
        apply_changes(state0, feed, ["conv_id", "turn_idx"], broadcast_feed=True)
    )
    sections.append(
        (
            "Consumer apply_changes (broadcast catch-up)",
            p,
            grade(
                p,
                [
                    ("broadcast anti-join", "BroadcastHashJoin", True),
                    ("anti semantics", "LeftAnti", True),
                    ("no state shuffle join", "SortMergeJoin", False),
                ],
            ),
        )
    )

    # ---- render
    lines = [
        "# PLANS — physical-plan audit evidence",
        "",
        "Captured with `.explain('formatted')` by `tools/explain_audit.py`.",
        "Each section greps the plan for the scale-critical property it claims",
        "(predicate pushdown, pruning, codegen, join strategy).",
        "",
    ]
    for title, plan, checks in sections:
        lines.append(f"## {title}")
        lines.extend(checks)
        lines.append("")
        lines.append("<details><summary>full plan</summary>")
        lines.append("")
        lines.append("```")
        lines.append(plan.strip()[:6000])
        lines.append("```")
        lines.append("</details>")
        lines.append("")

    # persistent measurement notes survive regeneration (BENCH/NOTES.md)
    notes_path = os.path.join(REPO, "BENCH", "NOTES.md")
    if os.path.exists(notes_path):
        with open(notes_path) as fh:
            lines.extend(["---", "", fh.read().strip(), ""])

    out_path = os.path.join(REPO, "BENCH", "PLANS.md")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as fh:
        fh.write("\n".join(lines))
    print(f"wrote {out_path}")
    for title, _, checks in sections:
        print(title)
        for c in checks:
            print(c)


if __name__ == "__main__":
    main()
