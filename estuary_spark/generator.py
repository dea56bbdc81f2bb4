"""Deterministic synthetic CDC-log generator (no external data).

Generates an ordered stream of row-level change events over "transcript"
keys ``(conv_id, turn_idx)`` — the Spark analogue of estuary's binlog entry
stream (one ``(Entry, RowData)`` pair per changed row,
``mysql/lifecycle/package.scala:96-134`` in /root/reference), with the
knobs FIXTURES.md requires: update/delete ratios, hot-key skew,
out-of-order LSNs (late data), duplicate-event injection (replay
simulation), and an additive schema-evolution phase.

Everything is generated with ``spark.range`` + column expressions —
deterministic given the seed, fully distributed, no driver-side loops, so
the same code scales from 10^4 test events to 10^8+ bench events.

LSN construction (scalable, collision-free, no global sort):
  key_id = conv_idx * max_turns + turn_idx   (unique per key)
  lsn    = stratum(version) * SLOT + bij(key_id, version)
where SLOT is a power of two >= number of keys and ``bij`` is a bijection
mod SLOT (odd multiplier), so LSNs are unique, per-key increasing in
version — except for keys flagged "out-of-order", whose adjacent version
strata are swapped, producing genuinely late (lower-version, higher-LSN)
events that the LWW merge must resolve by LSN, not arrival order.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F


@dataclass
class LogSpec:
    """Knobs for the synthetic CDC log (all effects seeded/deterministic)."""

    n_convs: int = 100
    max_turns: int = 16
    # versions per key: 1 + (hash % base_versions)
    base_versions: int = 4
    # hot-key skew: first n_hot conversations get hot_versions updates per
    # turn (the reference has NO skew handling — SURVEY.md P6; we must)
    n_hot: int = 2
    hot_versions: int = 64
    # % of non-first versions that are deletes (tombstones)
    delete_pct: int = 12
    # % of keys whose version strata are swapped (out-of-order/late LSNs)
    ooo_pct: int = 10
    # % of events duplicated verbatim (same LSN — replay/dup injection)
    dup_pct: int = 5
    # LSN threshold fraction after which evolved columns appear
    evolve_frac: float = 0.6
    seed: int = 42
    txn_size: int = 100

    @property
    def slot(self) -> int:
        n_keys = self.n_convs * self.max_turns
        s = 1
        while s < n_keys:
            s <<= 1
        return s


def _h(*cols, seed: int):
    """Deterministic 64-bit hash of columns + seed (xxhash64, JVM-side)."""
    return F.xxhash64(*cols, F.lit(seed))


def generate_log(spark: SparkSession, spec: LogSpec) -> DataFrame:
    """Build the change-event DataFrame (unordered; order by ``lsn``).

    Columns: lsn, commit_ts, op, conv_id, turn_idx, role, text, tool, ts,
    txn_id, schema_ver — the FIXTURES.md `cdc_events` shape.
    """
    nk = spec.n_convs * spec.max_turns
    slot = spec.slot

    keys = (
        spark.range(nk)
        .withColumn("conv_idx", (F.col("id") / spec.max_turns).cast("long"))
        .withColumn("turn_idx", (F.col("id") % spec.max_turns).cast("int"))
    )
    # turns per conversation: 1..max_turns, deterministic per conv
    keys = keys.withColumn(
        "n_turns",
        (F.pmod(_h(F.col("conv_idx"), seed=spec.seed + 1), F.lit(spec.max_turns)) + 1).cast("int"),
    ).filter(F.col("turn_idx") < F.col("n_turns"))

    # versions per key (hot keys get many more -> realistic skew)
    keys = keys.withColumn(
        "n_versions",
        F.when(F.col("conv_idx") < spec.n_hot, F.lit(spec.hot_versions)).otherwise(
            (F.pmod(_h(F.col("id"), seed=spec.seed + 2), F.lit(spec.base_versions)) + 1).cast("int")
        ),
    )

    ev = keys.select(
        F.col("id").alias("key_id"),
        "conv_idx",
        "turn_idx",
        F.explode(F.sequence(F.lit(0), F.col("n_versions") - 1)).alias("version"),
    )

    # out-of-order flag: swap adjacent version strata for flagged keys
    ooo = F.pmod(_h(F.col("key_id"), seed=spec.seed + 3), F.lit(100)) < spec.ooo_pct
    stratum = F.when(
        ooo & (F.col("version") % 2 == 0), F.col("version") + 1
    ).when(ooo & (F.col("version") % 2 == 1), F.col("version") - 1).otherwise(F.col("version"))

    # bijection mod SLOT (odd multiplier => bijective mod 2^k)
    bij = F.pmod(
        F.col("key_id") * F.lit(2654435761) + F.col("version") * F.lit(40503) + F.lit(spec.seed),
        F.lit(slot),
    )
    ev = ev.withColumn("lsn", (stratum.cast("long") * slot + bij).cast("long"))

    # op: version 0 is insert; later versions mostly update, some delete.
    # insert & update are both upserts (estuary renders `replace into` for
    # both — CanalEntry2RowDataInfoMappingFormat.scala:55), delete is a
    # keyed tombstone carrying the key (package.scala:103-107).
    r = F.pmod(_h(F.col("key_id"), F.col("version"), seed=spec.seed + 4), F.lit(100))
    ev = ev.withColumn(
        "op",
        F.when(F.col("version") == 0, F.lit("insert"))
        .when(r < spec.delete_pct, F.lit("delete"))
        .otherwise(F.lit("update")),
    )

    roles = F.array(F.lit("user"), F.lit("assistant"), F.lit("system"), F.lit("tool"))
    ev = (
        ev.withColumn("conv_id", F.concat(F.lit("conv-"), F.col("conv_idx").cast("string")))
        .withColumn("role", F.element_at(roles, (F.pmod(F.col("turn_idx"), F.lit(4)) + 1).cast("int")))
        .withColumn(
            "text",
            F.concat(
                F.lit("msg "),
                F.col("conv_id"),
                F.lit(" t"),
                F.col("turn_idx").cast("string"),
                F.lit(" v"),
                F.col("version").cast("string"),
                F.lit(" "),
                F.md5(F.concat(F.col("key_id").cast("string"), F.lit(":"), F.col("version").cast("string"))),
            ),
        )
        .withColumn(
            "tool",
            F.when(F.col("role") == "tool", F.concat(F.lit("tool_"), F.pmod(F.col("key_id"), F.lit(7)).cast("string"))),
        )
        .withColumn("ts", F.timestamp_seconds(F.lit(1704067200) + F.col("lsn") % 864000))
        .withColumn("commit_ts", F.timestamp_seconds(F.lit(1704067200) + F.col("lsn") % 864000 + 1))
        .withColumn("txn_id", (F.col("lsn") / spec.txn_size).cast("long"))
        .withColumn("schema_ver", F.lit(1))
    )

    cols = ["lsn", "commit_ts", "op", "conv_id", "turn_idx", "role", "text", "tool", "ts", "txn_id", "schema_ver"]
    ev = ev.select(*cols, "key_id", "version")

    # duplicate-event injection: a deterministic sample re-emitted verbatim
    if spec.dup_pct > 0:
        dups = ev.filter(F.pmod(_h(F.col("lsn"), seed=spec.seed + 5), F.lit(100)) < spec.dup_pct)
        ev = ev.unionByName(dups)

    return ev.drop("key_id", "version")


def evolved_split_lsn(spark: SparkSession, log_df: DataFrame, spec: LogSpec) -> int:
    """LSN threshold after which evolved columns appear (quantile-based)."""
    [q] = log_df.stat.approxQuantile("lsn", [spec.evolve_frac], 0.01)
    return int(q)


def write_log(
    spark: SparkSession,
    spec: LogSpec,
    out_dir: str,
    evolve: bool = False,
    n_files: int = 8,
) -> dict:
    """Write the log as ordered parquet under ``out_dir``.

    With ``evolve=True`` events past the evolve-threshold LSN gain additive
    nullable columns (``tool_args``, ``latency_ms``) and are written as a
    second batch of files with the wider schema — the reader uses
    ``mergeSchema`` (FIXTURES.md §3; estuary analogue: ALTER ADD COLUMN
    handled by MysqlTableSchemaHolder.scala:79-101).
    """
    os.makedirs(out_dir, exist_ok=True)
    log = generate_log(spark, spec)
    info: dict = {"spec": spec, "evolved": evolve}
    if not evolve:
        log.repartitionByRange(n_files, "lsn").sortWithinPartitions("lsn").write.mode(
            "overwrite"
        ).parquet(out_dir)
        return info

    # evolved log: two phase directories (log segments arriving over time —
    # a batch read of phase2 carries the wider schema, triggering the
    # engine's runtime schema reconciliation)
    split = evolved_split_lsn(spark, log, spec)
    info["split_lsn"] = split
    info["phase_dirs"] = [os.path.join(out_dir, "phase1"), os.path.join(out_dir, "phase2")]
    phase1 = log.filter(F.col("lsn") < split)
    phase2 = (
        log.filter(F.col("lsn") >= split)
        .withColumn("tool_args", F.when(F.col("tool").isNotNull(), F.concat(F.lit('{"arg":'), F.pmod(F.col("lsn"), F.lit(100)).cast("string"), F.lit("}"))))
        .withColumn("latency_ms", F.pmod(F.col("lsn"), F.lit(5000)).cast("int"))
        .withColumn("schema_ver", F.lit(2))
    )
    phase1.repartitionByRange(max(1, n_files // 2), "lsn").sortWithinPartitions("lsn").write.mode(
        "overwrite"
    ).parquet(info["phase_dirs"][0])
    phase2.repartitionByRange(max(1, n_files // 2), "lsn").sortWithinPartitions("lsn").write.mode(
        "overwrite"
    ).parquet(info["phase_dirs"][1])
    return info


def read_log(spark: SparkSession, log_dir: str) -> DataFrame:
    """Read the change log, merging schemas across evolution phases
    (recursive lookup covers phase subdirectories)."""
    return (
        spark.read.option("mergeSchema", "true")
        .option("recursiveFileLookup", "true")
        .parquet(log_dir)
    )


def expected_final_state(log_df: DataFrame, key_cols=("conv_id", "turn_idx")) -> DataFrame:
    """Reference fold: last-writer-wins by LSN, tombstones folded.

    This is the pure declarative statement of the engine's invariant
    (per-turn text equality under stable (conv_id, turn_idx, LSN)
    ordering). Used by tests as the oracle against the incremental engine.
    """
    value_cols = [c for c in log_df.columns if c not in ("lsn", "op", "commit_ts", "txn_id", "schema_ver")]
    winner = (
        log_df.groupBy(*key_cols)
        .agg(F.max_by(F.struct(*[c for c in value_cols if c not in key_cols], "op", "lsn"), F.col("lsn")).alias("w"))
        .select(*key_cols, "w.*")
    )
    return winner.filter(F.col("op") != "delete").drop("op").withColumnRenamed("lsn", "_lsn")
