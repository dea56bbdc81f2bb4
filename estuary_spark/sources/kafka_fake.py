"""In-process Kafka broker fake — the delivery-semantics test seam
(VERDICT r3 #8: the sandbox has no broker, so the ordering contract the
engine claims — same-PK messages land in one partition, in order — was
asserted only structurally).

``FakeKafkaBroker.publish_frame`` consumes exactly the DataFrame shape
``kafka_key_value`` / ``changes_kafka_frame`` produce (key, value,
headers[, partition]) and applies the producer contract Spark's built-in
Kafka sink delegates to the Kafka client:

* a row with an explicit ``partition`` goes there verbatim;
* otherwise the DEFAULT PARTITIONER assigns
  ``murmur2(key bytes) % num_partitions`` — the exact Kafka algorithm
  (org.apache.kafka.common.utils.Utils.murmur2, seed 0x9747b28c, public
  wire-compat behavior), so a key's partition here equals its partition
  on a real cluster;
* messages append to their partition log in send order — frames
  published sequentially (one per change-feed window / commit range)
  model the sync driver's sequential per-batch producer.

This is a test double, not a transport: no retries, no rebalancing, no
broker failures — those belong to the Kafka client. What it DOES pin
down end-to-end is the engine-owned contract: PK-only keys => stable
partition per key => per-key order across sequentially published
frames, tombstones (NULL value, key kept) for deletes, lineage in the
``lineage`` header."""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame


def murmur2(data: bytes) -> int:
    """Kafka's murmur2 (Utils.murmur2) — the default partitioner's hash.
    32-bit, seed 0x9747b28c; callers take ``& 0x7fffffff`` (toPositive)
    before the modulo, as the Kafka client does."""
    length = len(data)
    seed = 0x9747B28C
    m = 0x5BD1E995
    r = 24
    mask = 0xFFFFFFFF

    h = (seed ^ length) & mask
    n4 = length & ~3
    for i in range(0, n4, 4):
        k = (
            (data[i] & 0xFF)
            | ((data[i + 1] & 0xFF) << 8)
            | ((data[i + 2] & 0xFF) << 16)
            | ((data[i + 3] & 0xFF) << 24)
        )
        k = (k * m) & mask
        k ^= k >> r
        k = (k * m) & mask
        h = (h * m) & mask
        h ^= k
    rem = length & 3
    if rem == 3:
        h ^= (data[n4 + 2] & 0xFF) << 16
    if rem >= 2:
        h ^= (data[n4 + 1] & 0xFF) << 8
    if rem >= 1:
        h ^= data[n4] & 0xFF
        h = (h * m) & mask
    h ^= h >> 13
    h = (h * m) & mask
    h ^= h >> 15
    return h


def default_partition(key: bytes, num_partitions: int) -> int:
    return (murmur2(key) & 0x7FFFFFFF) % num_partitions


@dataclass
class FakeMessage:
    key: str | None
    value: str | None  # None = tombstone
    headers: dict[str, bytes]
    partition: int
    offset: int


@dataclass
class FakeKafkaBroker:
    num_partitions: int = 8
    partitions: dict[int, list[FakeMessage]] = field(default_factory=dict)

    def publish_frame(self, frame: DataFrame, fail_unkeyed: bool = True) -> int:
        """Send one kafka-shaped DataFrame (a change-feed window) through
        the producer contract. Returns the number of messages appended."""
        cols = frame.columns
        sent = 0
        for row in frame.collect():
            key = row["key"]
            if key is None and fail_unkeyed:
                raise ValueError("unkeyed message: the PK-string key is the contract")
            if "partition" in cols and row["partition"] is not None:
                p = int(row["partition"])
                if not (0 <= p < self.num_partitions):
                    raise ValueError(f"explicit partition {p} out of range")
            else:
                p = default_partition(key.encode("utf-8"), self.num_partitions)
            headers = {}
            for h in row["headers"] or []:
                headers[h["key"]] = bytes(h["value"])
            log = self.partitions.setdefault(p, [])
            log.append(
                FakeMessage(
                    key=key,
                    value=row["value"],
                    headers=headers,
                    partition=p,
                    offset=len(log),
                )
            )
            sent += 1
        return sent

    def messages(self) -> list[FakeMessage]:
        return [m for p in sorted(self.partitions) for m in self.partitions[p]]

    def compacted(self) -> dict[str, FakeMessage]:
        """Log-compaction view: last message per key; keys whose last
        message is a tombstone are removed — what a compacted topic's
        consumer materializes."""
        last: dict[str, FakeMessage] = {}
        for p in sorted(self.partitions):
            for m in self.partitions[p]:
                last[m.key] = m
        return {k: m for k, m in last.items() if m.value is not None}
