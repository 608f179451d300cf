"""RocksDB state store configuration for large-state streaming.

Every stateful operator in this package (windowed counts, sessionization,
stateful dedup, interval join, CDC merge) keeps its state in a Spark
state store. The default HDFS-backed provider holds the WHOLE state map
in executor heap — fine for tests, wrong at 100-TB ingest scale where a
dedup-fingerprint or open-sessions map runs to hundreds of GB per
executor: the heap fills, GC pauses stall every microbatch, and the only
lever is more executors.

Spark ships a RocksDB-backed provider (bundled ``rocksdbjni``; Spark
docs "RocksDB state store implementation") that keeps state off-heap on
local disk with block-cache reads. These helpers centralize the configs
this engine wants on a real cluster:

- ``providerClass`` → RocksDB (the switch itself);
- changelog checkpointing: upload per-batch changelogs instead of
  snapshotting the full RocksDB instance every commit — turns checkpoint
  cost O(delta) instead of O(state);
- optional bounded memory: one shared block-cache budget across all
  RocksDB instances on an executor, so state memory is a fixed budget
  rather than per-store unbounded.

State-store provider is fixed at FIRST query start for the lifetime of a
checkpoint — set these BEFORE ``.start()``; an existing checkpoint keeps
the provider it was created with (mirrors the stream_merge lineage rule:
fresh checkpoint -> fresh provider choice).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def rocksdb_state_conf(
    bounded_memory_mb: int | None = None,
    changelog_checkpointing: bool = True,
) -> dict[str, str]:
    """Config dict for RocksDB-backed streaming state.

    Pass to ``get_spark(extra_conf=...)`` for a new session, or apply to
    a live one with :func:`use_rocksdb_state` before starting queries.
    """
    conf = {
        "spark.sql.streaming.stateStore.providerClass": ROCKSDB_PROVIDER,
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled":
            str(changelog_checkpointing).lower(),
    }
    if bounded_memory_mb is not None:
        if bounded_memory_mb <= 0:
            raise ValueError(
                f"bounded_memory_mb must be positive, got {bounded_memory_mb}")
        conf["spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage"] = "true"
        conf["spark.sql.streaming.stateStore.rocksdb.maxMemoryUsageMB"] = str(
            bounded_memory_mb)
    return conf


def use_rocksdb_state(
    spark: SparkSession,
    bounded_memory_mb: int | None = None,
    changelog_checkpointing: bool = True,
) -> dict[str, str | None]:
    """Apply RocksDB state configs to a live session.

    Returns the PREVIOUS value of every key touched (None = was unset)
    so callers — tests especially — can restore the session afterwards.
    """
    prev: dict[str, str | None] = {}
    for k, v in rocksdb_state_conf(
        bounded_memory_mb=bounded_memory_mb,
        changelog_checkpointing=changelog_checkpointing,
    ).items():
        try:
            prev[k] = spark.conf.get(k)
        except Exception:
            prev[k] = None
        spark.conf.set(k, v)
    return prev


def restore_state_conf(spark: SparkSession, prev: dict[str, str | None]) -> None:
    """Undo :func:`use_rocksdb_state` from its returned snapshot."""
    for k, v in prev.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)
