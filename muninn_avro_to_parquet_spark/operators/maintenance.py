"""Table maintenance: small-file compaction for streaming parquet output.

The continuous converter (streaming/file_stream.py) appends one parquet
file set per (table, poll, partition). At 100 TB a frequent poll cadence
turns each `ingestion_date=` directory into thousands of KB-sized files —
every later scan then pays a task per file and the NameNode/object-store
listing cost grows without bound. The reference has no answer for this
(its Beam job has the same per-window write pattern, reference
main.py:569-578); a production pipeline runs periodic compaction.

Spark-first design: compaction is a per-partition read→coalesce→rewrite.
Each partition directory is its own job (the swap is confined to one
partition; readers of other partitions are never touched), sized by the
actual byte count so output files land near ``target_bytes``. All file
operations go through the ``fs`` seam, so a table under ``file://``,
``s3://`` or ``gs://`` compacts with the same code — moves are true
renames where the store supports them, pyarrow copy+delete where it
doesn't.
"""

from __future__ import annotations

import uuid
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from muninn_avro_to_parquet_spark import fs


@dataclass
class CompactionResult:
    partitions: dict[str, tuple[int, int]] = field(default_factory=dict)
    """partition path → (files_before, files_after)."""
    skipped: list[str] = field(default_factory=list)


def _basename(p: str) -> str:
    return p.rstrip("/").rsplit("/", 1)[-1]


def _parquet_files(part_dir: str) -> list[str]:
    return [
        p
        for p in fs.list_files(part_dir)
        if _basename(p).endswith(".parquet") and not _basename(p).startswith(("_", "."))
    ]


def list_partition_dirs(table_dir: str) -> list[str]:
    """Every leaf ``key=value`` partition directory under ``table_dir``
    (one level — the conversion layout is ``<table>/ingestion_date=<d>/``)."""
    return [d for d in fs.list_subdirs(table_dir) if "=" in _basename(d)]


def compact_partition(
    spark: SparkSession,
    part_dir: str,
    target_bytes: int = 128 * 1024 * 1024,
    min_files: int = 4,
) -> tuple[int, int] | None:
    """Rewrite one partition directory's parquet files into
    ``ceil(total_bytes / target_bytes)`` files. Returns
    (files_before, files_after), or None when the partition is already
    compact (fewer than ``min_files`` files, or the rewrite would not
    reduce the count).

    Crash safety: the rewrite lands in a ``_compact_*`` staging dir inside
    the partition (underscore-prefixed → invisible to parquet readers),
    then new files move in before old files are removed. A crash mid-swap
    can leave BOTH file sets visible briefly (double-counted rows until
    the next compaction run finishes the job) but never loses rows; a
    transactional table format (Delta/Iceberg) is the strict-isolation
    answer and out of scope here. Stale staging dirs from crashed runs
    are removed on the next invocation."""
    files = _parquet_files(part_dir)
    if len(files) < min_files:
        return None
    total = sum(fs.file_size(f) for f in files)
    n_out = max(1, -(-total // target_bytes))
    if n_out >= len(files):
        return None
    # stale staging dirs from crashed runs hold no referenced data
    for d in fs.list_subdirs(part_dir):
        if _basename(d).startswith("_compact_"):
            fs.delete_dir(d)
    staging = f"{part_dir.rstrip('/')}/_compact_{uuid.uuid4().hex[:12]}"
    (
        spark.read.parquet(*files)
        .coalesce(n_out)
        .write.mode("overwrite")
        .parquet(staging)
    )
    new_files = _parquet_files(staging)
    moved = []
    for i, f in enumerate(new_files):
        dst = (
            f"{part_dir.rstrip('/')}/part-compacted-{i:05d}-"
            f"{uuid.uuid4().hex[:8]}.snappy.parquet"
        )
        fs.move(f, dst)
        moved.append(dst)
    for f in files:
        fs.delete_file(f)
        # Hadoop's local FS writes a `.<name>.crc` sidecar per part file;
        # drop it with its data file so the partition doesn't accumulate
        # orphaned checksums across compactions
        head, _, base = f.rpartition("/")
        crc = f"{head}/.{base}.crc"
        if fs.exists(crc):
            fs.delete_file(crc)
    fs.delete_dir(staging)
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
