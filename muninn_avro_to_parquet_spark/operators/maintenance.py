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


def _pending_path(part_dir: str) -> str:
    return f"{part_dir.rstrip('/')}/_compact_pending.json"


def _delete_with_crc(path: str) -> None:
    if fs.exists(path):
        fs.delete_file(path)
    # Hadoop's local FS writes a `.<name>.crc` sidecar per part file;
    # drop it with its data file so the partition doesn't accumulate
    # orphaned checksums across compactions
    head, _, base = path.rpartition("/")
    crc = f"{head}/.{base}.crc"
    if fs.exists(crc):
        fs.delete_file(crc)


def heal_pending(part_dir: str) -> bool:
    """Finish a crashed swap recorded in the partition's pending manifest:
    complete any outstanding staged→final moves, delete exactly the OLD
    files the manifest names (never re-listing — a re-list after a crash
    between move and delete would see old+new and a naive recompaction
    would bake the duplicates in), then drop staging and manifest. Every
    step is an idempotent exists-guarded operation, so healing itself can
    crash and re-run. Returns True when a manifest was found."""
    import json

    pp = _pending_path(part_dir)
    if not fs.exists(pp):
        return False
    manifest = json.loads(fs.read_text(pp))
    for src, dst in zip(manifest["staged"], manifest["news"]):
        if not fs.exists(dst) and fs.exists(src):
            fs.move(src, dst)
    for f in manifest["olds"]:
        _delete_with_crc(f)
    fs.delete_dir(manifest["staging"])
    fs.delete_file(pp)
    return True


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

    Isolation contract (tested in tests/test_scale_ops.py):

    - **Crash safety**: the rewrite lands in a ``_compact_*`` staging dir
      (underscore-prefixed → invisible to parquet readers); a pending
      MANIFEST naming (olds, staged, news) is written before any visible
      mutation; then new files move in and old files are removed. A crash
      mid-swap can leave both file sets visible briefly, but the next run
      (or ``heal_pending``) finishes exactly the recorded swap — it never
      re-lists mid-state, so rows are never lost OR duplicated.
    - **Concurrent readers**: a reader that listed files BEFORE the swap
      completes may fail with missing files and must re-list (the
      standard non-transactional parquet contract); a fresh read after
      the swap is exact. Readers during the brief both-sets window can
      double-count — a transactional table format (Delta/Iceberg) is the
      strict-isolation answer and out of scope.
    - **Concurrent compactors**: same-partition compaction is
      single-writer by contract; a second invocation that finds an
      in-flight manifest completes THAT swap first (heal) instead of
      recompacting the mixed state into duplicates."""
    import json

    heal_pending(part_dir)
    files = _parquet_files(part_dir)
    if len(files) < min_files:
        return None
    total = sum(fs.file_size(f) for f in files)
    n_out = max(1, -(-total // target_bytes))
    if n_out >= len(files):
        return None
    # stale staging dirs from runs that crashed BEFORE their manifest
    # write hold no referenced data (heal_pending already consumed any
    # manifest-referenced staging above)
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
    staged = _parquet_files(staging)
    news = [
        f"{part_dir.rstrip('/')}/part-compacted-{i:05d}-"
        f"{uuid.uuid4().hex[:8]}.snappy.parquet"
        for i in range(len(staged))
    ]
    fs.write_text(
        _pending_path(part_dir),
        json.dumps({"olds": files, "staged": staged, "news": news, "staging": staging}),
    )
    for src, dst in zip(staged, news):
        fs.move(src, dst)
    for f in files:
        _delete_with_crc(f)
    fs.delete_dir(staging)
    fs.delete_file(_pending_path(part_dir))
    return len(files), len(news)


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
