"""Structured-Streaming continuous conversion: Spark's own checkpointed
file source driving the per-table convert body.

This is the ``spark.readStream`` counterpart of the ledger-based
``StreamingConverter`` (file_stream.py) — same contract as the reference's
``MatchContinuously(file_pattern, interval, has_deduplication=True)``
(/root/reference/main.py:601-613), but the newly-seen-file tracking is
Spark's FileStreamSource checkpoint instead of a hand-rolled ledger:

- the stream is ``readStream.format("binaryFile")`` over the input glob;
  ``foreachBatch`` receives exactly the files that arrived since the last
  committed batch. Only ``path`` is selected, so column pruning keeps the
  file CONTENT out of the stream — the decode happens in the distributed
  convert path (one executor task per file), not in the source.
- the checkpoint commits AFTER foreachBatch returns: a restart never
  re-delivers an acknowledged batch (exactly-once file tracking), while a
  crash mid-batch replays that batch — the same at-least-once window the
  ledger design (and a fresh Beam launch) has.
- ``Trigger.AvailableNow`` = drain semantics: convert everything matched,
  then stop cleanly. A ``processingTime`` trigger gives the reference's
  fixed-interval polling.

At 100 TB the source's state is the seen-files log in the checkpoint —
the same metadata Spark's own file sink/source pair maintains; every
heavy step (decode, cast, write) is the shuffle-free convert plan.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from muninn_avro_to_parquet_spark import convert as convert_mod

# binaryFile's fixed schema, spelled out because a streaming source cannot
# infer (Spark requires .schema() before .load on readStream)
_BINARYFILE_SCHEMA = (
    "path string, modificationTime timestamp, length long, content binary"
)


@dataclass
class NativeBatchResult:
    batch_id: int
    new_files: list[str] = field(default_factory=list)
    tables: dict[str, int] = field(default_factory=dict)
    fallback_files: list[str] = field(default_factory=list)
    failed_files: list[str] = field(default_factory=list)


def _local_path(uri: str) -> str:
    """FileStreamSource emits file: URIs; convert opens plain paths."""
    if uri.startswith("file:"):
        return uri[len("file:"):]
    return uri


class NativeStreamingConverter:
    """Continuous Avro→Parquet conversion on Spark's checkpointed file
    source. ``process_available()`` = one drain-style run (convert every
    not-yet-acknowledged file, then return); call it again after new files
    arrive — or across process restarts with the same ``checkpoint_dir``
    — and only the new files convert."""

    def __init__(
        self,
        spark: SparkSession,
        input_pattern: str,
        output_prefix: str,
        checkpoint_dir: str,
        permissive: bool = False,
        max_files_per_trigger: int | None = None,
    ) -> None:
        self.spark = spark
        self.input_pattern = input_pattern
        self.output_prefix = output_prefix
        self.checkpoint_dir = checkpoint_dir
        self.permissive = permissive
        self.max_files_per_trigger = max_files_per_trigger
        self.batches: list[NativeBatchResult] = []

    # -- foreachBatch body ----------------------------------------------------

    def _convert_batch(self, batch_df, batch_id: int) -> None:
        """Convert one micro-batch of newly-arrived files.

        The .collect() here is the FILE LIST (driver-side metadata, same
        scale as the source's own seen-files log), not data. Failure
        isolation mirrors the ledger converter: a failing table retries
        file-by-file; a file that fails even the all-string fallback is
        recorded in ``failed_files`` — NOT raised, because raising would
        fail the batch, roll back the checkpoint, and wedge the stream in
        a crash loop on one poison file (at the cost that a poison file
        is skipped for good once the batch commits — same contract as the
        ledger's quarantine)."""
        log = logging.getLogger(__name__)
        paths = sorted(_local_path(r.path) for r in batch_df.select("path").collect())
        result = NativeBatchResult(batch_id=batch_id, new_files=paths)
        self.batches.append(result)
        if not paths:
            return
        for table, table_paths in convert_mod.group_paths_by_table(paths).items():
            try:
                _, rows, degraded, _ = convert_mod._convert_one_table(
                    self.spark,
                    table,
                    table_paths,
                    self.output_prefix,
                    self._ingestion_date,
                    self.permissive,
                    None,
                )
                result.tables[table] = rows
                result.fallback_files.extend(degraded)
            except Exception:
                log.warning(
                    "table %s failed as a batch of %d files; retrying file-by-file",
                    table,
                    len(table_paths),
                    exc_info=True,
                )
                rows_total = 0
                for path in table_paths:
                    try:
                        _, rows, degraded, _ = convert_mod._convert_one_table(
                            self.spark,
                            table,
                            [path],
                            self.output_prefix,
                            self._ingestion_date,
                            self.permissive,
                            None,
                        )
                        rows_total += rows
                        result.fallback_files.extend(degraded)
                    except Exception:
                        log.error(
                            "file %s failed even the all-string fallback; skipping",
                            path,
                            exc_info=True,
                        )
                        result.failed_files.append(path)
                if rows_total:
                    result.tables[table] = rows_total

    # -- runs -----------------------------------------------------------------

    def _stream(self):
        reader = (
            self.spark.readStream.format("binaryFile")
            .schema(_BINARYFILE_SCHEMA)
        )
        if self.max_files_per_trigger is not None:
            reader = reader.option("maxFilesPerTrigger", self.max_files_per_trigger)
        return reader.load(self.input_pattern)

    def process_available(
        self, ingestion_date: str | None = None, timeout_s: int = 600
    ) -> list[NativeBatchResult]:
        """Drain everything currently matched (Trigger.AvailableNow), then
        stop. Returns the batch results of THIS run."""
        self._ingestion_date = ingestion_date
        start_idx = len(self.batches)
        q = (
            self._stream()
            .writeStream.foreachBatch(self._convert_batch)
            .option("checkpointLocation", self.checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        try:
            if not q.awaitTermination(timeout_s):
                raise TimeoutError(
                    f"streaming convert did not drain within {timeout_s}s"
                )
        finally:
            q.stop()
        return self.batches[start_idx:]

    def start_continuous(self, interval: str, ingestion_date: str | None = None):
        """Fixed-interval polling run (the reference's MatchContinuously
        cadence); returns the StreamingQuery — caller owns stop()."""
        self._ingestion_date = ingestion_date
        return (
            self._stream()
            .writeStream.foreachBatch(self._convert_batch)
            .option("checkpointLocation", self.checkpoint_dir)
            .trigger(processingTime=interval)
            .start()
        )
