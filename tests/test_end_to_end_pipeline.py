"""The full product story in one test: continuous Avro CDC ingest
(reference conversion surface) feeding the LLM-data-pipeline operators —
per-batch dedup-corpus maintenance and the sharded training-corpus
writer. Everything a user of the reference plus this engine's extensions
would actually run, end to end:

    avro files → StreamingConverter.poll_once (exactly-once ledger)
               → converted parquet (Hive layout, payload promoted)
               → update_dedup_corpus (persisted band ledger per batch)
               → survivors accumulate
               → write_training_shards (+_MANIFEST.json)
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from muninn_avro_to_parquet_spark.operators import dedup, pipeline
from muninn_avro_to_parquet_spark.sources import avro_io
from muninn_avro_to_parquet_spark.streaming.file_stream import StreamingConverter

DOC_CDC_SCHEMA = {
    "type": "record",
    "name": "cdc_row",
    "fields": [
        {"name": "uuid", "type": "string"},
        {
            "name": "read_timestamp",
            "type": {"type": "long", "logicalType": "timestamp-millis"},
        },
        {"name": "sort_keys", "type": {"type": "array", "items": "string"}},
        {
            "name": "source_metadata",
            "type": {
                "type": "record",
                "name": "meta",
                "fields": [
                    {"name": "schema", "type": ["null", "string"]},
                    {"name": "table", "type": ["null", "string"]},
                    {"name": "is_deleted", "type": ["null", "boolean"]},
                    {"name": "change_type", "type": ["null", "string"]},
                    {"name": "tx_id", "type": ["null", "long"]},
                    {"name": "lsn", "type": ["null", "string"]},
                    {
                        "name": "primary_keys",
                        "type": ["null", {"type": "array", "items": "string"}],
                    },
                ],
            },
        },
        {
            "name": "payload",
            "type": [
                "null",
                {
                    "type": "record",
                    "name": "row",
                    "fields": [
                        {"name": "id", "type": "long"},
                        {"name": "text", "type": ["null", "string"]},
                        {"name": "source", "type": ["null", "string"]},
                    ],
                },
            ],
        },
    ],
}


def _doc_rec(doc_id: int, text: str, source: str) -> dict:
    return {
        "uuid": f"u{doc_id}",
        "read_timestamp": 1_700_000_000_000 + doc_id,
        "sort_keys": [],
        "source_metadata": {
            "schema": "public",
            "table": "documents",
            "is_deleted": False,
            "change_type": "INSERT",
            "tx_id": doc_id,
            "lsn": f"0/{doc_id}",
            "primary_keys": ["id"],
        },
        "payload": {"id": doc_id, "text": text, "source": source},
    }


def test_ingest_curate_shard_end_to_end(spark, tmp_path):
    in_dir = tmp_path / "avro" / "documents"
    in_dir.mkdir(parents=True)
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    bands_dir = str(tmp_path / "bands")
    shards_dir = str(tmp_path / "shards")

    conv = StreamingConverter(
        spark, str(tmp_path / "avro" / "**" / "*.avro"), out_dir, ckpt, "1h"
    )

    # ---- day 1: three docs, one intra-batch exact dup -----------------
    day1_text = "alpha beta gamma delta epsilon zeta eta theta"
    avro_io.write_file(
        str(in_dir / "d1.avro"),
        DOC_CDC_SCHEMA,
        [
            _doc_rec(1, day1_text, "web"),
            _doc_rec(2, day1_text, "web"),  # dup of 1, same batch
            _doc_rec(3, "completely different first day content here", "books"),
        ],
    )
    res1 = conv.poll_once(ingestion_date="2026-01-01")
    assert res1.tables == {"documents": 3}

    batch1 = spark.read.parquet(f"{out_dir}/documents").filter(
        F.col("ingestion_date") == "2026-01-01"
    )
    flags1 = dedup.update_dedup_corpus(
        spark, bands_dir, batch1, "id", num_hashes=8, bands=4,
        batch_id="2026-01-01",
    )
    f1 = {r["id"]: r["is_dup"] for r in flags1.collect()}
    assert f1 == {1: False, 2: True, 3: False}
    kept1 = batch1.join(
        flags1.filter(~F.col("is_dup")).select("id"), "id", "left_semi"
    )
    kept1.select("id", "text", "source").write.mode("append").parquet(
        str(tmp_path / "curated")
    )

    # ---- day 2: a near-copy of a KEPT day-1 doc + one new doc ---------
    avro_io.write_file(
        str(in_dir / "d2.avro"),
        DOC_CDC_SCHEMA,
        [
            _doc_rec(10, day1_text, "crawl"),  # dup of corpus doc 1
            _doc_rec(11, "entirely new second day material arrives", "web"),
        ],
    )
    res2 = conv.poll_once(ingestion_date="2026-01-02")
    assert res2.tables == {"documents": 2}  # ledger: d1.avro NOT replayed

    batch2 = spark.read.parquet(f"{out_dir}/documents").filter(
        F.col("ingestion_date") == "2026-01-02"
    )
    flags2 = dedup.update_dedup_corpus(
        spark, bands_dir, batch2, "id", num_hashes=8, bands=4,
        batch_id="2026-01-02",
    )
    f2 = {r["id"]: (r["dup_vs_corpus"], r["is_dup"]) for r in flags2.collect()}
    assert f2 == {10: (True, True), 11: (False, False)}
    batch2.join(
        flags2.filter(~F.col("is_dup")).select("id"), "id", "left_semi"
    ).select("id", "text", "source").write.mode("append").parquet(
        str(tmp_path / "curated")
    )

    # ---- exactly-once: an idle poll converts nothing ------------------
    res3 = conv.poll_once(ingestion_date="2026-01-02")
    assert res3.tables == {}

    # ---- final corpus → deterministic shards + manifest ---------------
    curated = spark.read.parquet(str(tmp_path / "curated"))
    assert {r["id"] for r in curated.select("id").collect()} == {1, 3, 11}
    manifest = pipeline.write_training_shards(
        curated.withColumn("n_tokens", F.size(F.split("text", " "))),
        shards_dir, "id", n_shards=2, token_count_col="n_tokens",
    )
    assert sum(m["n_rows"] for m in manifest) == 3
    on_disk = json.loads(open(f"{shards_dir}/_MANIFEST.json").read())
    assert on_disk["shards"] == manifest
    back = pipeline.read_training_shards(spark, shards_dir)
    assert back.count() == 3
    # the dup never reached the training corpus
    assert {r["id"] for r in back.select("id").collect()} == {1, 3, 11}
