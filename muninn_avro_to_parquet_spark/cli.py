"""Command-line entry points: batch convert, streaming run, drain.

The reference splits these across two files: the pipeline CLI
(/root/reference/main.py:581-599 — ``--input_pattern``,
``--output_prefix``, ``--window_duration``, plus ``--batch_min`` /
``--batch_max`` accepted-but-unused "compat" flags, main.py:586-587) and
an out-of-band launcher/drainer that talks to the Dataflow REST API
(/root/reference/run_dataflow.py:81-143). On Spark there is no service to
POST to — ``spark-submit`` runs this module directly — so ``launch`` is
simply the ``stream`` subcommand and ``drain`` writes the converter's
drain file (JOB_STATE_DRAINING semantics: finish the in-flight batch,
stop polling, exit).

    python -m muninn_avro_to_parquet_spark.cli convert \
        --input_pattern '/data/avro/**/*.avro' --output_prefix /data/parquet
    python -m muninn_avro_to_parquet_spark.cli stream \
        --input_pattern ... --output_prefix ... --checkpoint /ckpt \
        --window_duration 30m
    python -m muninn_avro_to_parquet_spark.cli drain --checkpoint /ckpt
"""

from __future__ import annotations

import argparse
import sys


def _add_io_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--input_pattern", required=True)
    p.add_argument("--output_prefix", required=True)
    p.add_argument("--permissive", action="store_true", help="all-string payload mode")
    p.add_argument(
        "--avro_engine",
        choices=("auto", "jvm", "python"),
        default=None,
        help="Avro decode engine: auto (default — JVM DSv2 scan when the "
        "jar is loaded and the schema is exactly alignable, else the "
        "Python codec), jvm (force, error if unavailable), python "
        "(force the reference-semantics codec). Sets conf "
        "spark.muninn.avro.engine for the run.",
    )
    # accepted for CLI parity with the reference; unused there too
    # (main.py:586-587 "compat")
    p.add_argument("--batch_min", type=int, default=500, help=argparse.SUPPRESS)
    p.add_argument("--batch_max", type=int, default=50000, help=argparse.SUPPRESS)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="muninn-spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_convert = sub.add_parser("convert", help="one-shot batch conversion")
    _add_io_args(p_convert)
    p_convert.add_argument("--ingestion_date", default=None)

    p_stream = sub.add_parser("stream", help="continuous conversion loop")
    _add_io_args(p_stream)
    p_stream.add_argument("--checkpoint", required=True)
    p_stream.add_argument("--window_duration", default="1h")
    p_stream.add_argument("--max_batches", type=int, default=None)
    p_stream.add_argument(
        "--max_files_per_batch", type=int, default=None,
        help="backlog admission cap (like maxFilesPerTrigger): bound each "
        "batch so acknowledgments stay small while a backlog drains",
    )
    p_stream.add_argument(
        "--snapshot_dir", default=None,
        help="also maintain versioned current-state tables here (one per "
        "CDC table), refreshed per acknowledged batch",
    )
    p_stream.add_argument(
        "--snapshot_keys", default=None,
        help="comma-separated primary key payload columns (applied to "
        "every table); required with --snapshot_dir",
    )

    p_drain = sub.add_parser("drain", help="graceful stop of a running stream")
    p_drain.add_argument("--checkpoint", required=True)

    p_compact = sub.add_parser(
        "compact", help="collapse a converted table's small parquet files"
    )
    p_compact.add_argument("--table_dir", required=True)
    p_compact.add_argument(
        "--target_mb", type=int, default=128, help="output file size target"
    )
    p_compact.add_argument(
        "--min_files", type=int, default=4,
        help="skip partitions already under this many files",
    )

    p_snap = sub.add_parser(
        "snapshot",
        help="materialize/refresh a current-state table from converted CDC output",
    )
    p_snap.add_argument(
        "--changes_dir", required=True,
        help="converted parquet directory of ONE table (convert's <out>/<table>)",
    )
    p_snap.add_argument("--table_dir", required=True)
    p_snap.add_argument(
        "--keys", required=True, help="comma-separated primary key payload columns"
    )
    p_snap.add_argument("--keep_versions", type=int, default=2)
    p_snap.add_argument(
        "--keep_deletes", action="store_true",
        help="retain delete tombstones in the snapshot",
    )

    p_vacuum = sub.add_parser(
        "vacuum",
        help="garbage-collect orphaned snapshot version directories "
        "(crashed writes, lost optimistic-commit races)",
    )
    p_vacuum.add_argument("--table_dir", required=True)
    p_vacuum.add_argument(
        "--retention_hours", type=float, default=168.0,
        help="never delete a directory whose newest file is younger than "
        "this (protects in-flight materializations); default 7 days",
    )
    p_vacuum.add_argument(
        "--keep_versions", type=int, default=None,
        help="also collect PUBLISHED versions at least this far below the "
        "current pointer (stranded by a crash mid-prune)",
    )
    p_vacuum.add_argument("--dry_run", action="store_true")

    p_export = sub.add_parser(
        "export", help="re-emit a parquet table as Avro OCF files"
    )
    p_export.add_argument("--input_dir", required=True, help="parquet directory")
    p_export.add_argument("--output_dir", required=True)
    p_export.add_argument(
        "--codec", default="deflate",
        help="null | deflate | snappy | bzip2 | xz (zstandard when installed)",
    )
    p_export.add_argument(
        "--files", type=int, default=None,
        help="repartition to exactly this many output files",
    )
    p_export.add_argument(
        "--avro_engine",
        choices=("auto", "jvm", "python"),
        default="auto",
        help="Avro encode engine: auto (default — in-repo JVM DSv2 writer "
        "when the jar is loaded, the schema maps, and the target is a "
        "local path, else the Arrow/Python writer), jvm (force, error if "
        "unavailable), python (force the Arrow writer).",
    )

    p_shard = sub.add_parser(
        "shard", help="write a parquet corpus as deterministic training shards"
    )
    p_shard.add_argument("--input_dir", required=True, help="parquet directory")
    p_shard.add_argument("--output_dir", required=True)
    p_shard.add_argument("--id_col", required=True)
    p_shard.add_argument("--n_shards", type=int, required=True)
    p_shard.add_argument(
        "--token_col", default=None, help="long column summed into the manifest"
    )

    p_ledger = sub.add_parser(
        "dedup-update",
        help="screen a batch against a persisted dedup band ledger and "
        "append the survivors' bands",
    )
    p_ledger.add_argument("--bands_dir", required=True)
    p_ledger.add_argument("--batch_dir", required=True, help="parquet directory")
    p_ledger.add_argument("--id_col", required=True)
    p_ledger.add_argument("--text_col", default="text")
    p_ledger.add_argument("--num_hashes", type=int, default=16)
    p_ledger.add_argument("--bands", type=int, default=4)
    p_ledger.add_argument("--max_bucket", type=int, default=None)
    p_ledger.add_argument("--batch_id", default=None)
    p_ledger.add_argument(
        "--flags_out", default=None, help="also write the per-doc flag relation here"
    )

    p_bpe = sub.add_parser(
        "bpe-train",
        help="learn BPE merges over a parquet corpus (distributed "
        "vocabulary-relation loop)",
    )
    p_bpe.add_argument("--input_dir", required=True, help="parquet directory")
    p_bpe.add_argument("--text_col", default="text")
    p_bpe.add_argument("--num_merges", type=int, default=1000)
    p_bpe.add_argument("--merges_out", required=True, help="merge table parquet dir")
    p_bpe.add_argument(
        "--segments_out", default=None,
        help="also write the per-word subword segmentation here",
    )
    p_bpe.add_argument(
        "--batch_size", type=int, default=0,
        help="merges per round for BATCHED training (0 = sequential "
        "argmax loop). Batched is the scale path: a 30k-merge vocabulary "
        "is ~num_merges/batch_size round segments, not 30k driver jobs",
    )

    p_html = sub.add_parser(
        "html-extract",
        help="strip boilerplate from an HTML column: main-content text "
        "(and optionally the outlink relation) as parquet",
    )
    p_html.add_argument("--input_dir", required=True, help="parquet directory")
    p_html.add_argument("--output_dir", required=True)
    p_html.add_argument("--id_col", required=True)
    p_html.add_argument("--html_col", default="html")
    p_html.add_argument("--min_words", type=int, default=3)
    p_html.add_argument("--max_link_density", type=float, default=0.33)
    p_html.add_argument(
        "--links_out", default=None,
        help="also write the (id, seq, href, anchor) outlink relation here",
    )

    p_warc = sub.add_parser(
        "warc-ingest",
        help="fan a directory of WARC crawl archives (plain or "
        ".warc.gz) out into a parquet record table",
    )
    p_warc.add_argument("--input_dir", required=True, help="WARC directory")
    p_warc.add_argument("--output_dir", required=True)
    p_warc.add_argument("--glob", default="*.warc*")
    p_warc.add_argument(
        "--responses_only", action="store_true",
        help="keep only response records (the crawl-pipeline payload rows)",
    )

    args = ap.parse_args(argv)

    if args.cmd == "drain":
        # no Spark session needed: just write the drain file the running
        # loop polls between batches (fs seam: the checkpoint may live on
        # an object store next to the data)
        from muninn_avro_to_parquet_spark import fs

        fs.makedirs(args.checkpoint)
        fs.write_text(args.checkpoint.rstrip("/") + "/DRAIN", "drain\n")
        print(f"drain requested: {args.checkpoint.rstrip('/')}/DRAIN")
        return 0

    if args.cmd == "vacuum":
        # driver-only metadata pass: listings + deletes, no Spark session
        from muninn_avro_to_parquet_spark.operators import cdc

        gone = cdc.vacuum_snapshots(
            args.table_dir,
            retention_seconds=args.retention_hours * 3600,
            keep_versions=args.keep_versions,
            dry_run=args.dry_run,
        )
        verb = "would delete" if args.dry_run else "deleted"
        for d in gone:
            print(f"{verb}: {d}")
        print(f"{len(gone)} orphaned version dirs {verb.split()[-1]}")
        return 0

    from muninn_avro_to_parquet_spark.session import get_spark

    spark = get_spark("muninn_cli")
    if getattr(args, "avro_engine", None):
        spark.conf.set("spark.muninn.avro.engine", args.avro_engine)
    try:
        if args.cmd == "compact":
            from muninn_avro_to_parquet_spark.operators import maintenance

            res = maintenance.compact_table(
                spark,
                args.table_dir,
                target_bytes=args.target_mb * 1024 * 1024,
                min_files=args.min_files,
            )
            for part, (before, after) in sorted(res.partitions.items()):
                print(f"{part}: {before} -> {after} files")
            print(f"{len(res.partitions)} partitions compacted, "
                  f"{len(res.skipped)} already compact")
            return 0

        if args.cmd == "snapshot":
            from muninn_avro_to_parquet_spark.operators import cdc

            res = cdc.materialize_snapshot(
                spark,
                args.table_dir,
                spark.read.parquet(args.changes_dir),
                key_cols=args.keys.split(","),
                drop_deletes=not args.keep_deletes,
                keep_versions=args.keep_versions,
            )
            print(f"v{res.version}: {res.rows} rows at {res.path}")
            return 0

        if args.cmd == "export":
            from muninn_avro_to_parquet_spark.sources import avro_sink

            df = spark.read.parquet(args.input_dir)
            if args.files:
                df = df.repartition(args.files)
            manifest = avro_sink.write_avro(
                df, args.output_dir, codec=args.codec, engine=args.avro_engine
            )
            for path, rows in sorted(manifest):
                print(f"{path}: {rows} rows")
            print(f"{len(manifest)} files, {sum(n for _, n in manifest)} rows exported")
            return 0

        if args.cmd == "shard":
            from muninn_avro_to_parquet_spark.operators import pipeline

            manifest = pipeline.write_training_shards(
                spark.read.parquet(args.input_dir),
                args.output_dir,
                args.id_col,
                n_shards=args.n_shards,
                token_count_col=args.token_col,
            )
            for m in manifest:
                toks = "" if m["n_tokens"] is None else f", {m['n_tokens']} tokens"
                print(f"shard {m['shard']}: {m['n_rows']} rows{toks}")
            print(f"{len(manifest)} shards, manifest at "
                  f"{args.output_dir.rstrip('/')}/_MANIFEST.json")
            return 0

        if args.cmd == "dedup-update":
            from pyspark.sql import functions as F

            from muninn_avro_to_parquet_spark.operators import dedup

            flags = dedup.update_dedup_corpus(
                spark,
                args.bands_dir,
                spark.read.parquet(args.batch_dir),
                args.id_col,
                text_col=args.text_col,
                num_hashes=args.num_hashes,
                bands=args.bands,
                max_bucket=args.max_bucket,
                batch_id=args.batch_id,
            )
            if args.flags_out:
                flags.write.mode("overwrite").parquet(args.flags_out)
                flags = spark.read.parquet(args.flags_out)
            n_total = flags.count()
            n_dup = flags.filter(F.col("is_dup")).count()
            print(f"{n_total} docs screened: {n_dup} duplicates, "
                  f"{n_total - n_dup} survivors appended to {args.bands_dir}")
            return 0

        if args.cmd == "bpe-train":
            from pyspark.sql import functions as F

            from muninn_avro_to_parquet_spark.operators import bpe

            docs = spark.read.parquet(args.input_dir)
            seg = None
            if args.batch_size > 0:
                # batched path: rounds is an upper bound sized so the loop
                # can reach num_merges even if early rounds select under
                # batch_size (small alphabets); max_merges caps the total
                # EXACTLY (the last batch is truncated before it applies)
                rounds = max(1, -(-args.num_merges // args.batch_size)) * 2
                res = bpe.learn_bpe_batched(
                    docs,
                    args.text_col,
                    rounds=rounds,
                    batch_size=args.batch_size,
                    slice_factor=32,
                    selection="greedy",
                    max_merges=args.num_merges,
                    # don't pay the final-segmentation materialization
                    # unless the user asked for it (ADVICE r6)
                    return_final_seq=args.segments_out is not None,
                )
                if args.segments_out:
                    from muninn_avro_to_parquet_spark.operators.bpe import _pieces

                    merges, final_seq = res
                    seg = _pieces(final_seq)
                else:
                    merges = res
            elif args.segments_out:
                merges, seg = bpe.learn_and_segment(
                    docs, args.text_col, num_merges=args.num_merges
                )
            else:
                merges = bpe.learn_bpe(
                    docs, args.text_col, num_merges=args.num_merges
                )
            if seg is not None:
                seg.withColumn(
                    "pieces", F.array_join(F.col("pieces"), " ")
                ).write.mode("overwrite").parquet(args.segments_out)
            merges.write.mode("overwrite").parquet(args.merges_out)
            n = spark.read.parquet(args.merges_out).count()
            print(f"{n} merges written to {args.merges_out}")
            if args.segments_out:
                print(f"segmentation at {args.segments_out}")
            return 0

        if args.cmd == "html-extract":
            from muninn_avro_to_parquet_spark.operators import html as html_ops

            pages = spark.read.parquet(args.input_dir)
            ext = html_ops.html_extract(
                pages,
                id_col=args.id_col,
                html_col=args.html_col,
                min_words=args.min_words,
                max_link_density=args.max_link_density,
            )
            ext.write.mode("overwrite").parquet(args.output_dir)
            if args.links_out:
                html_ops.html_links(
                    pages, id_col=args.id_col, html_col=args.html_col
                ).write.mode("overwrite").parquet(args.links_out)
            out = spark.read.parquet(args.output_dir)
            n_docs = out.count()
            n_kept = out.filter("n_kept > 0").count()
            print(f"{n_docs} documents extracted to {args.output_dir} "
                  f"({n_kept} with surviving content)")
            if args.links_out:
                n_links = spark.read.parquet(args.links_out).count()
                print(f"{n_links} outlinks at {args.links_out}")
            return 0

        if args.cmd == "warc-ingest":
            from pyspark.sql import functions as F

            from muninn_avro_to_parquet_spark.sources import warc as warc_src

            recs = warc_src.read_warc(spark, args.input_dir, glob_filter=args.glob)
            if args.responses_only:
                recs = recs.filter(F.col("warc_type") == "response")
            recs.write.mode("overwrite").parquet(args.output_dir)
            out = spark.read.parquet(args.output_dir)
            n = out.count()
            n_resp = out.filter("warc_type = 'response'").count()
            print(
                f"{n} WARC records written to {args.output_dir} "
                f"({n_resp} responses)"
            )
            return 0

        if args.cmd == "convert":
            from muninn_avro_to_parquet_spark import convert

            res = convert.convert(
                spark,
                args.input_pattern,
                args.output_prefix,
                ingestion_date=args.ingestion_date,
                permissive=args.permissive,
            )
            if not res.tables:
                print(
                    f"WARNING: no files matched {args.input_pattern!r} — "
                    "nothing converted",
                    file=sys.stderr,
                )
                return 1
            for table, rows in sorted(res.tables.items()):
                print(f"{table}: {rows} rows")
            return 0

        from muninn_avro_to_parquet_spark.streaming.file_stream import StreamingConverter

        conv = StreamingConverter(
            spark,
            args.input_pattern,
            args.output_prefix,
            args.checkpoint,
            window_duration=args.window_duration,
            permissive=args.permissive,
            max_files_per_batch=args.max_files_per_batch,
            snapshot_dir=args.snapshot_dir,
            snapshot_keys=(
                args.snapshot_keys.split(",") if args.snapshot_keys else None
            ),
        )
        batches = conv.run(max_batches=args.max_batches)
        total = sum(sum(b.tables.values()) for b in batches)
        print(f"{len(batches)} batches, {total} rows converted")
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
