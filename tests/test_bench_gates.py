"""Self-enforcing bench gates (VERDICT r9 #1/#2): the warning gates must
catch a PLANTED dropped-hint / unpartitioned-window line, and the
proof/headline split must be structural — no registry query may ever be
classified as a proof entry, and the known proof entries must never
rejoin the headline."""

from __future__ import annotations

import importlib.util
import pathlib

_BENCH = pathlib.Path(__file__).resolve().parent.parent / "bench.py"
_spec = importlib.util.spec_from_file_location("bench", _BENCH)
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)


def test_planted_hint_drop_fails_the_gate(tmp_path):
    log = tmp_path / "err.log"
    log.write_text(
        "26/08/15 12:00:00 WARN HintErrorLogger: Hint (strategy=broadcast) "
        "is not supported in the query: build left for left outer join.\n"
        "ordinary line\n",
        encoding="utf-8",
    )
    counts = bench.check_warning_gates(str(log))
    assert counts["hint_drop_warnings"] == 1
    assert counts["windowexec_warnings"] == 0


def test_planted_unpartitioned_window_fails_the_gate(tmp_path):
    log = tmp_path / "err.log"
    log.write_text(
        "WARN WindowExec: No Partition Defined for Window operation!\n",
        encoding="utf-8",
    )
    counts = bench.check_warning_gates(str(log))
    assert counts["windowexec_warnings"] == 1
    assert counts["hint_drop_warnings"] == 0


def test_clean_log_passes(tmp_path):
    log = tmp_path / "err.log"
    log.write_text("INFO all fine\n", encoding="utf-8")
    assert all(n == 0 for n in bench.check_warning_gates(str(log)).values())


def test_no_registry_query_is_a_proof_entry():
    """The structural classifier must put every registry query in the
    headline; a collision would silently shrink the comparable total."""
    import __spark_entry__ as entry

    misclassified = [n for n in entry.queries() if bench.is_proof_entry(n)]
    assert misclassified == []


def test_known_proof_entries_stay_out_of_the_headline():
    for name in (
        "convert_bigfile", "convert_bigfile_python", "convert_60000_rows",
        "write_bigfile_jvm", "write_bigfile_python", "scan_bigfile_jvm",
        "jpeg_decode_bigcorpus", "dedup_bigcorpus", "lm_bigvocab",
        "pq_rerank_exact_bigvectors", "hamming_bighashes", "geo_bigpoints",
        "linkage_bigrecords", "dedup_incremental_bigbatch",
        "html_bigcorpus", "warc_ingest_bigcrawl", "ann_exact_bigindex",
        "scan_pushdown_bigfile",
        "ann_ivfpq_build_bigindex", "ann_ivfpq_sweep_bigindex",
        "lpa_biggraph", "hits_biggraph", "knn_bigvectors",
        "convert_drift_bigfile",
    ):
        assert bench.is_proof_entry(name), name


def test_job_counter_counts_grouped_and_pool_thread_jobs(spark):
    """The floor-normalized headline (r12 verdict #1) stands on the job
    counter: jobs submitted on the measuring thread land in the job
    group; jobs submitted from worker threads (convert()'s per-table
    ThreadPoolExecutor) don't inherit the group and must be caught by
    the ungrouped-id diff. A missed class would silently zero an
    entry's floor share."""
    from concurrent.futures import ThreadPoolExecutor

    jc = bench._JobCounter(spark)
    jc.start("jc_test_main")
    spark.range(10).count()  # same-thread job → grouped
    with ThreadPoolExecutor(max_workers=1) as ex:
        ex.submit(lambda: spark.range(10).count()).result()  # pool job
    n = jc.stop()
    assert n >= 2, n


def test_sched_floor_is_per_job_and_positive(spark):
    """_measure_sched_floor returns a PER-JOB rate (wall divided by the
    probe action's own job count, which is >1 under AQE) — the unit the
    wall − jobs × floor normalization needs."""
    floor = bench._measure_sched_floor(spark, n=3)
    assert 0 < floor < 5.0, floor


def test_job_counter_cpu_task_telemetry(spark):
    """r13 verdict #2: per-entry executor CPU / task-run seconds via the
    JVM AppStatusStore, so co-tenant steal is observable (wall vs cpu)
    instead of inferred. Contract: a real compute region reports
    positive cpu AND task seconds with cpu <= task (on-CPU time can't
    exceed task wall summed over threads); stages are attributed once —
    a second region never re-counts the first region's stages."""
    jc = bench._JobCounter(spark)
    jc.start("cpu_probe_1")
    spark.range(5_000_000).selectExpr("sum(id * 3 % 7)").collect()
    jc.stop()
    cpu, task = jc.cpu_task_seconds()
    assert cpu > 0.0, (cpu, task)
    assert task > 0.0, (cpu, task)
    assert cpu <= task * 1.05, (cpu, task)  # 5% slack: ms-vs-ns rounding
    seen_before = set(jc._seen_stages)
    jc.start("cpu_probe_2")
    spark.range(10).count()
    jc.stop()
    cpu2, task2 = jc.cpu_task_seconds()
    # second region attributes only ITS OWN stages (all new ids)
    assert jc._seen_stages > seen_before
    assert cpu2 >= 0.0 and cpu2 < cpu + 1.0, (cpu, cpu2)
