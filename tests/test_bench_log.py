"""The committed bench stderr artifact must stay free of unpartitioned-
window warnings (VERDICT r6 #2 / r7 #2): every ranking window in the
engine is partition-pinned, and bench.py now tees its own JVM stderr
into err_bench.log and exits nonzero on any 'No Partition Defined'
line. This test makes the committed artifact self-enforcing too."""

from __future__ import annotations

import pathlib

import pytest


def test_err_bench_log_no_unpartitioned_windows():
    log = pathlib.Path(__file__).resolve().parent.parent / "err_bench.log"
    if not log.exists():
        pytest.skip("no err_bench.log committed yet")
    hits = [
        line
        for line in log.read_text(encoding="utf-8", errors="replace").splitlines()
        if "No Partition Defined" in line
    ]
    assert hits == [], f"{len(hits)} unpartitioned-window warnings in err_bench.log"
