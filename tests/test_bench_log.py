"""The committed bench stderr artifact must stay free of unpartitioned-
window warnings (VERDICT r6 #2 / r7 #2): every ranking window in the
engine is partition-pinned, and bench.py now tees its own JVM stderr
into err_bench.log and exits nonzero on any 'No Partition Defined'
line. This test makes the committed artifact self-enforcing too."""

from __future__ import annotations

import pathlib

import pytest


def test_err_bench_log_free_of_gated_warnings():
    """Sweeps every gated warning class (unpartitioned windows AND
    dropped join hints, r9 #1) over the committed artifact."""
    import importlib.util

    root = pathlib.Path(__file__).resolve().parent.parent
    log = root / "err_bench.log"
    if not log.exists():
        pytest.skip("no err_bench.log committed yet")
    spec = importlib.util.spec_from_file_location("bench", root / "bench.py")
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    counts = bench.check_warning_gates(str(log))
    assert all(n == 0 for n in counts.values()), counts
