"""The committed DataSource jar must be exactly what ``jvm/src`` +
``jvm/BUILD.md`` produce (ADVICE r8, medium): pre-built binaries that
nothing ties back to the reviewed source can silently drift from it.
javac is deterministic for a fixed JDK + sources, so the gate is strict
byte equality of every jar entry against a fresh offline compile."""

from __future__ import annotations

import glob
import pathlib
import shutil
import subprocess
import zipfile

import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]
SPARK_JARS = "/opt/spark-4.1.2-bin-hadoop3/jars"
JAR = REPO / "muninn_avro_to_parquet_spark" / "jars" / "muninn-spark-avro.jar"


@pytest.mark.skipif(shutil.which("javac") is None, reason="JDK not installed")
def test_committed_jar_matches_jvm_src(tmp_path):
    sources = sorted(str(p) for p in (REPO / "jvm" / "src").rglob("*.java"))
    assert sources, "jvm/src must contain the DataSource sources"
    classpath = ":".join(sorted(glob.glob(SPARK_JARS + "/*.jar")))
    out = tmp_path / "classes"
    out.mkdir()
    proc = subprocess.run(
        ["javac", "-encoding", "UTF-8", "-cp", classpath, "-d", str(out), *sources],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, f"BUILD.md recipe failed:\n{proc.stderr[-3000:]}"
    shutil.copytree(REPO / "jvm" / "resources" / "META-INF", out / "META-INF")

    rebuilt = {
        str(p.relative_to(out)): p.read_bytes()
        for p in out.rglob("*")
        if p.is_file()
    }
    with zipfile.ZipFile(JAR) as z:
        committed = {i.filename: z.read(i.filename) for i in z.infolist() if not i.is_dir()}
    committed.pop("META-INF/MANIFEST.MF", None)  # added by `jar cf` itself

    assert set(rebuilt) == set(committed), (
        f"jar entry set drifted from source: only-in-jar="
        f"{sorted(set(committed) - set(rebuilt))} only-in-src-build="
        f"{sorted(set(rebuilt) - set(committed))} — rebuild per jvm/BUILD.md"
    )
    stale = [n for n in sorted(rebuilt) if rebuilt[n] != committed[n]]
    assert stale == [], (
        f"jar entries no longer match a fresh compile of jvm/src: {stale} "
        "— rebuild per jvm/BUILD.md"
    )
