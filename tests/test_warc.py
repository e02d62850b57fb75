"""sources/warc: the pure-stdlib WARC codec (ISO 28500) + the Spark
record fan-out. Round-trips through the canonical re-encoder, tolerance
for the wild's bare-LF headers, honest rejects for junk, and the
committed-fixture pins."""

from __future__ import annotations

import gzip
import os

import pytest

from muninn_avro_to_parquet_spark.operators import multimodal
from muninn_avro_to_parquet_spark.sources.warc import (
    WarcRecord,
    encode_warc,
    parse_warc,
    read_warc,
)

_FIXTURE_DIR = os.path.join(
    os.path.dirname(multimodal.__file__), "..", "fixtures", "binary"
)


def _sample_records():
    return [
        WarcRecord("warcinfo", None, "2026-01-01T00:00:00Z", "<urn:uuid:1>",
                   "application/warc-fields", None, None, b"software: x\r\n"),
        WarcRecord("response", "http://a.example/x", "2026-01-01T00:00:01Z",
                   "<urn:uuid:2>", None, 200, "text/html",
                   b"<html><body><p>hello world prose here</p></body></html>"),
        WarcRecord("request", "http://a.example/x", "2026-01-01T00:00:01Z",
                   "<urn:uuid:3>", "application/http; msgtype=request", None,
                   None, b"GET /x HTTP/1.1\r\n\r\n"),
        WarcRecord("response", "http://b.example/y", "2026-01-01T00:00:02Z",
                   "<urn:uuid:4>", None, 404, "text/html",
                   b"<html><body><p>not found at all sorry</p></body></html>"),
    ]


def test_roundtrip_plain_and_gzip():
    recs = _sample_records()
    for gz in (False, True):
        back = parse_warc(encode_warc(recs, gz=gz))
        assert len(back) == len(recs)
        for a, b in zip(recs, back):
            assert (a.warc_type, a.target_uri, a.payload) == (
                b.warc_type, b.target_uri, b.payload), gz
            if a.warc_type == "response":
                assert (b.http_status, b.http_content_type) == (
                    a.http_status, a.http_content_type)
    # deterministic bytes (mtime pinned) — the fixture contract
    assert encode_warc(recs, gz=True) == encode_warc(recs, gz=True)


def test_bare_lf_headers_tolerated():
    """Real crawls contain LF-only record and HTTP headers; the parser
    must read them identically to CRLF."""
    body = b"<p>page body with enough words here</p>"
    http = b"HTTP/1.1 200 OK\nContent-Type: text/html\n\n" + body
    rec = (b"WARC/1.0\nWARC-Type: response\n"
           b"WARC-Target-URI: http://lf.example/\n"
           b"Content-Length: " + str(len(http)).encode() + b"\n\n" + http)
    out = parse_warc(rec)
    assert len(out) == 1
    assert out[0].http_status == 200
    assert out[0].payload == body


def test_honest_rejects():
    with pytest.raises(ValueError, match="WARC"):
        parse_warc(b"not a warc at all")
    with pytest.raises(ValueError, match="gzip"):
        parse_warc(b"\x1f\x8bjunkjunk")
    # truncated block
    rec = b"WARC/1.0\r\nWARC-Type: resource\r\nContent-Length: 100\r\n\r\nshort"
    with pytest.raises(ValueError, match="truncated"):
        parse_warc(rec)
    # missing Content-Length
    rec = b"WARC/1.0\r\nWARC-Type: resource\r\n\r\nbody"
    with pytest.raises(ValueError, match="Content-Length"):
        parse_warc(rec)


def test_read_warc_dataframe_fanout(spark, tmp_path):
    """binaryFile → mapInPandas record fan-out: one row per record,
    executor-side, with HTTP fields populated on responses only."""
    d = tmp_path / "warcs"
    d.mkdir()
    (d / "a.warc.gz").write_bytes(encode_warc(_sample_records(), gz=True))
    (d / "b.warc").write_bytes(encode_warc(_sample_records()[:2], gz=False))
    df = read_warc(spark, str(d))
    rows = {(r["src_file"], r["record_index"]): r for r in df.collect()}
    assert len(rows) == 6
    assert rows[("a.warc.gz", 1)]["http_status"] == 200
    assert rows[("a.warc.gz", 3)]["http_status"] == 404
    assert rows[("a.warc.gz", 0)]["http_status"] is None
    assert bytes(rows[("b.warc", 1)]["payload"]).startswith(b"<html>")
    # default: ONE deliberate exchange — the range-on-path file-spread
    # that un-packs binaryFile's small-file partition packing (r11
    # verdict #6; range not hash, which birthday-collides archives into
    # shared tasks); it moves each archive's compressed bytes exactly
    # once
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange rangepartitioning(path") == plan.count(
        "Exchange"
    )
    # spread_files=False: narrow fan-out, zero shuffle
    plan_ns = (
        read_warc(spark, str(d), spread_files=False)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan_ns


def test_committed_fixtures_parse():
    for name, n_resp in (("wdoc_00.warc.gz", 3), ("wdoc_01.warc", 1)):
        data = open(os.path.join(_FIXTURE_DIR, name), "rb").read()
        recs = parse_warc(data)
        assert sum(r.warc_type == "response" for r in recs) == n_resp, name
        assert recs[0].warc_type == "warcinfo"


def test_crlf_record_with_lf_free_binary_payload():
    """ADVICE r11: the bare-LF separator probe is bounded to the window
    before a found CRLFCRLF — a CRLF-terminated record whose large
    binary payload contains no 0x0A0A pair must parse correctly (and
    without an O(payload) scan per record; the bound is structural, the
    correctness is asserted here)."""
    payload = bytes((i % 9) + 1 for i in range(200_000))  # no 0x0A at all
    rec = (
        b"WARC/1.0\r\n"
        b"WARC-Type: resource\r\n"
        b"WARC-Target-URI: http://h/x\r\n"
        + f"Content-Length: {len(payload)}".encode()
        + b"\r\n\r\n"
        + payload
        + b"\r\n\r\n"
    )
    out = parse_warc(rec * 3)
    assert len(out) == 3
    assert all(r.payload == payload for r in out)
    assert all(r.target_uri == "http://h/x" for r in out)
