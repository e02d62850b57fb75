"""Property-based spot checks (SURVEY §5.6): random Avro schemas and rows
through codec → schema mapper → distributed read; invariants, not goldens.

Invariants:
- the pure-Python Avro codec round-trips every value it wrote;
- the schema mapper never crashes on any union/logical/complex shape and
  always yields a Spark-valid type;
- CDC conversion of random payloads always produces a DataFrame matching
  the derived schema (or lands in the permissive fallback) — never a
  crash.
"""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from muninn_avro_to_parquet_spark import schema as S
from muninn_avro_to_parquet_spark.sources import avro_io

# --- strategies -------------------------------------------------------------

PRIMITIVES = ["null", "boolean", "int", "long", "float", "double", "bytes", "string"]

primitive_node = st.sampled_from(PRIMITIVES)

logical_node = st.sampled_from(
    [
        {"type": "long", "logicalType": "timestamp-millis"},
        {"type": "long", "logicalType": "timestamp-micros"},
        {"type": "int", "logicalType": "date"},
        {"type": "bytes", "logicalType": "decimal", "precision": 38, "scale": 30},
        {"type": "long", "logicalType": "time-millis"},
    ]
)


def _record_node(children):
    return st.builds(
        lambda fields: {
            "type": "record",
            "name": "r",
            "fields": [{"name": f"f{i}", "type": t} for i, t in enumerate(fields)],
        },
        st.lists(children, min_size=1, max_size=4),
    )


# the Avro spec forbids unions immediately inside unions, so build
# non-union shapes first and let unions only wrap those
non_union_type = st.recursive(
    primitive_node | logical_node,
    lambda children: st.one_of(
        st.builds(lambda t: {"type": "array", "items": t}, children),
        st.builds(lambda t: {"type": "map", "values": t}, children),
        _record_node(children),
    ),
    max_leaves=6,
)

avro_type = st.one_of(
    non_union_type,
    st.builds(lambda t: ["null", t], non_union_type),
    # duplicate members in a union are illegal too
    st.builds(lambda a, b: [a, b], primitive_node, primitive_node).filter(
        lambda u: u[0] != u[1]
    ),
)


def _value_for(node, draw):
    """A value valid for an Avro type node (None only where unions allow)."""
    if isinstance(node, list):
        member = node[0] if node[0] != "null" else (node[1] if len(node) > 1 else "null")
        if member == "null":
            return None
        return _value_for(member, draw)
    if isinstance(node, dict):
        t = node["type"]
        if t == "array":
            return [_value_for(node["items"], draw) for _ in range(draw(st.integers(0, 3)))]
        if t == "map":
            return {
                f"k{i}": _value_for(node["values"], draw)
                for i in range(draw(st.integers(0, 3)))
            }
        if t == "record":
            return {f["name"]: _value_for(f["type"], draw) for f in node["fields"]}
        node = t  # logical dict → base primitive
    return draw(
        {
            "null": st.none(),
            "boolean": st.booleans(),
            "int": st.integers(-(2**31), 2**31 - 1),
            "long": st.integers(-(2**63), 2**63 - 1),
            "float": st.floats(width=32, allow_nan=False, allow_infinity=False),
            "double": st.floats(allow_nan=False, allow_infinity=False),
            "bytes": st.binary(max_size=16),
            "string": st.text(max_size=16),
        }[node]
    )


# --- schema-mapper properties ----------------------------------------------


@given(avro_type)
@settings(max_examples=200, deadline=None)
def test_mapper_total_and_spark_valid(node):
    """map_avro_node is total: any generated node yields a Spark DataType
    and a bool, and the type serializes to valid JSON."""
    dt, nullable, src = S.map_avro_node(node)
    assert isinstance(dt, T.DataType)
    assert isinstance(nullable, bool)
    assert isinstance(src, str)
    T.StructType([T.StructField("x", dt, nullable)]).json()


@given(st.lists(primitive_node | logical_node, min_size=1, max_size=5))
@settings(max_examples=100, deadline=None)
def test_mapper_union_rules(members):
    """Union collapse invariants: non-null-first unions become string;
    null-first unions take exactly the second member; all unions nullable."""
    dt, nullable, _ = S.map_avro_node(members)
    assert nullable is True or members[0] not in ("null",)
    if members[0] != "null":
        assert dt == T.StringType()
    elif len(members) >= 2:
        expected, _, _ = S.map_avro_node(["null", members[1]])
        assert dt == expected


# --- codec round-trip properties -------------------------------------------


@st.composite
def schema_and_rows(draw):
    n_fields = draw(st.integers(1, 4))
    fields = [draw(avro_type) for _ in range(n_fields)]
    schema = {
        "type": "record",
        "name": "row",
        "fields": [{"name": f"c{i}", "type": t} for i, t in enumerate(fields)],
    }
    n_rows = draw(st.integers(0, 5))
    rows = [
        {f"c{i}": _value_for(t, draw) for i, t in enumerate(fields)}
        for _ in range(n_rows)
    ]
    return schema, rows


def _approx_eq(a, b):
    if isinstance(a, float) and isinstance(b, float):
        return math.isclose(a, b, rel_tol=1e-6) or (math.isnan(a) and math.isnan(b))
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(_approx_eq(x, y) for x, y in zip(a, b))
    if isinstance(a, dict) and isinstance(b, dict):
        return a.keys() == b.keys() and all(_approx_eq(a[k], b[k]) for k in a)
    return a == b


@given(schema_and_rows())
@settings(max_examples=60, deadline=None, suppress_health_check=[HealthCheck.data_too_large])
def test_avro_codec_roundtrip(tmp_path_factory, sr):
    """write_file → read_file preserves every value (floats to fp32
    precision where the schema says float)."""
    schema, rows = sr
    path = str(tmp_path_factory.mktemp("avro") / "t.avro")
    avro_io.write_file(path, schema, rows)
    got_schema, got_rows = avro_io.read_file(path)
    assert got_schema == schema
    assert len(got_rows) == len(rows)
    for w, g in zip(rows, got_rows):
        for k, wv in w.items():
            gv = g[k]
            if isinstance(wv, float) and isinstance(gv, float) and not _approx_eq(wv, gv):
                # fp32 truncation for "float" fields
                assert math.isclose(wv, gv, rel_tol=1e-6, abs_tol=1e-30)
            else:
                assert _approx_eq(wv, gv), (k, wv, gv)


@given(schema_and_rows())
@settings(max_examples=30, deadline=None, suppress_health_check=[HealthCheck.data_too_large])
def test_avro_snappy_roundtrip(tmp_path_factory, sr):
    """Snappy-codec OCF files (Datastream's common shape) round-trip through
    the pure-Python codec: compress on write, decompress + CRC check on read."""
    schema, rows = sr
    path = str(tmp_path_factory.mktemp("avro") / "t.avro")
    avro_io.write_file(path, schema, rows, codec="snappy")
    got_schema, got_rows = avro_io.read_file(path)
    assert got_schema == schema
    assert len(got_rows) == len(rows)
    for w, g in zip(rows, got_rows):
        for k, wv in w.items():
            assert _approx_eq(wv, g[k]) or (
                isinstance(wv, float) and math.isclose(wv, g[k], rel_tol=1e-6, abs_tol=1e-30)
            ), (k, wv, g[k])


def test_snappy_decompress_back_references():
    """The decoder must handle the full snappy format — including copy
    elements (1/2-byte offsets) and overlapping run-length copies — not just
    the literal-only streams our own compressor emits."""
    # literal "abcd", then copy1 len=4 offset=4 → "abcdabcd"
    stream = bytes([8]) + bytes([3 << 2]) + b"abcd" + bytes([(0 << 5) | (0 << 2) | 1, 4])
    assert avro_io._snappy_decompress(stream) == b"abcdabcd"
    # literal "ab", then overlapping copy2 len=6 offset=2 → "ab" * 4
    stream = bytes([8]) + bytes([1 << 2]) + b"ab" + bytes([(5 << 2) | 2, 2, 0])
    assert avro_io._snappy_decompress(stream) == b"abababab"
    # corrupt CRC must be rejected
    block = avro_io._avro_snappy_encode(b"payload")
    bad = block[:-1] + bytes([block[-1] ^ 0xFF])
    try:
        avro_io._avro_snappy_decode(bad)
        raise AssertionError("CRC mismatch not detected")
    except ValueError as e:
        assert "CRC" in str(e)


# --- end-to-end conversion robustness ---------------------------------------


@st.composite
def cdc_payload_schema_and_rows(draw):
    """A CDC-shaped Avro schema (envelope + random payload record) and
    matching rows."""
    n_fields = draw(st.integers(1, 3))
    field_types = [draw(avro_type) for _ in range(n_fields)]
    payload = {
        "type": "record",
        "name": "p",
        "fields": [{"name": f"c{i}", "type": t} for i, t in enumerate(field_types)],
    }
    schema = {
        "type": "record",
        "name": "rec",
        "fields": [
            {
                "name": "source_metadata",
                "type": {
                    "type": "record",
                    "name": "sm",
                    "fields": [
                        {"name": "schema", "type": "string"},
                        {"name": "table", "type": "string"},
                        {"name": "is_deleted", "type": "boolean"},
                        {"name": "change_type", "type": "string"},
                        {"name": "tx_id", "type": ["null", "long"]},
                        {"name": "lsn", "type": "string"},
                        {"name": "primary_keys", "type": {"type": "array", "items": "string"}},
                    ],
                },
            },
            {"name": "payload", "type": payload},
        ],
    }
    n_rows = draw(st.integers(1, 4))
    rows = [
        {
            "source_metadata": {
                "schema": "s",
                "table": "prop",
                "is_deleted": False,
                "change_type": "INSERT",
                "tx_id": i,
                "lsn": f"0/{i}",
                "primary_keys": ["c0"],
            },
            "payload": {f"c{j}": _value_for(t, draw) for j, t in enumerate(field_types)},
        }
        for i in range(n_rows)
    ]
    return schema, rows


@given(cdc_payload_schema_and_rows())
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.data_too_large])
def test_convert_never_crashes(spark, tmp_path_factory, sr):
    """Invariant (SURVEY §5.6): ANY valid CDC Avro input converts — typed
    or via the all-string fallback — with every row accounted for."""
    from muninn_avro_to_parquet_spark import convert

    schema, rows = sr
    base = tmp_path_factory.mktemp("prop")
    avro_dir = base / "avro" / "prop"
    avro_dir.mkdir(parents=True)
    avro_io.write_file(str(avro_dir / "f.avro"), schema, rows)
    res = convert.convert(
        spark, str(base / "avro" / "**" / "*.avro"), str(base / "out"),
        ingestion_date="2026-01-08",
    )
    assert res.tables == {"prop": len(rows)}
    back = spark.read.parquet(str(base / "out" / "prop"))
    assert back.count() == len(rows)


def test_large_header_schema(tmp_path_factory):
    """A writer schema bigger than the 64 KiB initial header read must
    parse (varints landing on the buffer boundary included)."""
    fields = [
        {"name": f"col_{i}", "type": "string", "doc": "d" * 64}
        for i in range(1200)
    ]
    schema = {"type": "record", "name": "wide", "fields": fields}
    import json

    assert len(json.dumps(schema)) > (1 << 16)
    path = str(tmp_path_factory.mktemp("hdr") / "wide.avro")
    rows = [{f["name"]: "" for f in fields}]
    avro_io.write_file(path, schema, rows)
    got = avro_io.read_schema(path)
    assert got == schema
    assert len(list(avro_io.iter_records(path))) == 1


def test_named_type_reuse_roundtrip(tmp_path_factory):
    """Valid Avro named-type reuse (bare and fullname refs) decodes even
    when the defining branch was never taken first."""
    schema = {
        "type": "record", "name": "rec", "namespace": "com.x", "fields": [
            {"name": "a", "type": ["null", {"type": "record", "name": "Addr",
                "fields": [{"name": "city", "type": "string"}]}]},
            {"name": "b", "type": ["null", "Addr"]},
            {"name": "c", "type": ["null", "com.x.Addr"]},
        ]}
    rows = [
        {"a": None, "b": {"city": "rio"}, "c": None},
        {"a": {"city": "sp"}, "b": None, "c": {"city": "bh"}},
    ]
    path = str(tmp_path_factory.mktemp("named") / "n.avro")
    avro_io.write_file(path, schema, rows)
    _, got = avro_io.read_file(path)
    assert got == rows


def test_split_ranges_partition_records(tmp_path_factory):
    """Disjoint byte splits must decode every record exactly once, for
    any split size — the contract behind huge-file fan-out."""
    schema = {"type": "record", "name": "r", "fields": [{"name": "x", "type": "long"}]}
    rows = [{"x": i} for i in range(10_000)]
    path = str(tmp_path_factory.mktemp("split") / "big.avro")
    avro_io.write_file(path, schema, rows, block_size=100)  # many sync points
    import os

    size = os.path.getsize(path)
    for n_splits in (1, 2, 3, 7, 16):
        step = -(-size // n_splits)
        got = []
        for i in range(n_splits):
            got.extend(
                r["x"]
                for r in avro_io.iter_records_range(
                    path, i * step, min((i + 1) * step, size)
                )
            )
        assert sorted(got) == list(range(10_000)), f"n_splits={n_splits}: {len(got)}"


def test_distributed_read_with_small_split_threshold(spark, tmp_path_factory, monkeypatch):
    """End-to-end conversion with a tiny split threshold: one file fans
    out over many splits and still yields every row once."""
    from muninn_avro_to_parquet_spark.sources import avro_source

    monkeypatch.setattr(avro_source, "SPLIT_BYTES", 2048)
    schema = {
        "type": "record", "name": "rec", "fields": [
            {"name": "source_metadata", "type": {"type": "record", "name": "sm", "fields": [
                {"name": "schema", "type": "string"}, {"name": "table", "type": "string"},
                {"name": "is_deleted", "type": "boolean"}, {"name": "change_type", "type": "string"},
                {"name": "tx_id", "type": ["null", "long"]}, {"name": "lsn", "type": "string"},
                {"name": "primary_keys", "type": {"type": "array", "items": "string"}}]}},
            {"name": "payload", "type": {"type": "record", "name": "p", "fields": [
                {"name": "id", "type": "long"}]}},
        ]}
    rows = [
        {"source_metadata": {"schema": "s", "table": "t", "is_deleted": False,
                             "change_type": "I", "tx_id": i, "lsn": "0/1",
                             "primary_keys": ["id"]},
         "payload": {"id": i}}
        for i in range(5000)
    ]
    path = str(tmp_path_factory.mktemp("bigavro") / "one.avro")
    avro_io.write_file(path, schema, rows, block_size=50)
    splits = avro_source.plan_splits([path], split_bytes=2048)
    assert len(splits) > 4  # the single file genuinely fans out
    df = avro_source.read_avro(spark, [path])
    ids = [r["id"] for r in df.select("id").collect()]
    assert sorted(ids) == list(range(5000))


def test_union_branch_index_out_of_range_raises():
    """A corrupt varint must not decode the wrong branch via Python
    negative indexing, nor leak a bare IndexError."""
    union = ["null", "long"]
    # zigzag(5)=10 → branch index 5 of a 2-branch union
    r = avro_io._Reader(bytes([10]))
    with pytest.raises(ValueError, match="union branch"):
        avro_io._decode(r, union, {})
    # zigzag(-1)=1 → would have silently decoded node[-1] before the fix
    r = avro_io._Reader(bytes([1, 0x02]))
    with pytest.raises(ValueError, match="union branch"):
        avro_io._decode(r, union, {})


def test_per_file_sync_markers_differ(tmp_path_factory):
    """Sync markers are derived per (schema, path) — two files must not
    share one predictable constant (payload-collision hazard on splits)."""
    schema = {"type": "record", "name": "r", "fields": [{"name": "x", "type": "long"}]}
    d = tmp_path_factory.mktemp("syncs")
    pa, pb = str(d / "a.avro"), str(d / "b.avro")
    avro_io.write_file(pa, schema, [{"x": 1}])
    avro_io.write_file(pb, schema, [{"x": 1}])
    syncs = []
    for p in (pa, pb):
        with open(p, "rb") as f:
            header = f.read(1 << 16)
            _, sync, _ = avro_io._parse_header(header, f)
        syncs.append(sync)
    assert syncs[0] != syncs[1]
    _, rows = avro_io.read_file(pa)
    assert [r["x"] for r in rows] == [1]


def test_split_boundary_inside_header_sync_window(tmp_path_factory):
    """A split starting inside the 16 bytes before data_start must NOT
    double-decode the first block."""
    schema = {"type": "record", "name": "r", "fields": [{"name": "x", "type": "long"}]}
    rows = [{"x": i} for i in range(50)]
    path = str(tmp_path_factory.mktemp("hdrsplit") / "t.avro")
    avro_io.write_file(path, schema, rows, block_size=10)
    import os

    size = os.path.getsize(path)
    with open(path, "rb") as f:
        header = f.read(1 << 16)
    _, _, data_start = avro_io._parse_header(header, open(path, "rb"))
    # boundary chosen INSIDE the synthetic header-sync window
    for boundary in range(max(1, data_start - 15), data_start + 1):
        got = [r["x"] for r in avro_io.iter_records_range(path, 0, boundary)]
        got += [r["x"] for r in avro_io.iter_records_range(path, boundary, size)]
        assert sorted(got) == list(range(50)), boundary


def test_compiled_decoder_matches_interpretive():
    """compile_decoder is the hot path; _decode is the executable spec.
    Both must produce identical values over a schema exercising every
    branch: nested record, enum, fixed, map, array, multi-member union,
    ["null", T] fast path, and a RECURSIVE named type."""
    schema = {
        "type": "record",
        "name": "Node",
        "fields": [
            {"name": "val", "type": "int"},
            {"name": "tag", "type": {"type": "enum", "name": "Tag", "symbols": ["A", "B"]}},
            {"name": "fp", "type": {"type": "fixed", "name": "FP", "size": 4}},
            {"name": "m", "type": {"type": "map", "values": "long"}},
            {"name": "arr", "type": {"type": "array", "items": ["null", "string"]}},
            {"name": "u3", "type": ["boolean", "long", "string"]},
            {"name": "next", "type": ["null", "Node"]},
        ],
    }
    rec = {
        "val": 7,
        "tag": "B",
        "fp": b"\x01\x02\x03\x04",
        "m": {"x": 1, "y": -2},
        "arr": ["a", None, "b"],
        "u3": "deep",
        "next": {
            "val": -1,
            "tag": "A",
            "fp": b"\xff\xff\xff\xff",
            "m": {},
            "arr": [],
            "u3": True,
            "next": None,
        },
    }
    names = avro_io.collect_names(schema)
    buf = bytearray()
    avro_io._encode(buf, rec, schema, names)
    interp = avro_io._decode(avro_io._Reader(bytes(buf)), schema, dict(names))
    compiled = avro_io.compile_decoder(schema, names)(avro_io._Reader(bytes(buf)))
    assert interp == compiled == rec


def test_compiled_decoder_rejects_bad_union_index():
    """The corruption contract must hold on the compiled path too: an
    out-of-range union index raises ValueError, never a negative-index
    mis-decode or bare IndexError."""
    import pytest

    schema = ["null", "long"]
    names = {}
    dec = avro_io.compile_decoder(schema, names)
    # union index 5 (zig-zag encoded 0x0A), then nothing
    with pytest.raises(ValueError, match="invalid union branch index"):
        dec(avro_io._Reader(b"\x0a"))


def test_projected_decode_equals_filtered_full_decode():
    """compile_projected_decoder: materialized fields match the full
    decoder exactly and skipped fields advance the reader correctly —
    for every codec and a nested envelope with strings/arrays/unions."""
    import tempfile

    from muninn_avro_to_parquet_spark.sources import avro_io
    from tests.conftest import CDC_SCHEMA

    recs = [
        {
            "uuid": f"u-{i:036d}",
            "read_timestamp": i * 1_000_003,
            "sort_keys": [f"k{j}" for j in range(i % 4)],
            "source_metadata": {
                "schema": "s",
                "table": "t",
                "is_deleted": i % 2 == 0,
                "change_type": "INSERT",
                "tx_id": i,
                "lsn": f"0/{i:x}",
                "primary_keys": ["id"],
            },
            "payload": {
                "id": i,
                "name": f"n{i}" * (i % 5),
                "age": i,
                "balance": (i * 10**29).to_bytes(16, "big", signed=True),
                "score": i * 0.5,
                "active": True,
                "created_at": i,
                "updated_at": i,
                "birth_date": i,
                "tags": [f"t{i}"],
                "attrs": {"a": str(i)},
            },
        }
        for i in range(50)
    ]
    for codec in ("null", "deflate", "snappy"):
        with tempfile.TemporaryDirectory() as d:
            path = f"{d}/f.avro"
            avro_io.write_file(path, CDC_SCHEMA, recs, codec=codec)
            full = [
                {k: r[k] for k in ("source_metadata", "payload")}
                for r in avro_io.iter_records(path)
            ]
            proj = list(
                avro_io.iter_records(path, project=("source_metadata", "payload"))
            )
            assert proj == full, codec


@given(schema_and_rows())
@settings(max_examples=60, deadline=None, suppress_health_check=[HealthCheck.data_too_large])
def test_source_codegen_decoder_matches_interpreter(sr):
    """The generated-source decoder (compile_source_decoder, the hot path
    behind compile_decoder_fast) must agree byte-for-byte with the
    interpreter closures on every random schema — and must COMPILE for
    every schema the generator can draw (no silent fallback shrinking
    coverage)."""
    schema, rows = sr
    names = avro_io.collect_names(schema)
    buf = bytearray()
    for r in rows:
        avro_io._encode(buf, r, schema, names)
    data = bytes(buf)
    src_dec = avro_io.compile_source_decoder(schema, names)  # must not raise
    interp_dec = avro_io.compile_decoder(schema, names)
    ra, rb = avro_io._Reader(data), avro_io._Reader(data)
    for _ in rows:
        assert src_dec(ra) == interp_dec(rb)
        assert ra.pos == rb.pos  # consumed exactly the same bytes
    assert ra.at_end()


def test_source_codegen_recursive_and_projection():
    """Named-type recursion and top-level projection through the generated
    decoder: same values and reader advance as the interpreter."""
    schema = {
        "type": "record",
        "name": "Node",
        "fields": [
            {"name": "val", "type": "int"},
            {"name": "tag", "type": {"type": "enum", "name": "Tag", "symbols": ["A", "B"]}},
            {"name": "fp", "type": {"type": "fixed", "name": "FP", "size": 4}},
            {"name": "m", "type": {"type": "map", "values": "long"}},
            {"name": "arr", "type": {"type": "array", "items": ["null", "string"]}},
            {"name": "u3", "type": ["boolean", "long", "string"]},
            {"name": "next", "type": ["null", "Node"]},
        ],
    }
    rec = {
        "val": 7, "tag": "B", "fp": b"\x01\x02\x03\x04",
        "m": {"x": 1, "y": -2}, "arr": ["a", None, "b"], "u3": "deep",
        "next": {"val": -1, "tag": "A", "fp": b"\xff\xff\xff\xff",
                 "m": {}, "arr": [], "u3": True, "next": None},
    }
    names = avro_io.collect_names(schema)
    buf = bytearray()
    avro_io._encode(buf, rec, schema, names)
    data = bytes(buf)
    assert avro_io.compile_source_decoder(schema, names)(avro_io._Reader(data)) == rec
    # projection: keep val+next, skip enum/fixed/map/array/union
    keep = {"val", "next"}
    src = avro_io.compile_source_decoder(schema, names, keep)(avro_io._Reader(data))
    interp = avro_io.compile_projected_decoder(schema, names, keep)(avro_io._Reader(data))
    assert src == interp == {"val": 7, "next": rec["next"]}


def test_source_codegen_rejects_bad_union_index():
    import pytest

    dec = avro_io.compile_source_decoder(["null", "long"], {})
    with pytest.raises(ValueError, match="invalid union branch index"):
        dec(avro_io._Reader(b"\x0a"))
    with pytest.raises(EOFError):
        dec(avro_io._Reader(b""))  # truncated varint -> EOFError, not IndexError


@given(cdc_payload_schema_and_rows())
@settings(max_examples=40, deadline=None, suppress_health_check=[HealthCheck.data_too_large])
def test_fused_transport_decoder_matches_interpreted(tmp_path_factory, sr):
    """The fused decode→transport codegen (compile_transport_decoder) must
    produce byte-identical RecordBatches to the interpreted per-record
    path (projected decode + coerce_source_metadata + _transport_value)
    for random CDC schemas, in BOTH typed and all-string modes."""
    import os
    from unittest import mock

    from muninn_avro_to_parquet_spark import schema as S
    from muninn_avro_to_parquet_spark.sources import avro_source

    schema, rows = sr
    path = str(tmp_path_factory.mktemp("fused") / "t.avro")
    avro_io.write_file(path, schema, rows)
    plans = S.derive_field_plans(schema)
    split = [(path, 0, os.path.getsize(path))]
    for all_string in (False, True):
        fused = [
            b.to_pylist()
            for b in avro_source._batches_for_splits(split, plans, all_string)
        ]
        with mock.patch.object(
            avro_source, "compile_transport_decoder",
            side_effect=ValueError("forced fallback"),
        ):
            interp = [
                b.to_pylist()
                for b in avro_source._batches_for_splits(split, plans, all_string)
            ]
        assert fused == interp, all_string


@pytest.mark.parametrize("codec", ["bzip2", "xz"])
def test_avro_stdlib_codec_roundtrip(tmp_path_factory, codec):
    """The Avro spec's optional bzip2/xz block codecs round-trip through
    the stdlib-backed registry (and the codec name survives in the
    header so any spec-compliant reader accepts the file)."""
    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "s", "type": ["null", "string"]},
        ],
    }
    rows = [{"id": i, "s": None if i % 3 == 0 else f"v{i}" * 20} for i in range(500)]
    path = str(tmp_path_factory.mktemp("avro") / f"t_{codec}.avro")
    avro_io.write_file(path, schema, rows, codec=codec, block_size=128)
    got_schema, got_rows = avro_io.read_file(path)
    assert got_schema == schema
    assert got_rows == rows
    # compression actually happened (repetitive payload must shrink)
    import os as _os

    raw = sum(len((r["s"] or "")) + 8 for r in rows)
    assert _os.path.getsize(path) < raw


def test_avro_unknown_codec_rejected(tmp_path_factory):
    with pytest.raises(ValueError, match="unsupported Avro codec"):
        avro_io.write_file(
            str(tmp_path_factory.mktemp("avro") / "x.avro"),
            {"type": "record", "name": "r", "fields": [{"name": "id", "type": "long"}]},
            [{"id": 1}],
            codec="lz4",
        )


@st.composite
def spark_schema_and_rows(draw):
    """Random Spark schemas + matching rows for the Avro sink round-trip."""
    import datetime
    import decimal

    from pyspark.sql import types as T

    scalar_pool = [
        (T.LongType(), st.integers(-(2**53), 2**53)),
        (T.IntegerType(), st.integers(-(2**31), 2**31 - 1)),
        (T.DoubleType(), st.floats(allow_nan=False, allow_infinity=False, width=64)),
        (T.BooleanType(), st.booleans()),
        (T.StringType(), st.text(max_size=20)),
        (T.BinaryType(), st.binary(max_size=16)),
        (
            T.TimestampType(),
            st.datetimes(
                min_value=datetime.datetime(1970, 1, 2),
                max_value=datetime.datetime(2100, 1, 1),
            ),
        ),
        (
            T.DateType(),
            st.dates(datetime.date(1970, 1, 1), datetime.date(2100, 1, 1)),
        ),
        (
            T.DecimalType(12, 3),
            st.integers(-(10**9), 10**9).map(
                lambda n: decimal.Decimal(n).scaleb(-3)
            ),
        ),
    ]
    n_cols = draw(st.integers(1, 5))
    picks = [draw(st.sampled_from(scalar_pool)) for _ in range(n_cols)]
    fields = [
        T.StructField(f"c{i}", dt, True) for i, (dt, _) in enumerate(picks)
    ]
    n_rows = draw(st.integers(1, 8))
    rows = [
        tuple(
            None if draw(st.booleans()) and draw(st.booleans()) else draw(strat)
            for _, strat in picks
        )
        for _ in range(n_rows)
    ]
    return T.StructType(fields), rows


@given(spark_schema_and_rows())
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.data_too_large])
def test_avro_sink_generic_roundtrip_property(spark, tmp_path_factory, sr):
    """Invariant: ANY scalar-typed DataFrame survives
    write_avro → read_avro_generic with identical values (nulls included)."""
    from muninn_avro_to_parquet_spark.sources import avro_sink, avro_source

    schema, rows = sr
    df = spark.createDataFrame(rows, schema)
    out = str(tmp_path_factory.mktemp("sinkprop") / "out")
    manifest = avro_sink.write_avro(df, out, codec="deflate")
    assert sum(n for _, n in manifest) == len(rows)
    back = avro_source.read_avro_generic(spark, [p for p, _ in manifest])
    got = sorted(
        (tuple(r[f.name] for f in schema.fields) for r in back.collect()),
        key=repr,
    )
    want = sorted(rows, key=repr)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        for gv, wv in zip(g, w):
            if isinstance(wv, float) and wv is not None and gv is not None:
                assert gv == wv or math.isclose(gv, wv, rel_tol=1e-12), (gv, wv)
            else:
                assert gv == wv, (gv, wv)


# ---------------------------------------------------------------------------
# image resize kernel (operators/multimodal.py) — pure-function properties
# ---------------------------------------------------------------------------


_pixel = st.tuples(
    st.integers(0, 255), st.integers(0, 255), st.integers(0, 255)
)


@given(
    w=st.integers(1, 12),
    h=st.integers(1, 12),
    box=st.tuples(st.integers(1, 8), st.integers(1, 8)),
    data=st.data(),
)
@settings(max_examples=150, deadline=None)
def test_resize_kernel_properties(w, h, box, data):
    """For any image and any fit box: output dims respect the box and
    never upscale, every output pixel is an exact source pixel (nearest
    neighbor never invents colors), and the canonical P6 re-encoding
    round-trips through the independent PPM decoder."""
    from muninn_avro_to_parquet_spark.operators.multimodal import (
        _decode_ppm_pixels,
        _encode_ppm,
        _resize_nn,
        fit_within,
    )

    pixels = data.draw(
        st.lists(_pixel, min_size=w * h, max_size=w * h), label="pixels"
    )
    max_w, max_h = box
    ow, oh = fit_within(w, h, max_w, max_h)
    assert ow >= 1 and oh >= 1  # dims bounded below by 1
    assert ow <= max(max_w, w) and oh <= max(max_h, h)
    if w <= max_w and h <= max_h:
        assert (ow, oh) == (w, h)  # no upscale
    else:
        assert ow <= max_w and oh <= max_h
    out = _resize_nn(w, h, pixels, ow, oh)
    assert len(out) == ow * oh
    src = set(pixels)
    assert all(px in src for px in out)
    # corners map to corners under floor mapping: top-left always survives
    assert out[0] == pixels[0]
    rt_w, rt_h, rt_px = _decode_ppm_pixels(_encode_ppm(ow, oh, out))
    assert (rt_w, rt_h, rt_px) == (ow, oh, out)
