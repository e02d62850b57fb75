"""Distributed CDC-Avro source: file paths → raw-transport DataFrame.

The unit of parallelism is one byte split per task: files below
SPLIT_BYTES map to one split (the reference's one-file-per-worker model,
/root/reference/main.py:485-578), larger files fan out over Hadoop-style
sync-marker ranges (``plan_splits``) so a single 10 GB CDC dump does not
serialize on one core. Decoding streams block-by-block into bounded Arrow
batches instead of materializing the whole file as a Python list
(main.py:519 — the reference's OOM hazard). At cluster scale the split
list is a DataFrame, so 100k files fan out across all executors.

Value semantics: per-value lenient coercion per SURVEY §1.4 happens here
(transport build) and in ``casts.select_typed`` (typed cast layer). The
reference's coarser file-granularity all-string fallback (main.py:524-567)
is available as ``read_avro_allstring`` — the engine's per-value coercion
strictly dominates it (one bad value nulls one cell, not 10^6 rows × all
columns to string), so it is the default.
"""

from __future__ import annotations

from typing import Any, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from muninn_avro_to_parquet_spark import schema as S
from muninn_avro_to_parquet_spark.functions import scalars
from muninn_avro_to_parquet_spark.sources import avro_io

BATCH_ROWS = 4096
SOURCE_FILE_COL = "_source_file"
# per-row provenance column requested from the JVM DSv2 avro source
# (option muninn.pathColumn); input_file_name() is empty for DSv2 scans
JVM_PATH_COL = "_jvm_source_file"


def canon_source_path(p: str) -> str:
    """Canonical ``_source_file`` value: local-file URIs reduce to the
    plain filesystem path (percent-decoded), so the Python codec and the
    JVM scan — whose ``input_file_name()`` returns a percent-encoded
    ``file:`` URI — emit byte-identical values for the same input.
    Object-store URIs (s3://, gs://, …) pass through untouched."""
    import re as _re
    from urllib.parse import unquote

    if p.startswith("file:"):
        return unquote(_re.sub(r"^file:/+", "/", p))
    return p


def canon_source_col(col):
    """Column twin of :func:`canon_source_path` for the JVM ingest path.

    ``url_decode`` treats ``+`` as space (form encoding), so literal plus
    signs are pre-escaped to ``%2B`` before decoding."""
    decoded = F.url_decode(
        F.regexp_replace(F.regexp_replace(col, r"\+", "%2B"), "^file:/+", "/")
    )
    return F.when(col.startswith("file:"), decoded).otherwise(col)


def _transport_value(value: Any, plan: S.FieldPlan) -> Any:
    """Coerce one decoded Avro value to its transport representation."""
    source = plan.source
    if value is None:
        return None
    if source == S.RAW:
        return value
    if source in (S.TS_MILLIS, S.TS_MICROS, S.EPOCH_DAYS):
        return scalars.to_int(value)
    if source == S.BYTES_DECIMAL:
        if isinstance(value, (bytes, bytearray)):
            return bytes(value)
        # numeric value in a decimal-typed column: encode at the assumed
        # scale so the Spark-side decoder yields the same Decimal
        d = scalars.numeric_to_decimal(value)
        if d is None:
            return None
        unscaled = int(d.scaleb(scalars.ASSUMED_BYTES_SCALE))
        nbytes = max(1, (unscaled.bit_length() + 8) // 8)
        return unscaled.to_bytes(nbytes, byteorder="big", signed=True)
    if source == S.NUMERIC_DECIMAL:
        return str(value)
    if source == S.STRINGIFY:
        return scalars.stringify_any(value)
    if source == S.STRUCT_CAST:
        if not isinstance(value, dict):
            return None
        return {c.name: _transport_value(value.get(c.name), c) for c in plan.children}
    raise ValueError(source)


# a file larger than this is split on Avro sync-marker boundaries so its
# decode fans out across tasks instead of serializing on one core
SPLIT_BYTES = 64 * 1024 * 1024
# never split finer than this: each split pays a header read + sync seek,
# and sub-4MB ranges would be dominated by that fixed cost
MIN_SPLIT_BYTES = 4 * 1024 * 1024


def plan_splits(
    paths: list[str],
    split_bytes: int = SPLIT_BYTES,
    target_tasks: int | None = None,
) -> list[tuple[str, int, int]]:
    """(path, start, end) byte splits — one per file below the threshold,
    several Hadoop-style ranges above it. Pure driver-side arithmetic on
    file sizes (a stat per file — works on object-store URIs through the
    fs seam); executors seek to the first sync inside their range.

    ``target_tasks`` shrinks the split size (never below MIN_SPLIT_BYTES)
    when the default would yield fewer splits than the cluster has
    execution slots — a lone 1 GiB file then fans out across every core
    instead of leaving the cluster half idle. At real fleet scale the file
    count dwarfs the core count and the default stays in effect."""
    from muninn_avro_to_parquet_spark import fs

    sizes = [(p, fs.file_size(p)) for p in paths]
    if target_tasks:
        total = sum(s for _, s in sizes)
        if total > 0 and -(-total // split_bytes) < target_tasks:
            split_bytes = max(MIN_SPLIT_BYTES, -(-total // target_tasks))
    out = []
    for p, size in sizes:
        if size <= split_bytes:
            out.append((p, 0, size))
            continue
        n = -(-size // split_bytes)
        step = -(-size // n)
        for i in range(n):
            out.append((p, i * step, min((i + 1) * step, size)))
    return out


_ENVELOPE_STR_KEYS = ("schema", "table", "change_type", "lsn")


class _TransportGen(avro_io._SourceGen):
    """Codegen for the FUSED decode→transport path: one generated function
    per (writer schema, plan list) that decodes ``n`` records from a block
    reader and appends transport-ready values straight into per-column
    lists — no intermediate record dicts, no per-plan dispatch loop, and
    the source_metadata envelope coercion inlined with identity fast paths
    chosen at generation time from the writer's field types. Equivalence
    with the interpreted path (_transport_value + coerce_source_metadata)
    is property-tested; any shape this generator declines raises at
    GENERATION time and the caller falls back."""

    @staticmethod
    def _unwrap(node):
        while isinstance(node, dict) and isinstance(node.get("type"), (dict, list)):
            node = node["type"]
        return node

    def _resolve_record(self, node):
        node = self._unwrap(node)
        if isinstance(node, str) and node in self.names:
            node = self.names[node]
        if isinstance(node, dict) and node.get("type") in ("record", "error"):
            return node
        return None

    # -- payload columns -----------------------------------------------------

    def emit_transport_field(self, ind: int, node, plan: S.FieldPlan, t: str) -> None:
        if self.all_string or plan.source == S.STRINGIFY:
            tv = self.tmp()
            self.emit_decode(ind, node, tv)
            self.w(ind, f"{t} = _stringify({tv})")  # None -> None inside
            return
        src = plan.source
        if src in (S.RAW, S.TS_MILLIS, S.TS_MICROS, S.EPOCH_DAYS, S.BYTES_DECIMAL):
            # Python-decoded values are already the transport encoding:
            # TS/EPOCH plans only arise on long/int bases (ints), bytes
            # decimals on bytes/fixed bases (bytes) — to_int/bytes() in
            # _transport_value are identities there
            self.emit_decode(ind, node, t)
            return
        if src == S.NUMERIC_DECIMAL:
            tv = self.tmp()
            self.emit_decode(ind, node, tv)
            self.w(ind, f"{t} = None if {tv} is None else str({tv})")
            return
        if src == S.STRUCT_CAST:
            rec = self._resolve_record(node)
            if rec is None or [f["name"] for f in rec["fields"]] != [
                c.name for c in plan.children
            ]:
                raise ValueError("struct plan does not match writer record")
            pairs = []
            for f, child in zip(rec["fields"], plan.children):
                ft = self.tmp()
                self.emit_transport_field(ind, f["type"], child, ft)
                pairs.append((child.name, ft))
            body = ", ".join(f"{name!r}: {ft}" for name, ft in pairs)
            self.w(ind, f"{t} = {{{body}}}")
            return
        raise ValueError(f"unsupported transport source {src!r}")

    # -- source_metadata envelope ---------------------------------------------

    def emit_sm(self, ind: int, node, t: str) -> None:
        node = self._unwrap(node)
        if isinstance(node, list):
            if len(node) == 2 and node[0] == "null":
                idx = self.tmp()
                self.varint(ind, idx)
                self.w(ind, f"if {idx} == 0:")
                self.w(ind + 1, f"{t} = _coerce_sm(None)")
                self.w(ind, f"elif {idx} == 1:")
                self.emit_sm(ind + 1, node[1], t)
                self.w(ind, "else:")
                self.w(
                    ind + 1,
                    "raise ValueError('invalid union branch index %d (union "
                    f"has 2 branches)' % {idx})",
                )
                return
            raise ValueError("unsupported source_metadata union shape")
        rec = self._resolve_record(node)
        if rec is None:
            tv = self.tmp()
            self.emit_decode(ind, node, tv)
            self.w(ind, f"{t} = _coerce_sm({tv})")
            return
        got: dict[str, str] = {}
        for f in rec["fields"]:
            name = f["name"]
            if name in _ENVELOPE_STR_KEYS or name in (
                "is_deleted", "tx_id", "primary_keys",
            ):
                ft = self.tmp()
                self.emit_decode(ind, f["type"], ft)
                got[name] = self._sm_coerce_expr(name, f["type"], ft)
            else:
                self.emit_skip(ind, f["type"])
        body = ", ".join(
            f"{k!r}: {got.get(k, 'None')}"
            for k in (*_ENVELOPE_STR_KEYS[:2], "is_deleted",
                      _ENVELOPE_STR_KEYS[2], "tx_id", _ENVELOPE_STR_KEYS[3],
                      "primary_keys")
        )
        self.w(ind, f"{t} = {{{body}}}")

    def _sm_coerce_expr(self, key: str, ftype, tv: str) -> str:
        """Identity when the writer type already yields the coerced shape;
        the shared scalar coercer otherwise."""
        base = self._unwrap(ftype)
        if isinstance(base, list) and len(base) == 2 and base[0] == "null":
            base = self._unwrap(base[1])
        if key in _ENVELOPE_STR_KEYS:
            return tv if base == "string" else f"(None if {tv} is None else str({tv}))"
        if key == "is_deleted":
            return tv if base == "boolean" else f"_to_bool({tv})"
        if key == "tx_id":
            return tv if base in ("long", "int") else f"_to_int({tv})"
        # primary_keys
        if (
            isinstance(base, dict)
            and base.get("type") == "array"
            and base.get("items") == "string"
        ):
            return tv
        return f"_to_list_of_str({tv})"


def compile_transport_decoder(
    schema, plans: list[S.FieldPlan], all_string: bool
):
    """Writer schema + plan list → generated
    ``fn(reader, n, meta_append, appends)`` appending ``n`` records'
    transport values column-wise (see ``_TransportGen``). Raises at
    generation time when the shape isn't fusable — callers fall back to
    the per-record interpreted loop."""
    if not (isinstance(schema, dict) and schema.get("type") in ("record", "error")):
        raise ValueError("top level is not a record")
    names = avro_io.collect_names(schema)
    g = _TransportGen(names)
    g.all_string = all_string
    field_names = [f["name"] for f in schema.get("fields", [])]
    g.w(0, "def _tentry(r, n, meta_append, appends):")
    g.w(1, "buf = r.buf; blen = len(buf); pos = r.pos")
    if plans:
        unpack = ", ".join(f"a{i}" for i in range(len(plans)))
        g.w(1, f"{unpack}, = appends" if len(plans) == 1 else f"{unpack} = appends")
    g.w(1, "try:")
    g.w(2, "for _ in range(n):")
    emitted_sm = False
    emitted_payload = False
    for f in schema.get("fields", []):
        if f["name"] == "source_metadata":
            sm = g.tmp()
            g.emit_sm(3, f["type"], sm)
            g.w(3, f"meta_append({sm})")
            emitted_sm = True
        elif f["name"] == "payload":
            node = g._unwrap(f["type"])
            if isinstance(node, list) and len(node) == 2 and node[0] == "null":
                idx = g.tmp()
                g.varint(3, idx)
                g.w(3, f"if {idx} == 0:")
                for i in range(len(plans)):
                    g.w(4, f"a{i}(None)")
                if not plans:
                    g.w(4, "pass")
                g.w(3, f"elif {idx} == 1:")
                g._emit_payload_record(4, node[1], plans)
                g.w(3, "else:")
                g.w(
                    4,
                    "raise ValueError('invalid union branch index %d (union "
                    f"has 2 branches)' % {idx})",
                )
            else:
                g._emit_payload_record(3, node, plans)
            emitted_payload = True
        else:
            g.emit_skip(3, f["type"])
    if not emitted_sm:
        g.w(3, "meta_append(_coerce_sm(None))")
    if not emitted_payload:
        for i in range(len(plans)):
            g.w(3, f"a{i}(None)")
    if not field_names:
        g.w(3, "pass")
    g.w(1, "except IndexError:")
    g.w(2, "raise EOFError('truncated Avro data') from None")
    g.w(1, "except _struct_error:")
    g.w(2, "raise EOFError('truncated Avro data') from None")
    g.w(1, "r.pos = pos")
    import struct as _struct

    src = "\n".join(g.fn_blocks + ["", "\n".join(g.lines)])
    ns = {
        "_F32U": avro_io._F32.unpack_from,
        "_F64U": avro_io._F64.unpack_from,
        "_struct_error": _struct.error,
        "_stringify": scalars.stringify_any,
        "_coerce_sm": scalars.coerce_source_metadata,
        "_to_bool": scalars.to_bool,
        "_to_int": scalars.to_int,
        "_to_list_of_str": scalars.to_list_of_str,
        **g.consts,
    }
    exec(compile(src, "<avro-transport-codegen>", "exec"), ns)  # noqa: S102
    fn = ns["_tentry"]
    fn.__avro_codegen_source__ = src
    return fn


def _emit_payload_record(self, ind, node, plans):
    rec = self._resolve_record(node)
    if rec is None or [f["name"] for f in rec["fields"]] != [p.name for p in plans]:
        raise ValueError("payload record does not match plan list")
    for i, (f, plan) in enumerate(zip(rec["fields"], plans)):
        ft = self.tmp()
        self.emit_transport_field(ind, f["type"], plan, ft)
        self.w(ind, f"a{i}({ft})")


_TransportGen._emit_payload_record = _emit_payload_record


def _batches_for_splits(
    splits: list[tuple[str, int, int]],
    plans: list[S.FieldPlan],
    all_string: bool,
    arrow_schema=None,
):
    """Decode byte splits into bounded ``pyarrow.RecordBatch``es.

    Arrow arrays are built DIRECTLY from the decoded column lists
    (``pa.array`` is a single C++ pass), skipping the object-dtype pandas
    detour mapInPandas would re-convert anyway. The decode itself runs
    through the FUSED transport codegen when the writer schema matches
    the plan list (``compile_transport_decoder`` — no intermediate record
    dicts, no per-plan dispatch); otherwise the per-record interpreted
    loop. Batches are capped at BATCH_ROWS rows either way, so one task
    never materializes its split."""
    import pyarrow as pa

    if arrow_schema is None:
        arrow_schema = _transport_arrow_schema(plans, all_string)
    names = [p.name for p in plans]
    types = {f.name: f.type for f in arrow_schema}
    for path, start, end in splits:
        canon_path = canon_source_path(path)
        meta_buf: list[dict] = []
        cols: dict[str, list] = {n: [] for n in names}
        n_buf = 0

        def flush(n_rows: int):
            arrays = [pa.array(meta_buf, type=types["source_metadata"])]
            for n in names:
                arrays.append(pa.array(cols[n], type=types[n]))
            arrays.append(
                pa.array([canon_path] * n_rows, type=types[SOURCE_FILE_COL])
            )
            return pa.RecordBatch.from_arrays(arrays, schema=arrow_schema)

        with avro_io.SplitBlockReader(path, start, end) as sbr:
            try:
                tdec = compile_transport_decoder(sbr.schema, plans, all_string)
            except Exception:
                tdec = None
            if tdec is not None:
                appends = tuple(cols[n].append for n in names)
                meta_append = meta_buf.append
                for br, count in sbr.blocks():
                    while count:
                        take = min(count, BATCH_ROWS - n_buf)
                        tdec(br, take, meta_append, appends)
                        n_buf += take
                        count -= take
                        if n_buf >= BATCH_ROWS:
                            yield flush(n_buf)
                            meta_buf, n_buf = [], 0
                            cols = {n: [] for n in names}
                            appends = tuple(cols[n].append for n in names)
                            meta_append = meta_buf.append
            else:
                # interpreted fallback: decoder-level projection (the
                # reference drops uuid/read_timestamp/sort_keys,
                # main.py:61) then per-plan transport dispatch
                nm = avro_io.collect_names(sbr.schema)
                decode = avro_io.compile_projected_decoder_fast(
                    sbr.schema, nm, {"source_metadata", "payload"}
                )
                for br, count in sbr.blocks():
                    for _ in range(count):
                        rec = decode(br)
                        meta_buf.append(
                            scalars.coerce_source_metadata(rec.get("source_metadata"))
                        )
                        payload = rec.get("payload") or {}
                        if not isinstance(payload, dict):
                            payload = {}
                        for plan in plans:
                            v = payload.get(plan.name)
                            if all_string:
                                cols[plan.name].append(scalars.stringify_any(v))
                            else:
                                cols[plan.name].append(_transport_value(v, plan))
                        n_buf += 1
                        if n_buf >= BATCH_ROWS:
                            yield flush(n_buf)
                            meta_buf, n_buf = [], 0
                            cols = {n: [] for n in names}
        if n_buf:
            yield flush(n_buf)


def _with_source_file(schema):
    from pyspark.sql import types as T

    return T.StructType(list(schema.fields) + [T.StructField(SOURCE_FILE_COL, T.StringType(), False)])


def _transport_arrow_schema(plans: list[S.FieldPlan], all_string: bool):
    """Arrow schema the decode tasks emit (mirrors the Spark transport
    StructType + _source_file)."""
    from pyspark.sql import types as T
    from pyspark.sql.pandas.types import to_arrow_schema

    if all_string:
        sch = T.StructType(
            [T.StructField("source_metadata", S.SOURCE_METADATA_TYPE, True)]
            + [T.StructField(p.name, T.StringType(), True) for p in plans]
        )
    else:
        sch = S.raw_transport_schema_from_plans(plans)
    return to_arrow_schema(_with_source_file(sch))


def _distributed_decode(
    spark: SparkSession,
    paths: list[str],
    plans: list[S.FieldPlan],
    out_schema,
    all_string: bool,
) -> DataFrame:
    """Shared scaffolding for both decode modes: path list → sync-marker
    splits (big files fan out across tasks; ``target_tasks`` shrinks the
    split size so even ONE large file saturates every execution slot) →
    round-robin distribution (~2 split rows per core so stragglers
    rebalance) → block-streamed decode in mapInArrow (Arrow batches built
    directly from the decoded columns — no pandas detour)."""
    from pyspark.sql.pandas.types import to_arrow_schema

    from muninn_avro_to_parquet_spark import fs

    aschema = to_arrow_schema(out_schema)
    # driver-registered filesystems (emulator endpoints, custom clients)
    # ride the task closure so executor-side split decode resolves the
    # same URIs the driver listed — see fs.registry_snapshot
    fs_snapshot = fs.registry_snapshot()

    def gen(batches):
        fs.ensure_registry(fs_snapshot)
        for rb in batches:
            splits = list(
                zip(
                    rb.column("path").to_pylist(),
                    rb.column("start").to_pylist(),
                    rb.column("end").to_pylist(),
                )
            )
            yield from _batches_for_splits(
                splits, plans, all_string=all_string, arrow_schema=aschema
            )

    target = spark.sparkContext.defaultParallelism * 2
    splits = plan_splits(paths, target_tasks=target)
    splits_df = spark.createDataFrame(splits, "path string, start long, end long")
    n_part = min(len(splits), target) or 1
    return splits_df.repartition(n_part).mapInArrow(gen, schema=out_schema)


def read_avro_raw(
    spark: SparkSession,
    paths: list[str],
    avro_schema: dict | None = None,
    plans: list[S.FieldPlan] | None = None,
) -> tuple[DataFrame, list[S.FieldPlan]]:
    """Paths → raw-transport DataFrame (+ field plans). Schema is derived
    once on the driver from the first file's header — a header-only read,
    not the reference's full first pass (main.py:492-494). An explicit
    ``plans`` list overrides the header-derived plans (schema-drift merge:
    conflicted columns carry a STRINGIFY plan)."""
    if avro_schema is None:
        avro_schema = avro_io.read_schema(paths[0])
    if plans is None:
        plans = S.derive_field_plans(avro_schema)
    transport = _with_source_file(S.raw_transport_schema_from_plans(plans))
    return _distributed_decode(spark, paths, plans, transport, all_string=False), plans


def read_avro(
    spark: SparkSession,
    paths: list[str],
    avro_schema: dict | None = None,
    plans: list[S.FieldPlan] | None = None,
    engine: str | None = None,
) -> DataFrame:
    """Paths → fully typed flat DataFrame (envelope struct + typed payload
    columns + ``_source_file``). The cast layer is one narrow select —
    no shuffle anywhere on the conversion path.

    ``engine`` (or conf ``spark.muninn.avro.engine``): ``auto`` (default)
    uses the JVM spark-avro scan when the jar is present AND the schema is
    exactly alignable (see ``read_avro_jvm``), else the pure-Python codec;
    ``jvm`` forces the JVM path (raises when unavailable); ``python``
    forces the distributed Python codec."""
    from muninn_avro_to_parquet_spark import casts

    if engine is None:
        engine = spark.conf.get("spark.muninn.avro.engine", "auto")
    if avro_schema is None:
        avro_schema = avro_io.read_schema(paths[0])
    if plans is None:
        plans = S.derive_field_plans(avro_schema)
    if engine in ("auto", "jvm"):
        jdf = read_avro_jvm(spark, paths, plans)
        if jdf is not None:
            return jdf
        if engine == "jvm":
            raise RuntimeError(
                "spark.muninn.avro.engine=jvm but the spark-avro DataSource is "
                "not on the classpath or the schema is not JVM-alignable; add "
                "--packages org.apache.spark:spark-avro_2.13:<spark-version> "
                "or use engine='auto'/'python'"
            )
    raw, plans = read_avro_raw(spark, paths, avro_schema, plans=plans)
    return raw.select(
        *casts.select_typed_columns(plans), F.col(SOURCE_FILE_COL)
    )


def read_avro_allstring(
    spark: SparkSession, paths: list[str], avro_schema: dict | None = None
) -> DataFrame:
    """Permissive mode: envelope kept as struct, every payload column
    stringified (sorted-key compact JSON for containers) — the reference's
    fallback write shape (main.py:543-564) and its dead all-string path
    (main.py:398-452), exposed as an explicit option."""
    from pyspark.sql import types as T

    if avro_schema is None:
        avro_schema = avro_io.read_schema(paths[0])
    plans = S.derive_field_plans(avro_schema)
    out_schema = T.StructType(
        [T.StructField("source_metadata", S.SOURCE_METADATA_TYPE, True)]
        + [T.StructField(p.name, T.StringType(), True) for p in plans]
        + [T.StructField(SOURCE_FILE_COL, T.StringType(), False)]
    )
    return _distributed_decode(spark, paths, plans, out_schema, all_string=True)


class _Unalignable(Exception):
    """The JVM decoder's output for this column cannot reproduce the
    engine's reference semantics exactly — use the Python codec."""


def _same_erased_type(a, b) -> bool:
    """Type equality ignoring nullability flags: spark-avro derives
    containsNull/valueContainsNull/field nullability from the Avro unions
    (a bare ``array<string>`` decodes with containsNull=False) while the
    §1.3 mapper declares everything nullable — semantically identical
    columns that plain ``==`` would reject, bailing the JVM path for
    every container column."""
    from pyspark.sql import types as T

    if isinstance(a, T.ArrayType) and isinstance(b, T.ArrayType):
        return _same_erased_type(a.elementType, b.elementType)
    if isinstance(a, T.MapType) and isinstance(b, T.MapType):
        return _same_erased_type(a.keyType, b.keyType) and _same_erased_type(
            a.valueType, b.valueType
        )
    if isinstance(a, T.StructType) and isinstance(b, T.StructType):
        return len(a.fields) == len(b.fields) and all(
            fa.name == fb.name and _same_erased_type(fa.dataType, fb.dataType)
            for fa, fb in zip(a.fields, b.fields)
        )
    return a == b


def _align_value(col, decoded, plan: S.FieldPlan):
    """Column expr mapping spark-avro's native decode of one payload field
    to the engine's target type — or raise ``_Unalignable``.

    Alignable: identical types, epoch-long→timestamp, epoch-int→date, the
    direct-path logicalType asymmetries (decoded date/timestamp back to
    the base int/long the reference keeps, SURVEY §1.3), loss-free decimal
    widening, and record recursion. NOT alignable (reference semantics the
    JVM decoder can't reproduce): multi-branch union collapse to
    sorted-key JSON, scale-30 bytes decimals with banker's rounding, and
    any decimal cast that would round."""
    from pyspark.sql import types as T

    target = plan.dtype
    if plan.source == S.STRUCT_CAST:
        if not isinstance(decoded, T.StructType):
            raise _Unalignable()
        by_name = {f.name: f.dataType for f in decoded.fields}
        members = []
        for c in plan.children:
            if c.name in by_name:
                members.append(_align_value(col[c.name], by_name[c.name], c).alias(c.name))
            else:
                members.append(F.lit(None).cast(c.dtype).alias(c.name))
        return F.when(col.isNull(), F.lit(None).cast(target)).otherwise(F.struct(*members))
    if plan.source in (S.RAW, S.TS_MILLIS, S.TS_MICROS, S.EPOCH_DAYS) and (
        _same_erased_type(decoded, target)
    ):
        # nullability flags may differ (spark-avro's are union-exact, the
        # mapper's are all-nullable) — values are identical either way, and
        # Spark refuses casts TOWARD non-null, so pass the column through
        return col
    if plan.source == S.TS_MILLIS and isinstance(decoded, T.LongType):
        return F.timestamp_millis(col)
    if plan.source == S.TS_MICROS and isinstance(decoded, T.LongType):
        return F.timestamp_micros(col)
    if plan.source == S.EPOCH_DAYS and isinstance(decoded, T.IntegerType):
        return F.date_from_unix_date(col)
    # direct-path logicalType asymmetry (reference keeps the base type):
    # JVM decoded a date/timestamp the target says stays int/long
    if isinstance(target, T.IntegerType) and isinstance(decoded, T.DateType):
        return F.unix_date(col)
    if isinstance(target, T.LongType) and isinstance(decoded, T.TimestampType):
        return F.unix_micros(col)
    if (
        plan.source == S.BYTES_DECIMAL
        and isinstance(target, T.DecimalType)
        and isinstance(decoded, T.BinaryType)
    ):
        # the engine's DSv2 source honored muninn.decimalAsBinary: the
        # column carries the raw big-endian two's-complement unscaled
        # bytes, and the SAME Arrow-batched coercion the SQL surface
        # registers (assumed scale 30, quantize to 9 HALF_EVEN) runs on
        # just this column; ArrowEvalPython ships only the bytes to the
        # worker, the rest of the row never leaves the JVM. A pure
        # Catalyst limb-division variant exists
        # (casts.bytes_decimal_expr) and was RACED in r9: 59.8 s vs
        # 7.9 s for the UDF on the 1 GiB fixture — per-row BigDecimal +
        # regex loses to the Arrow hop, so the UDF stays
        from muninn_avro_to_parquet_spark.functions.register import (
            cdc_bytes_decimal,
        )

        return cdc_bytes_decimal(col)
    if isinstance(target, T.DecimalType) and isinstance(decoded, T.DecimalType):
        # NEVER alignable (parity-matrix finding, r5): the reference
        # reinterprets a bytes decimal's unscaled int at ASSUMED scale 30
        # regardless of the writer's declared scale, then quantizes to 9
        # HALF_EVEN — upstream spark-avro honors the DECLARED scale, so a
        # (10,2) column decodes 25 → 0.25 where the reference mandates
        # 25·10⁻³⁰. The two engines agree only when declared scale == 30,
        # which then needs the HALF_EVEN quantize Spark's cast (HALF_UP)
        # can't do. (With the engine's own source this branch is dormant —
        # decimalAsBinary delivers BinaryType, handled above.)
        raise _Unalignable()
    if plan.source == S.STRINGIFY:
        if isinstance(decoded, T.StringType):
            return col  # str() of a string is the identity
        expr = _stringify_catalyst(col, decoded)
        if expr is not None:
            return expr
    raise _Unalignable()


def _stringify_catalyst(col, decoded):
    """JVM-side equivalent of ``scalars.stringify_any`` for the container
    shapes where Jackson and json.dumps agree byte-for-byte — compact
    separators, sorted map keys (UTF-8 byte order == code-point order ==
    Python's), nulls kept. Returns None when the element type has no
    exact JVM rendering (caller falls back to the Python codec).

    Safe leaves: strings (same \\", \\\\, \\uXXXX control escapes, raw
    UTF-8 beyond ASCII under ensure_ascii=False), integers, booleans.
    Floats/decimals/bytes stay unalignable — their Python reprs
    (shortest-round-trip floats, str(Decimal), utf-8-replace bytes) have
    no Catalyst equivalent."""
    from pyspark.sql import types as T

    safe_leaf = (T.StringType, T.BooleanType, T.IntegerType, T.LongType)
    if isinstance(decoded, T.ArrayType) and isinstance(
        decoded.elementType, safe_leaf
    ):
        return F.to_json(col, {"ignoreNullFields": "false"})
    if (
        isinstance(decoded, T.MapType)
        and isinstance(decoded.keyType, T.StringType)
        and isinstance(decoded.valueType, safe_leaf)
    ):
        entries = F.array_sort(F.map_entries(col))
        return F.to_json(F.map_from_entries(entries), {"ignoreNullFields": "false"})
    return None


def _align_envelope(decoded) -> F.Column:
    """source_metadata struct → the fixed envelope type, reproducing the
    reference's per-field coercions where they're loss-free (str casts,
    scalar→list lift); anything needing the tolerant bool/int parsers
    falls back to the Python codec."""
    from pyspark.sql import types as T

    if not isinstance(decoded, T.StructType):
        raise _Unalignable()
    by_name = {f.name: f.dataType for f in decoded.fields}
    col = F.col("source_metadata")

    def member(name: str, target: T.DataType):
        if name not in by_name:
            return F.lit(None).cast(target).alias(name)
        got, c = by_name[name], col[name]
        # erased compare: the real JVM decode carries union-exact
        # nullability (primary_keys decodes array<string> with
        # containsNull=false), the envelope type is all-nullable
        if _same_erased_type(got, target):
            return c.alias(name)
        if isinstance(target, T.StringType) and isinstance(
            got, (T.IntegerType, T.LongType, T.BooleanType, T.DoubleType)
        ):
            return c.cast("string").alias(name)  # reference str()s these
        if isinstance(target, T.LongType) and isinstance(got, T.IntegerType):
            return c.cast("long").alias(name)
        if isinstance(target, T.ArrayType) and _same_erased_type(
            got, target.elementType
        ):
            return F.array(c).alias(name)  # _to_list_of_str scalar lift
        raise _Unalignable()

    members = [
        member(f.name, f.dataType) for f in S.SOURCE_METADATA_TYPE.fields
    ]
    return F.when(
        col.isNull(), F.lit(None).cast(S.SOURCE_METADATA_TYPE)
    ).otherwise(F.struct(*members)).alias("source_metadata")


def read_avro_jvm(
    spark: SparkSession, paths: list[str], plans: list[S.FieldPlan]
) -> DataFrame | None:
    """JVM spark-avro ingest: vectorized scan + one aligned select, same
    output contract as ``read_avro``. Returns None when the connector jar
    is absent or the schema needs reference semantics only the Python
    codec reproduces (union collapse, scale-30 bytes decimals) — the
    caller falls back transparently.

    At 100 TB this is the production path: the whole decode happens in
    whole-stage codegen with no Python worker in the loop; the Python
    codec remains the semantic reference and offline fallback. The one
    exception is bytes-decimal columns (the reference's core CDC shape,
    main.py:172-191): their assumed-scale-30 + HALF_EVEN semantics are
    not expressible as a Catalyst cast, so the scan delivers the raw
    unscaled bytes (``muninn.decimalAsBinary``) and the engine's
    Arrow-batched ``cdc_bytes_decimal`` runs on top — only those columns
    pay the Python hop, the rest of the row stays JVM-side."""
    from pyspark.sql import types as T

    df = try_native_avro(spark, paths, decimal_as_binary=True)
    if df is None:
        return None
    by_name = {f.name: f.dataType for f in df.schema.fields}
    if "payload" not in by_name or not isinstance(by_name["payload"], T.StructType):
        return None
    payload_types = {f.name: f.dataType for f in by_name["payload"].fields}
    try:
        cols = [_align_envelope(by_name.get("source_metadata"))]
        for p in plans:
            if p.name in payload_types:
                cols.append(
                    _align_value(
                        F.col("payload")[p.name], payload_types[p.name], p
                    ).alias(p.name)
                )
            else:
                cols.append(F.lit(None).cast(p.dtype).alias(p.name))
    except _Unalignable:
        return None
    # normalized to match the Python codec's _source_file byte-for-byte.
    # Two provenance forms: the engine's own DSv2 source emits an explicit
    # path column (a DSv2 scan is invisible to input_file_name(), which
    # returns '' for it); upstream spark-avro is a V1 FileFormat, where
    # input_file_name() yields a percent-encoded file: URI. Both canon to
    # the plain path.
    if JVM_PATH_COL in df.columns:
        src = canon_source_col(F.col(JVM_PATH_COL))
        return df.select(*cols, src.alias(SOURCE_FILE_COL))
    return df.select(
        *cols, canon_source_col(F.input_file_name()).alias(SOURCE_FILE_COL)
    )


def try_native_avro(
    spark: SparkSession, pattern: str, decimal_as_binary: bool = False
) -> DataFrame | None:
    """Use the spark-avro connector when its jar is on the classpath;
    callers fall back to the pure-Python distributed reader.

    Measured status in this image (no network, jar absent): the runtime
    ships avro-1.12.1 core/ipc/mapred jars but NOT the
    ``spark-avro_2.13`` DataSource module, so ``format("avro")`` raises
    ``Failed to find data source: avro`` and this returns None. The
    Status (round 8): the image still has no network (curl to Maven
    fails; see ``jvm/BUILD.md``), so the engine now ships its OWN JVM
    DataSource — a ~600-line Java DSv2 implementation registered under
    the same ``avro`` short name (``jvm/src/muninnavro/``, compiled
    against the local Spark + Avro 1.12.1 jars, loaded via
    ``spark.jars`` by ``session.get_spark``). Same split/pruning
    discipline as the upstream module: byte-range splits aligned to
    sync markers, reader-schema projection pushdown. The Python path
    (source-codegen fused decode→transport, r5) remains the semantic
    reference and the fallback for sessions without the jar. On a real
    deployment either jar works; the cast layer is shared, so only the
    decode stage changes.

    The ``muninn.pathColumn`` option asks the engine's DSv2 source to
    emit per-row file provenance (upstream spark-avro ignores the
    unknown option, and there ``input_file_name()`` works instead).

    ``decimal_as_binary`` (CDC path only): ask the engine's source to
    scan bytes/fixed decimal columns as raw unscaled BinaryType so the
    engine's own assumed-scale-30 coercion can run on top — upstream
    spark-avro ignores the option and still decodes DecimalType, which
    ``_align_value`` then rejects into the Python fallback, exactly the
    pre-option behavior."""
    try:
        reader = (
            spark.read.format("avro")
            .option("muninn.pathColumn", JVM_PATH_COL)
        )
        if decimal_as_binary:
            reader = reader.option("muninn.decimalAsBinary", "true")
        return reader.load(pattern)
    except Exception:
        return None


def _read_avro_generic_jvm(spark, paths, plans, field_types, identity_cast):
    """JVM fast path for the generic (non-CDC) scan: the DSv2 avro source
    decodes, one aligned select reproduces the §1.3 + declared-decimal
    output contract. None when unavailable or unalignable (multi-branch
    unions, decimals whose declared type the decode doesn't match) — the
    caller falls back to the Python loop."""
    from pyspark.sql import types as T

    df = try_native_avro(spark, paths)
    if df is None:
        return None
    by_name = {f.name: f.dataType for f in df.schema.fields}
    try:
        cols = []
        for p, ft in zip(plans, field_types):
            target = ft if p.name in identity_cast else p.dtype
            if p.name not in by_name:
                cols.append(F.lit(None).cast(target).alias(p.name))
            elif p.name in identity_cast:
                # generic files honor the DECLARED decimal scale (unlike
                # the CDC contract's assumed-scale-30): the JVM decode is
                # the identity when the types agree exactly
                if by_name[p.name] != ft:
                    raise _Unalignable()
                cols.append(F.col(p.name).alias(p.name))
            else:
                cols.append(
                    _align_value(F.col(p.name), by_name[p.name], p).alias(p.name)
                )
    except _Unalignable:
        return None
    if JVM_PATH_COL in df.columns:
        src = canon_source_col(F.col(JVM_PATH_COL))
    else:
        src = canon_source_col(F.input_file_name())
    return df.select(*cols, src.alias(SOURCE_FILE_COL))


def read_avro_generic(
    spark: SparkSession,
    paths: list[str],
    avro_schema: dict | None = None,
    engine: str | None = None,
) -> DataFrame:
    """Read ANY Avro OCF files — no CDC envelope assumed.

    The CDC scan (``read_avro``) is envelope-shaped: it promotes
    ``payload.*`` and coerces ``source_metadata`` (the reference's
    contract, main.py:55-108). This entry point instead maps each
    TOP-LEVEL record field through the same §1.3 type mapper and cast
    layer, so the engine can re-ingest its own ``avro_sink.write_avro``
    output or third-party Avro tables. Same scale shape as the CDC path:
    sync-marker splits, adaptive sizing, round-robin path distribution,
    bounded Arrow batches.

    ``engine`` mirrors ``read_avro``: ``auto`` (default, or conf
    ``spark.muninn.avro.engine``) tries the JVM DSv2 scan first (round
    8 — whole-stage decode, no Python worker) and falls back to the
    interpreted Python loop when the jar is absent or the schema is not
    exactly alignable; ``jvm`` forces, ``python`` skips."""
    from pyspark.sql import types as T
    from pyspark.sql.pandas.types import to_arrow_schema

    from muninn_avro_to_parquet_spark import casts

    if avro_schema is None:
        avro_schema = avro_io.read_schema(paths[0])
    if avro_schema.get("type") != "record":
        raise ValueError("read_avro_generic needs a top-level record schema")

    def _decimal_spec(node):
        # unwrap ["null", X]; honor a DECLARED (precision, scale) decimal —
        # generic files mean the writer's scale, not the CDC contract's
        # assumed-scale-30 → DECIMAL(38,9) asymmetry
        if isinstance(node, list):
            non_null = [m for m in node if m != "null"]
            node = non_null[0] if len(non_null) == 1 else None
        if (
            isinstance(node, dict)
            and node.get("logicalType") == "decimal"
            and node.get("type") in ("bytes", "fixed")
            and "precision" in node
        ):
            return int(node["precision"]), int(node.get("scale", 0))
        return None

    import decimal as _decimal

    plans = []
    field_types: list[T.DataType] = []
    converters = []
    identity_cast: set[str] = set()
    for f in avro_schema["fields"]:
        spec = _decimal_spec(f["type"])
        plan = S.plan_node(f["name"], f["type"])
        plans.append(plan)
        if spec is not None:
            p, s = spec
            field_types.append(T.DecimalType(p, s))
            identity_cast.add(plan.name)

            def conv(v, _s=s):
                if v is None:
                    return None
                return _decimal.Decimal(
                    int.from_bytes(v, "big", signed=True)
                ).scaleb(-_s)

            converters.append(conv)
        else:
            field_types.append(S.raw_transport_type(plan))
            converters.append(lambda v, _p=plan: _transport_value(v, _p))
    if engine is None:
        engine = spark.conf.get("spark.muninn.avro.engine", "auto")
    if engine in ("auto", "jvm"):
        jdf = _read_avro_generic_jvm(spark, paths, plans, field_types, identity_cast)
        if jdf is not None:
            return jdf
        if engine == "jvm":
            raise RuntimeError(
                "engine=jvm but the avro DataSource is not on the classpath "
                "or the schema is not JVM-alignable; use engine='auto'/'python'"
            )
    transport = T.StructType(
        [
            T.StructField(p.name, ft, True)
            for p, ft in zip(plans, field_types)
        ]
        + [T.StructField(SOURCE_FILE_COL, T.StringType(), False)]
    )
    aschema = to_arrow_schema(transport)
    names = [p.name for p in plans]
    keep = set(names)
    # driver-registered filesystems ride the closure (fs.registry_snapshot)
    from muninn_avro_to_parquet_spark import fs as _fs

    fs_snapshot = _fs.registry_snapshot()

    def gen(batches):
        import pyarrow as pa

        from muninn_avro_to_parquet_spark import fs as _wfs

        _wfs.ensure_registry(fs_snapshot)
        types = {f.name: f.type for f in aschema}
        for rb in batches:
            for path, start, end in zip(
                rb.column("path").to_pylist(),
                rb.column("start").to_pylist(),
                rb.column("end").to_pylist(),
            ):
                canon_path = canon_source_path(path)
                cols: dict[str, list] = {n: [] for n in names}
                n_buf = 0

                def flush(n_rows: int):
                    arrays = [pa.array(cols[n], type=types[n]) for n in names]
                    arrays.append(
                        pa.array([canon_path] * n_rows, type=types[SOURCE_FILE_COL])
                    )
                    return pa.RecordBatch.from_arrays(arrays, schema=aschema)

                with avro_io.SplitBlockReader(path, start, end) as sbr:
                    nm = avro_io.collect_names(sbr.schema)
                    decode = avro_io.compile_projected_decoder_fast(
                        sbr.schema, nm, keep
                    )
                    for br, count in sbr.blocks():
                        for _ in range(count):
                            rec = decode(br)
                            for plan, conv in zip(plans, converters):
                                cols[plan.name].append(conv(rec.get(plan.name)))
                            n_buf += 1
                            if n_buf >= BATCH_ROWS:
                                yield flush(n_buf)
                                cols = {n: [] for n in names}
                                n_buf = 0
                if n_buf:
                    yield flush(n_buf)

    target = spark.sparkContext.defaultParallelism * 2
    splits = plan_splits(paths, target_tasks=target)
    splits_df = spark.createDataFrame(splits, "path string, start long, end long")
    n_part = min(len(splits), target) or 1
    raw = splits_df.repartition(n_part).mapInArrow(gen, schema=transport)
    typed = [
        F.col(p.name)
        if p.name in identity_cast
        else casts.cast_column(p.name, p.source, p.dtype, plan=p)
        for p in plans
    ]
    return raw.select(*typed, F.col(SOURCE_FILE_COL))
