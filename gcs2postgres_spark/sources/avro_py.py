"""Pure-Python Avro object-container codec + distributed Spark reader.

The reference lists Avro among its source formats and its own sample
config loads ``supplier.avro`` (reference README.md:11, config.yaml:15-17,
format-from-extension src/db/db.go:27). PySpark's native path needs the
external spark-avro module, which is not on this classpath and cannot be
fetched offline — so this module implements the Avro 1.x object container
file format (public spec: https://avro.apache.org/docs/current/spec.html)
directly:

- ``read_avro_distributed``: Spark-first reader. File bodies move as
  ``binaryFile`` rows (never through the driver beyond the one header
  read for schema inference); each executor decodes its files with the
  pure-Python decoder inside ``mapInPandas`` (Arrow-batched output).
  Parallelism is per-file — the standard many-part-file Avro layout
  parallelizes naturally; a sync-marker block splitter is the documented
  extension for giant single files.
- ``write_avro_file`` / ``read_avro_file``: single-file codec used for
  fixtures and by the distributed reader per file.

Spec conformance is not self-certified: tests round-trip files through
the *Java* Avro reference implementation bundled with Spark
(org.apache.avro DataFileReader/Writer via the py4j gateway) in both
directions (tests/test_sources_formats.py).

Supported: null/boolean/int/long/float/double/bytes/string, record,
array, map, union, enum, fixed; codecs null + deflate (raw zlib).
Logical types decode as their base type (documented narrowing).
"""

from __future__ import annotations

import datetime as _dt
import io
import json
import os
import struct
import zlib
from decimal import Decimal

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

MAGIC = b"Obj\x01"

# ---------------------------------------------------------------- primitives


def _read_long(buf: io.BytesIO) -> int:
    """Zigzag varint (spec: 'binary encoding > primitive types')."""
    shift = 0
    acc = 0
    while True:
        b = buf.read(1)
        if not b:
            raise EOFError("truncated varint")
        byte = b[0]
        acc |= (byte & 0x7F) << shift
        if not byte & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)


def _write_long(buf: io.BytesIO, n: int) -> None:
    n = (n << 1) ^ (n >> 63) if n < 0 else n << 1
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            buf.write(bytes([b | 0x80]))
        else:
            buf.write(bytes([b]))
            break


def _read_bytes(buf: io.BytesIO) -> bytes:
    n = _read_long(buf)
    data = buf.read(n)
    if len(data) != n:
        raise EOFError("truncated bytes")
    return data


def _write_bytes(buf: io.BytesIO, data: bytes) -> None:
    _write_long(buf, len(data))
    buf.write(data)


# ------------------------------------------------------------ schema-driven


# ------------------------------------------------------------ logical types
#
# Avro logicalType annotations (spec: Logical Types) decode to their
# Spark-typed Python values instead of the base primitive: date(int) →
# datetime.date, timestamp-millis/micros(long) → naive-UTC datetime,
# decimal(bytes|fixed) → Decimal with the schema's scale (unscaled
# big-endian two's-complement per the spec). Unknown logical types fall
# through to the base type, which is the spec-mandated behavior.

_EPOCH_DATE = _dt.date(1970, 1, 1)
_EPOCH_DT = _dt.datetime(1970, 1, 1)


def _from_logical(lt: str, v, schema):
    if lt == "date":
        return _EPOCH_DATE + _dt.timedelta(days=v)
    if lt == "timestamp-micros":
        return _EPOCH_DT + _dt.timedelta(microseconds=v)
    if lt == "timestamp-millis":
        return _EPOCH_DT + _dt.timedelta(milliseconds=v)
    if lt == "decimal":
        unscaled = int.from_bytes(v, "big", signed=True) if v else 0
        return Decimal(unscaled).scaleb(-int(schema.get("scale", 0)))
    return v


def _to_logical(lt: str, v, schema):
    if lt == "date":
        return (v - _EPOCH_DATE).days
    if lt in ("timestamp-micros", "timestamp-millis"):
        if v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        micros = (v - _EPOCH_DT) // _dt.timedelta(microseconds=1)
        return micros if lt == "timestamp-micros" else micros // 1000
    if lt == "decimal":
        unscaled = int(Decimal(v).scaleb(int(schema.get("scale", 0))).to_integral_exact())
        # A decimal over a `fixed` base must occupy exactly schema["size"]
        # bytes, sign-extended (Avro spec §logical types); minimal-length
        # two's-complement is only legal for the `bytes` base. Fit is
        # checked by to_bytes itself: a precomputed
        # (bit_length+8)//8 overestimates by one byte for negative exact
        # powers of two (-128 has bit_length 8 but fits 1 signed byte),
        # which spuriously rejected values at the fixed width's edge.
        if schema.get("type") == "fixed":
            size = int(schema["size"])
            try:
                return unscaled.to_bytes(size, "big", signed=True)
            except OverflowError:
                raise ValueError(
                    f"decimal {v!r} does not fit fixed size {size}"
                ) from None
        nbytes = 1
        while True:
            try:
                return unscaled.to_bytes(nbytes, "big", signed=True)
            except OverflowError:
                nbytes += 1
    return v


def _decode(schema, buf: io.BytesIO):
    """Decode one value of `schema` (parsed JSON form) from buf."""
    if isinstance(schema, list):  # union: long index then value
        return _decode(schema[_read_long(buf)], buf)
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            return {f["name"]: _decode(f["type"], buf) for f in schema["fields"]}
        if t == "array":
            out = []
            while True:
                n = _read_long(buf)
                if n == 0:
                    return out
                if n < 0:
                    _read_long(buf)  # block byte size, unused when parsing all
                    n = -n
                for _ in range(n):
                    out.append(_decode(schema["items"], buf))
        if t == "map":
            out = {}
            while True:
                n = _read_long(buf)
                if n == 0:
                    return out
                if n < 0:
                    _read_long(buf)
                    n = -n
                for _ in range(n):
                    k = _read_bytes(buf).decode("utf-8")
                    out[k] = _decode(schema["values"], buf)
        if t == "enum":
            return schema["symbols"][_read_long(buf)]
        lt = schema.get("logicalType")
        if t == "fixed":
            raw = buf.read(schema["size"])
            return _from_logical(lt, raw, schema) if lt else raw
        base = _decode(t, buf)  # {"type": "long", "logicalType": ...} etc.
        return _from_logical(lt, base, schema) if lt else base
    # plain string type name
    if schema == "null":
        return None
    if schema == "boolean":
        return buf.read(1) == b"\x01"
    if schema in ("int", "long"):
        return _read_long(buf)
    if schema == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if schema == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if schema == "bytes":
        return _read_bytes(buf)
    if schema == "string":
        return _read_bytes(buf).decode("utf-8")
    raise ValueError(f"unsupported avro type {schema!r}")


def _encode(schema, value, buf: io.BytesIO) -> None:
    if isinstance(schema, list):  # union: pick first matching branch
        for i, branch in enumerate(schema):
            if _matches(branch, value):
                _write_long(buf, i)
                _encode(branch, value, buf)
                return
        raise ValueError(f"value {value!r} matches no union branch {schema!r}")
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            for f in schema["fields"]:
                # absent keys encode as null when the field is nullable
                # (writers add optional fields without touching every
                # call site); a missing REQUIRED field still fails loudly
                # at the union/type match
                _encode(f["type"], value.get(f["name"]), buf)
            return
        if t == "array":
            if value:
                _write_long(buf, len(value))
                for v in value:
                    _encode(schema["items"], v, buf)
            _write_long(buf, 0)
            return
        if t == "map":
            if value:
                _write_long(buf, len(value))
                for k, v in value.items():
                    _write_bytes(buf, k.encode("utf-8"))
                    _encode(schema["values"], v, buf)
            _write_long(buf, 0)
            return
        if t == "enum":
            _write_long(buf, schema["symbols"].index(value))
            return
        lt = schema.get("logicalType")
        if lt:
            value = _to_logical(lt, value, schema)
        if t == "fixed":
            buf.write(value)
            return
        _encode(t, value, buf)
        return
    if schema == "null":
        return
    if schema == "boolean":
        buf.write(b"\x01" if value else b"\x00")
    elif schema in ("int", "long"):
        _write_long(buf, int(value))
    elif schema == "float":
        buf.write(struct.pack("<f", value))
    elif schema == "double":
        buf.write(struct.pack("<d", value))
    elif schema == "bytes":
        _write_bytes(buf, bytes(value))
    elif schema == "string":
        _write_bytes(buf, value.encode("utf-8"))
    else:
        raise ValueError(f"unsupported avro type {schema!r}")


def _matches(schema, value) -> bool:
    t = schema["type"] if isinstance(schema, dict) else schema
    if t == "null":
        return value is None
    if value is None:
        return False
    if isinstance(schema, dict) and schema.get("logicalType"):
        lt = schema["logicalType"]
        if lt == "date":
            return isinstance(value, _dt.date) and not isinstance(value, _dt.datetime)
        if lt in ("timestamp-micros", "timestamp-millis"):
            return isinstance(value, _dt.datetime)
        if lt == "decimal":
            return isinstance(value, Decimal)
    if t == "boolean":
        return isinstance(value, bool)
    if t in ("int", "long"):
        return isinstance(value, int) and not isinstance(value, bool)
    if t in ("float", "double"):
        return isinstance(value, float)
    if t == "string":
        return isinstance(value, str)
    if t in ("bytes", "fixed"):
        return isinstance(value, (bytes, bytearray))
    return True  # record/array/map/enum: containers pre-validated by caller


# ------------------------------------------------------------ container file


def _read_header_grow(f) -> tuple[dict, str, bytes, int]:
    """Parse the header from an open file, growing the read on truncation.

    Headers are small; start at 64 KiB and double on EOFError so an
    outsized schema JSON still parses. Returns (schema, codec, sync,
    header_end_offset).
    """
    size = 65536
    while True:
        f.seek(0)
        data = f.read(size)
        buf = io.BytesIO(data)
        try:
            schema, codec, sync = _read_header(buf)
            return schema, codec, sync, buf.tell()
        except EOFError:
            if len(data) < size:  # whole file read and still truncated
                raise
            size *= 2


def _read_header_meta(buf: io.BytesIO) -> tuple[dict, str, bytes, dict]:
    """Parse container header → (writer schema JSON, codec, sync marker,
    full key-value metadata map). Iceberg stamps table facts into the
    map ("schema", "schema-id", "partition-spec-id") — the reader's
    scan grouping consumes them."""
    if buf.read(4) != MAGIC:
        raise ValueError("not an Avro object container file (bad magic)")
    meta: dict[str, bytes] = {}
    while True:
        n = _read_long(buf)
        if n == 0:
            break
        if n < 0:
            _read_long(buf)
            n = -n
        for _ in range(n):
            k = _read_bytes(buf).decode("utf-8")
            meta[k] = _read_bytes(buf)
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported avro codec {codec!r} (null/deflate only)")
    sync = buf.read(16)
    return schema, codec, sync, meta


def _read_header(buf: io.BytesIO) -> tuple[dict, str, bytes]:
    """Parse container header → (writer schema JSON, codec, sync marker)."""
    schema, codec, sync, _meta = _read_header_meta(buf)
    return schema, codec, sync


def read_avro_bytes(data: bytes) -> tuple[dict, list[dict]]:
    """Decode a whole container file body → (writer schema, records)."""
    buf = io.BytesIO(data)
    schema, codec, sync = _read_header(buf)
    records: list[dict] = []
    while buf.tell() < len(data):
        n_records = _read_long(buf)
        block = _read_bytes(buf)
        if codec == "deflate":
            block = zlib.decompress(block, -15)  # raw deflate per spec
        if buf.read(16) != sync:
            raise ValueError("sync marker mismatch (corrupt block)")
        bbuf = io.BytesIO(block)
        for _ in range(n_records):
            records.append(_decode(schema, bbuf))
    return schema, records


def read_avro_file(path: str) -> tuple[dict, list[dict]]:
    from gcs2postgres_spark.sources import fsio

    return read_avro_bytes(fsio.read_bytes(path))


def read_avro_file_meta(path: str) -> tuple[dict, list[dict], dict]:
    """read_avro_file plus the header's key-value metadata map (values
    decoded to str) — the carrier of Iceberg's per-manifest facts
    ("schema", "schema-id", ...)."""
    from gcs2postgres_spark.sources import fsio

    data = fsio.read_bytes(path)
    buf = io.BytesIO(data)
    schema, codec, sync, meta = _read_header_meta(buf)
    records: list[dict] = []
    while buf.tell() < len(data):
        n_records = _read_long(buf)
        size = _read_long(buf)
        body = buf.read(size)
        if codec == "deflate":
            body = zlib.decompress(body, wbits=-15)
        bbuf = io.BytesIO(body)
        for _ in range(n_records):
            records.append(_decode(schema, bbuf))
        if buf.read(16) != sync:
            raise ValueError("avro block sync marker mismatch")
    out_meta = {
        k: v.decode("utf-8", "replace") for k, v in meta.items()
        if not k.startswith("avro.")
    }
    return schema, records, out_meta


def avro_row_count(path: str) -> int:
    """Record count from block headers ONLY — each block is skimmed
    (read count varint, read size varint, seek past data+sync) without
    decompressing or decoding a single record. The Avro twin of a
    parquet-footer num_rows probe: O(#blocks) tiny reads, so manifest
    writers can stamp record_count without pulling row data onto the
    driver."""
    with open(path, "rb") as f:
        _schema, _codec, sync, header_end = _read_header_grow(f)
        size = os.fstat(f.fileno()).st_size
        f.seek(header_end)
        total = 0
        while f.tell() < size:
            hdr = f.read(20)  # two varints: ≤10 bytes each
            buf = io.BytesIO(hdr)
            n_records = _read_long(buf)
            block_len = _read_long(buf)
            total += n_records
            f.seek(f.tell() - (len(hdr) - buf.tell()) + block_len)
            if f.read(16) != sync:
                raise ValueError(f"sync marker mismatch in {path!r} (corrupt block)")
        return total


def write_avro_file(
    path: str, schema: dict, records: list[dict], codec: str = "deflate",
    sync: bytes | None = None, block_records: int = 1000,
    extra_meta: dict[str, str] | None = None,
) -> None:
    """Write an object container file (fixture/writer side of the codec).
    Deterministic by construction: the default sync marker is the md5 of
    the schema JSON — byte-stable across runs for the same schema (the
    fixture property), but NOT a constant the data could plausibly
    contain (an earlier all-zero marker would collide with any 16 zero
    bytes in a block, which matters now that read_avro_split_distributed
    scans for the marker to find block boundaries)."""
    if sync is None:
        import hashlib

        sync = hashlib.md5(json.dumps(schema, sort_keys=True).encode()).digest()
    out = io.BytesIO()
    out.write(MAGIC)
    meta = {"avro.schema": json.dumps(schema).encode(), "avro.codec": codec.encode()}
    for k, v in (extra_meta or {}).items():
        meta[k] = v.encode("utf-8")
    _write_long(out, len(meta))
    for k, v in meta.items():
        _write_bytes(out, k.encode())
        _write_bytes(out, v)
    _write_long(out, 0)
    out.write(sync)
    for i in range(0, len(records), block_records):
        chunk = records[i : i + block_records]
        bbuf = io.BytesIO()
        for r in chunk:
            _encode(schema, r, bbuf)
        body = bbuf.getvalue()
        if codec == "deflate":
            c = zlib.compressobj(wbits=-15)
            body = c.compress(body) + c.flush()
        _write_long(out, len(chunk))
        _write_bytes(out, body)
        out.write(sync)
    # scheme'd paths (file:, registered object stores) route through
    # fsio/Hadoop — driver-side manifest writes only. The package import
    # stays INSIDE the scheme branch: this function also runs on
    # executor workers (partition-wise avro writes, always plain posix
    # paths), where the whole module ships by value and the package is
    # not importable.
    import re as _re

    if _re.match(r"^[A-Za-z][A-Za-z0-9+.-]*:", path):
        from gcs2postgres_spark.sources import fsio

        fsio.write_bytes(path, out.getvalue())
    else:
        with open(path, "wb") as f:
            f.write(out.getvalue())


# ------------------------------------------------------- schema translation


def avro_to_spark_type(schema) -> T.DataType:
    if isinstance(schema, list):
        non_null = [s for s in schema if s != "null"]
        if len(non_null) != 1:
            raise ValueError(f"only unions of null + one type supported: {schema!r}")
        return avro_to_spark_type(non_null[0])
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            return T.StructType(
                [
                    T.StructField(
                        f["name"], avro_to_spark_type(f["type"]), _nullable(f["type"])
                    )
                    for f in schema["fields"]
                ]
            )
        if t == "array":
            return T.ArrayType(avro_to_spark_type(schema["items"]), _nullable(schema["items"]))
        if t == "map":
            return T.MapType(T.StringType(), avro_to_spark_type(schema["values"]), _nullable(schema["values"]))
        if t == "enum":
            return T.StringType()
        lt = schema.get("logicalType")
        if lt == "date":
            return T.DateType()
        if lt in ("timestamp-micros", "timestamp-millis"):
            return T.TimestampType()
        if lt == "decimal":
            return T.DecimalType(int(schema["precision"]), int(schema.get("scale", 0)))
        if t == "fixed":
            return T.BinaryType()
        return avro_to_spark_type(t)
    return {
        "null": T.NullType(),
        "boolean": T.BooleanType(),
        "int": T.IntegerType(),
        "long": T.LongType(),
        "float": T.FloatType(),
        "double": T.DoubleType(),
        "bytes": T.BinaryType(),
        "string": T.StringType(),
    }[schema]


def _nullable(schema) -> bool:
    return isinstance(schema, list) and "null" in schema


def spark_to_avro_schema(st: T.StructType, name: str = "row") -> dict:
    """Spark struct → avro record schema (fixture writer side)."""
    mapping = {
        T.BooleanType: "boolean", T.IntegerType: "int", T.LongType: "long",
        T.FloatType: "float", T.DoubleType: "double", T.BinaryType: "bytes",
        T.StringType: "string", T.ShortType: "int", T.ByteType: "int",
    }

    def conv(dt: T.DataType):
        # logical types first: DateType is not in the base mapping, and
        # DecimalType must carry precision/scale through the annotation
        if isinstance(dt, T.DateType):
            return {"type": "int", "logicalType": "date"}
        if isinstance(dt, T.TimestampType):
            return {"type": "long", "logicalType": "timestamp-micros"}
        if isinstance(dt, T.DecimalType):
            return {
                "type": "bytes",
                "logicalType": "decimal",
                "precision": dt.precision,
                "scale": dt.scale,
            }
        for k, v in mapping.items():
            if isinstance(dt, k):
                return v
        if isinstance(dt, T.ArrayType):
            return {"type": "array", "items": conv(dt.elementType)}
        if isinstance(dt, T.MapType):
            return {"type": "map", "values": conv(dt.valueType)}
        if isinstance(dt, T.StructType):
            return spark_to_avro_schema(dt, name + "_n")
        raise ValueError(f"no avro mapping for {dt}")

    return {
        "type": "record",
        "name": name,
        "fields": [
            {"name": f.name, "type": ["null", conv(f.dataType)] if f.nullable else conv(f.dataType)}
            for f in st.fields
        ],
    }


# ----------------------------------------------------- distributed writer


def write_avro_distributed(df: DataFrame, path: str, codec: str = "deflate") -> None:
    """Partition-wise Avro sink: each executor partition writes its own
    ``part-{pid}.avro`` container file — nothing transits the driver (the
    same executor-writes shape as sinks.write_jdbc). Pairs with
    ``read_avro_distributed`` for a jar-less avro round trip."""
    import os
    import sys as _sys

    from pyspark import cloudpickle as _cp

    _cp.register_pickle_by_value(_sys.modules[__name__])
    os.makedirs(path, exist_ok=True)
    schema = spark_to_avro_schema(df.schema, "row")
    names = df.columns
    write_fn = write_avro_file

    def write_partition(rows) -> None:
        from pyspark import TaskContext

        records = [dict(zip(names, r)) for r in rows]
        if not records:
            return
        pid = TaskContext.get().partitionId()
        write_fn(os.path.join(path, f"part-{pid:05d}.avro"), schema, records, codec=codec)

    df.foreachPartition(write_partition)


# ----------------------------------------------------------- spark reader


def read_avro_distributed(spark: SparkSession, path: str) -> DataFrame:
    """Distributed Avro read without the spark-avro jar.

    One driver-side header read infers the schema (metadata block only —
    no data rows transit the driver); then ``binaryFile`` ships each
    file's bytes to an executor and ``mapInPandas`` decodes them with the
    pure-Python codec. The decoder closure is built inside this function
    so cloudpickle serializes it BY VALUE — executor workers don't have
    this package on sys.path (same reasoning as multimodal._make_decoder).

    Scale shape: per-file parallelism (the standard many-part-file Avro
    layout); a giant single file would need a sync-marker splitter, which
    is the documented extension point. Python-side decode is the price of
    the missing jar — in a deployment with spark-avro available,
    read_source uses the native JVM reader and never reaches this path.
    """
    import glob as _glob
    import os

    first = sorted(_glob.glob(os.path.join(path, "*.avro"))) if os.path.isdir(path) else [path]
    if not first:
        raise ValueError(f"no .avro files under {path!r}")
    with open(first[0], "rb") as f:
        avro_schema, _, _, _ = _read_header_grow(f)
    spark_schema = avro_to_spark_type(avro_schema)
    if not isinstance(spark_schema, T.StructType):
        raise ValueError("top-level avro schema must be a record")
    field_names = [f.name for f in spark_schema.fields]

    # executor Python workers don't have this package on sys.path: register
    # the module for BY-VALUE cloudpickle so the whole decode call graph
    # (read_avro_bytes → _decode → _read_long …) ships inside the closure
    # instead of as an import reference
    import sys as _sys

    from pyspark import cloudpickle as _cp

    _cp.register_pickle_by_value(_sys.modules[__name__])

    read_bytes_fn = read_avro_bytes

    def decode_files(batches):
        import pandas as pd

        for pdf in batches:
            for blob in pdf["content"]:
                _, records = read_bytes_fn(bytes(blob))
                if records:
                    yield pd.DataFrame.from_records(records, columns=field_names)

    if os.path.isdir(path):
        # directory: every *.avro part-file, one task per file
        binary = (
            spark.read.format("binaryFile")
            .option("pathGlobFilter", "*.avro")
            .load(path)
        )
    else:
        # single file: load EXACTLY this path — a dirname+glob load would
        # silently union sibling .avro files into the result. A single
        # GIANT posix file re-routes to the sync-marker splitter so it
        # doesn't decode as one task (the Hadoop input-split recipe).
        if os.path.getsize(path) > SPLIT_THRESHOLD_BYTES:
            return read_avro_split_distributed(spark, path)
        binary = spark.read.format("binaryFile").load(path)
    return binary.select("content").mapInPandas(decode_files, schema=spark_schema)


# Single files above this size read via byte-range splits instead of one
# whole-file task (read_avro_split_distributed).
SPLIT_THRESHOLD_BYTES = 256 << 20


def read_avro_split_distributed(
    spark: SparkSession, path: str, split_bytes: int = 128 << 20
) -> DataFrame:
    """Distributed read of ONE giant Avro container file via sync-marker
    byte-range splits — the Hadoop input-split recipe, closing
    read_avro_distributed's one-task-per-file limit for the
    single-huge-file layout.

    The driver reads only the header (schema, codec, sync marker,
    header length) and the file size, then plans [start, end) byte
    ranges of ~split_bytes. Each task seeks into the file, scans
    forward for the 16-byte sync marker, and decodes every block whose
    START offset falls inside its range (the block that merely *ends*
    inside the range belongs to the previous task) — so every block is
    decoded exactly once with no coordination. A range wholly inside
    one giant block finds no boundary and yields nothing, also correct.

    Marker collisions: the writer's sync defaults to md5(schema JSON) —
    16 bytes the data has no reason to contain (an all-zero marker
    would false-positive on zero runs). Files from other writers use
    random markers (the spec's recommendation) with the same 2^-128
    collision math the Hadoop splitter has always accepted.

    Scope: posix paths (executors reopen the file directly — workers
    have no SparkSession to reach the Hadoop FS API). Object-store
    deployments ship many part-files and ride the per-file path above;
    this operator exists for the single-huge-file NFS/local layout.
    """
    import os
    import sys as _sys

    from pyspark import cloudpickle as _cp

    _cp.register_pickle_by_value(_sys.modules[__name__])

    with open(path, "rb") as f:
        schema, codec, sync, header_end = _read_header_grow(f)
    size = os.path.getsize(path)
    spark_schema = avro_to_spark_type(schema)
    if not isinstance(spark_schema, T.StructType):
        raise ValueError("top-level avro schema must be a record")
    field_names = [f.name for f in spark_schema.fields]

    starts = list(range(header_end, size, split_bytes))
    ranges = [
        (s, min(s + split_bytes, size)) for s in starts
    ]
    rng_df = spark.createDataFrame(ranges, "start long, end long").repartition(
        max(1, len(ranges))
    )
    read_long_fn, read_bytes_fn, decode_fn = _read_long, _read_bytes, _decode

    def decode_ranges(batches):
        import pandas as pd

        def first_block_start(f, start, end):
            # blocks begin immediately after a sync; the header's own
            # trailing sync puts the first block exactly at header_end
            if start <= header_end:
                return header_end
            scan_from = max(header_end, start - 16)
            f.seek(scan_from)
            window = f.read((end - scan_from) + 16)
            idx = 0
            while True:
                hit = window.find(sync, idx)
                if hit < 0:
                    return None
                q = scan_from + hit + 16  # block start candidate
                if q >= end:
                    return None
                if q >= start:
                    return q
                idx = hit + 1
            # unreachable

        for pdf in batches:
            for start, end in zip(pdf["start"], pdf["end"]):
                out: list[dict] = []
                with open(path, "rb") as f:
                    pos = first_block_start(f, int(start), int(end))
                    while pos is not None and pos < int(end) and pos < size:
                        f.seek(pos)
                        n_records = read_long_fn(f)
                        block = read_bytes_fn(f)
                        if f.read(16) != sync:
                            raise ValueError(
                                "sync marker mismatch (corrupt block or "
                                "marker collision)"
                            )
                        if codec == "deflate":
                            block = zlib.decompress(block, -15)
                        bbuf = io.BytesIO(block)
                        for _ in range(n_records):
                            out.append(decode_fn(schema, bbuf))
                        pos = f.tell()
                if out:
                    yield pd.DataFrame.from_records(out, columns=field_names)

    return rng_df.mapInPandas(decode_ranges, schema=spark_schema)
