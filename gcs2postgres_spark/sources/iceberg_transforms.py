"""Iceberg hidden-partitioning transforms (spec "Partition Transforms"
and "Appendix B: 32-bit Hash Requirements",
https://iceberg.apache.org/spec/#partition-transforms).

Two faces of every transform, kept in lockstep by shared tests:

- ``apply_transform(transform, value, iceberg_type)`` — pure-Python
  driver-side evaluation, used for MANIFEST-LEVEL PRUNING: a
  partition_filter over source-column values is mapped through the
  transform and compared against the typed partition tuple each
  manifest entry records. Metadata-scale work (one call per filter
  value, never per row).
- ``transform_expr(transform, col, spark_type)`` — executor-side Spark
  Column, used by the committers to ROUTE rows to partitions. Every
  transform except ``bucket`` is a built-in-function expression
  (whole-stage codegen, zero Python); ``bucket`` needs Iceberg's exact
  murmur3_x86_32 hash, which Spark's ``hash()`` cannot produce (seed 42
  + different byte encoding), so it is an Arrow-batched pandas UDF —
  numpy-vectorized over epoch longs (date/timestamp sources are
  converted JVM-side first, which also keeps routing session-timezone-
  proof); strings dictionary-encode so murmur3 runs once per DISTINCT
  value rather than per row.

Time semantics: ``year/month/day/hour`` floor in UTC per the spec.
Spark ``TimestampType`` stores UTC epoch micros, so the expressions
compute calendar parts from the epoch value (session-timezone-proof);
``TimestampNTZType`` wall-clock values are treated as UTC (the same
reading ``iceberg_to_spark_type`` gives the spec's ``timestamp``).

Reference parity: Iceberg is a first-class source format of the
reference (README.md:11); hidden partitioning is how real Iceberg
tables are overwhelmingly laid out (``days(ts)``, ``bucket(n, id)``).
"""

from __future__ import annotations

import datetime as _dt
import re

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_EPOCH_DATE = _dt.date(1970, 1, 1)
_EPOCH_DT = _dt.datetime(1970, 1, 1)

_BUCKET_RE = re.compile(r"bucket\[(\d+)\]")
_TRUNCATE_RE = re.compile(r"truncate\[(\d+)\]")


def parse_transform(transform: str) -> tuple[str, int | None]:
    """``'bucket[16]'`` → ``('bucket', 16)``; ``'day'`` → ``('day',
    None)``. Raises ValueError on an unknown transform string."""
    m = _BUCKET_RE.fullmatch(transform)
    if m:
        return "bucket", int(m.group(1))
    m = _TRUNCATE_RE.fullmatch(transform)
    if m:
        return "truncate", int(m.group(1))
    if transform in ("identity", "year", "month", "day", "hour", "micros", "void"):
        # "micros" is INTERNAL (storage_transform's identity-on-timestamp
        # mapping), not a spec transform string
        return transform, None
    raise ValueError(f"unknown iceberg partition transform {transform!r}")


def result_avro_type(transform: str, source_avro: str) -> str:
    """Avro primitive the TRANSFORMED partition value is stored as in
    manifest partition structs (spec: bucket/date-parts → int,
    truncate/identity → source type)."""
    kind, _ = parse_transform(transform)
    if kind == "bucket" or kind in ("year", "month", "day", "hour"):
        return "int"
    if kind in ("identity", "truncate"):
        return source_avro
    raise ValueError(f"transform {transform!r} has no storable result type")


def storage_transform(transform: str, iceberg_type: str) -> str:
    """The transform whose RESULT equals the manifest STORAGE value.

    Identity partition values on date/timestamp sources are stored in
    manifests as their underlying int (days from epoch) / long (micros)
    — spec 'Partition struct' + Avro logical types — which is exactly
    what the ``day``/micros transforms compute. Mapping identity onto
    them keeps the two faces (routing expr, pruning apply) consistent
    with the stored values without special-casing every call site.
    Non-temporal identities and every explicit transform store their
    own result unchanged."""
    kind, _ = parse_transform(transform)
    if kind == "identity" and iceberg_type == "date":
        return "day"
    if kind == "identity" and iceberg_type in ("timestamp", "timestamptz"):
        return "micros"
    return transform


# --------------------------------------------------------------- murmur3


def _make_murmur3():
    # nested so committer closures that capture it serialize BY VALUE
    # (cloudpickle; see the worker-pickling note in .claude verify)
    def murmur3_32(data: bytes, seed: int = 0) -> int:
        """murmur3_x86_32, the hash Appendix B requires. Returns the
        SIGNED int32 (Iceberg's Java int)."""
        c1, c2 = 0xCC9E2D51, 0x1B873593
        h = seed & 0xFFFFFFFF
        n = len(data)
        nblocks = n // 4
        for i in range(nblocks):
            k = int.from_bytes(data[i * 4 : i * 4 + 4], "little")
            k = (k * c1) & 0xFFFFFFFF
            k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
            k = (k * c2) & 0xFFFFFFFF
            h ^= k
            h = ((h << 13) | (h >> 19)) & 0xFFFFFFFF
            h = (h * 5 + 0xE6546B64) & 0xFFFFFFFF
        tail = data[nblocks * 4 :]
        if tail:
            k = int.from_bytes(tail, "little")
            k = (k * c1) & 0xFFFFFFFF
            k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
            k = (k * c2) & 0xFFFFFFFF
            h ^= k
        h ^= n
        h ^= h >> 16
        h = (h * 0x85EBCA6B) & 0xFFFFFFFF
        h ^= h >> 13
        h = (h * 0xC2B2AE35) & 0xFFFFFFFF
        h ^= h >> 16
        return h - 0x100000000 if h >= 0x80000000 else h

    return murmur3_32


murmur3_32 = _make_murmur3()


def _bucket_of_long(v: int, n: int) -> int:
    # spec: hashInt(v) = hashLong(v) — ints/longs/dates/timestamps all
    # hash their 8-byte little-endian (two's-complement) encoding
    h = murmur3_32((v & 0xFFFFFFFFFFFFFFFF).to_bytes(8, "little"))
    return (h & 0x7FFFFFFF) % n


def _bucket_of_str(s: str, n: int) -> int:
    h = murmur3_32(s.encode("utf-8"))
    return (h & 0x7FFFFFFF) % n


# ------------------------------------------------- driver-side evaluation


def _epoch_micros(value) -> int:
    if isinstance(value, _dt.datetime):
        if value.tzinfo is not None:
            value = value.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        delta = value - _EPOCH_DT
        return (delta.days * 86_400 + delta.seconds) * 1_000_000 + delta.microseconds
    raise TypeError(f"expected datetime, got {type(value).__name__}")


def apply_transform(transform: str, value, iceberg_type: str):
    """Driver-side transform of ONE source value (the pruning path).
    ``None`` maps to ``None`` for every transform (spec: transforms
    must return null for null)."""
    if value is None:
        return None
    kind, arg = parse_transform(transform)
    if kind == "void":
        return None
    if kind == "identity":
        return value
    if kind == "truncate":
        if iceberg_type in ("int", "long"):
            return value - (value % arg)  # Python % IS floor-mod (spec)
        if iceberg_type == "string":
            return value[:arg]
        raise NotImplementedError(
            f"truncate on iceberg type {iceberg_type!r} (int/long/string only)"
        )
    if kind == "bucket":
        if iceberg_type in ("int", "long"):
            return _bucket_of_long(int(value), arg)
        if iceberg_type == "date":
            days = (value - _EPOCH_DATE).days if isinstance(value, _dt.date) else int(value)
            return _bucket_of_long(days, arg)
        if iceberg_type in ("timestamp", "timestamptz"):
            micros = _epoch_micros(value) if isinstance(value, _dt.datetime) else int(value)
            return _bucket_of_long(micros, arg)
        if iceberg_type == "string":
            return _bucket_of_str(value, arg)
        raise NotImplementedError(f"bucket on iceberg type {iceberg_type!r}")
    if kind == "micros":
        if isinstance(value, _dt.datetime):
            return _epoch_micros(value)
        return int(value)
    # calendar transforms: floor in UTC
    if iceberg_type == "date":
        d = value if isinstance(value, _dt.date) else _EPOCH_DATE + _dt.timedelta(days=int(value))
        if kind == "year":
            return d.year - 1970
        if kind == "month":
            return (d.year - 1970) * 12 + d.month - 1
        if kind == "day":
            return (d - _EPOCH_DATE).days
        raise NotImplementedError("hour transform is invalid on a date column")
    if iceberg_type in ("timestamp", "timestamptz"):
        micros = _epoch_micros(value) if isinstance(value, _dt.datetime) else int(value)
        days = micros // 86_400_000_000
        if kind == "hour":
            return micros // 3_600_000_000
        if kind == "day":
            return days
        d = _EPOCH_DATE + _dt.timedelta(days=days)
        if kind == "year":
            return d.year - 1970
        return (d.year - 1970) * 12 + d.month - 1
    raise NotImplementedError(
        f"{kind} transform on iceberg type {iceberg_type!r}"
    )


# ----------------------------------------------- executor-side expressions


def _bucket_udf(n: int, spark_type: T.DataType):
    """Arrow-batched bucket(n): numpy-vectorized murmur3 over the fixed
    8-byte encodings (int/long/date/timestamp), per-row only for
    strings. Built inside a factory so worker closures pickle by value."""
    from pyspark.sql.functions import pandas_udf

    mm = _make_murmur3()

    def _mix_two_blocks(k1, k2):
        # murmur3_x86_32 over exactly 8 bytes: two 4-byte blocks, no tail
        c1 = np.uint32(0xCC9E2D51)
        c2 = np.uint32(0x1B873593)
        h = np.zeros_like(k1, dtype=np.uint32)
        with np.errstate(over="ignore"):
            for k in (k1, k2):
                k = (k * c1).astype(np.uint32)
                k = ((k << np.uint32(15)) | (k >> np.uint32(17))).astype(np.uint32)
                k = (k * c2).astype(np.uint32)
                h ^= k
                h = ((h << np.uint32(13)) | (h >> np.uint32(19))).astype(np.uint32)
                h = (h * np.uint32(5) + np.uint32(0xE6546B64)).astype(np.uint32)
            h ^= np.uint32(8)
            h ^= h >> np.uint32(16)
            h = (h * np.uint32(0x85EBCA6B)).astype(np.uint32)
            h ^= h >> np.uint32(13)
            h = (h * np.uint32(0xC2B2AE35)).astype(np.uint32)
            h ^= h >> np.uint32(16)
        return h

    if isinstance(spark_type, T.StringType):

        @pandas_udf("int")
        def bucket(s: pd.Series) -> pd.Series:
            # murmur3 over variable-length UTF-8 has no numpy form, so
            # dictionary-encode first: hash each DISTINCT value once and
            # gather — per-row Python cost only on the unique set (bucket
            # columns are typically low-cardinality keys)
            codes, uniques = pd.factorize(s)
            hashed = np.fromiter(
                ((mm(v.encode("utf-8")) & 0x7FFFFFFF) % n for v in uniques),
                dtype="int64", count=len(uniques),
            )
            out = pd.Series(
                np.where(codes >= 0, hashed[np.clip(codes, 0, None)], 0),
                index=s.index,
            ).astype("Int32")
            out[codes < 0] = None
            return out

        return bucket

    # date/timestamp columns never reach the UDF: transform_expr converts
    # them to epoch longs JVM-side (unix_micros / datediff), which is both
    # session-timezone-proof and keeps the pandas side a pure int path
    if not isinstance(
        spark_type, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    ):
        raise NotImplementedError(f"bucket on spark type {spark_type}")

    @pandas_udf("int")
    def bucket(s: pd.Series) -> pd.Series:
        longs = s
        mask = longs.isna()
        v = longs.fillna(0).to_numpy(dtype="int64").view(np.uint64)
        k1 = (v & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        k2 = (v >> np.uint64(32)).astype(np.uint32)
        h = _mix_two_blocks(k1, k2)
        out = ((h & np.uint32(0x7FFFFFFF)) % np.uint32(n)).astype("int64")
        res = pd.Series(out, index=s.index).astype("Int32")
        res[mask] = None
        return res

    return bucket


def _ntz_micros(c: Column) -> Column:
    """Epoch micros of a TimestampNTZ column from wall-clock parts only
    (unix_micros would detour through the session timezone)."""
    day = F.datediff(c.cast("date"), F.to_date(F.lit("1970-01-01")))
    secs = (
        day.cast("long") * 86400
        + F.hour(c).cast("long") * 3600
        + F.minute(c).cast("long") * 60
        + F.second(c).cast("long")
    )
    return secs * F.lit(1_000_000).cast("long") + F.date_format(
        c, "SSSSSS"
    ).cast("long")


def transform_expr(transform: str, col_name: str, spark_type: T.DataType) -> Column:
    """Spark Column computing the partition value of ``col_name`` under
    ``transform`` — the executor-side twin of ``apply_transform`` (the
    committers route rows with this; tests pin both faces agree)."""
    c = F.col(col_name)
    kind, arg = parse_transform(transform)
    if kind == "identity":
        return c
    if kind == "void":
        return F.lit(None)
    if kind == "truncate":
        if isinstance(spark_type, (T.IntegerType, T.LongType)):
            return (c - F.pmod(c, F.lit(arg))).cast(spark_type)
        if isinstance(spark_type, T.StringType):
            return F.substring(c, 1, arg)
        raise NotImplementedError(f"truncate on spark type {spark_type}")
    if kind == "bucket":
        # temporal sources: compute the epoch long JVM-side so the pandas
        # UDF never sees a timestamp — pandas_udf delivers SESSION-LOCAL
        # tz-naive timestamps, which would make executor-side routing
        # disagree with driver-side apply_transform pruning under a
        # non-UTC spark.sql.session.timeZone (rows silently missing from
        # pruned reads); unix_micros/datediff are timezone-proof
        if isinstance(spark_type, T.DateType):
            days = F.datediff(c, F.to_date(F.lit("1970-01-01"))).cast("long")
            return _bucket_udf(arg, T.LongType())(days)
        if isinstance(spark_type, T.TimestampType):
            return _bucket_udf(arg, T.LongType())(F.unix_micros(c))
        if isinstance(spark_type, T.TimestampNTZType):
            return _bucket_udf(arg, T.LongType())(_ntz_micros(c))
        return _bucket_udf(arg, spark_type)(c)
    # calendar transforms — computed from the epoch value so the result
    # is session-timezone-proof (TimestampType stores UTC micros)
    if isinstance(spark_type, T.DateType):
        if kind == "day":
            return F.datediff(c, F.to_date(F.lit("1970-01-01"))).cast("int")
        if kind == "year":
            return (F.year(c) - F.lit(1970)).cast("int")
        if kind == "month":
            return ((F.year(c) - F.lit(1970)) * 12 + F.month(c) - 1).cast("int")
        raise NotImplementedError("hour transform is invalid on a date column")
    if kind == "micros":
        if isinstance(spark_type, T.TimestampType):
            return F.unix_micros(c)
        if isinstance(spark_type, T.TimestampNTZType):
            return _ntz_micros(c)
        raise NotImplementedError(f"micros on spark type {spark_type}")
    if isinstance(spark_type, T.TimestampNTZType):
        # NTZ wall clock IS the UTC reading (iceberg 'timestamp')
        day = F.datediff(c.cast("date"), F.to_date(F.lit("1970-01-01")))
        if kind == "hour":
            return (day * 24 + F.hour(c)).cast("int")
        if kind == "day":
            return day.cast("int")
        if kind == "year":
            return (F.year(c) - F.lit(1970)).cast("int")
        return ((F.year(c) - F.lit(1970)) * 12 + F.month(c) - 1).cast("int")
    if isinstance(spark_type, T.TimestampType):
        secs = c.cast("double")
        day = F.floor(secs / F.lit(86400.0)).cast("int")
        if kind == "hour":
            return F.floor(secs / F.lit(3600.0)).cast("int")
        if kind == "day":
            return day
        d = F.date_add(F.to_date(F.lit("1970-01-01")), day)
        if kind == "year":
            return (F.year(d) - F.lit(1970)).cast("int")
        return ((F.year(d) - F.lit(1970)) * 12 + F.month(d) - 1).cast("int")
    raise NotImplementedError(f"{kind} transform on spark type {spark_type}")
