"""Multimodal column plumbing (SURVEY.md §2.8): image/audio/video as
opaque binary columns with typed metadata, decode / feature-extract /
resize / frame-sample as Arrow-batched mapInPandas operators.

The container has no image/audio libs, so the *codec* step is a
deterministic fake (or NotImplementedError for real formats) — but the
Spark-side plumbing is real and tested: binary column + metadata
struct schema, mapInPandas batch iteration, Arrow transfer, output
schema, partition preservation. Swapping the fake for PIL/ffmpeg is a
one-function change inside the UDF.

Scale notes: mapInPandas streams Arrow batches — memory is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` regardless of
partition size, which is what makes 100 TB of media columns feasible.
Binary payloads stay columnar end-to-end; never collect them.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# typed metadata carried beside every media payload
MEDIA_META_SCHEMA = (
    "media_type string, width int, height int, n_frames int, sample_rate int"
)

DECODE_OUTPUT_SCHEMA = (
    "doc_id bigint, media_type string, payload_bytes bigint, width int, height int, "
    "checksum bigint, feature array<double>"
)


def attach_fake_media(docs: DataFrame, media_type: str = "image") -> DataFrame:
    """Model documents as multimodal records: payload = utf-8 bytes of the
    text (a deterministic stand-in for real image bytes), metadata derived
    deterministically. Real pipelines read payloads from object storage —
    the downstream plumbing is identical."""
    payload = F.encode(F.col("text"), "utf-8")
    # metadata is a plain-arithmetic function of doc_id (not a hash) so the
    # decode pipeline's output stays reproducible by an external SQL oracle
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit(media_type).alias("media_type"),
            (F.pmod(F.col("doc_id") * 37 + 11, F.lit(512)) + 32).cast("int").alias("width"),
            (F.pmod(F.col("doc_id") * 53 + 7, F.lit(512)) + 32).cast("int").alias("height"),
            F.lit(1).cast("int").alias("n_frames"),
            F.lit(0).cast("int").alias("sample_rate"),
        ).alias("media_meta"),
    )


def _make_decoder():
    """Factory for the codec function. The nested definition is
    deliberate: its qualname (`_make_decoder.<locals>…`) is not
    importable, so cloudpickle serializes it BY VALUE into executor-side
    closures — workers need no access to this package on their
    sys.path (the driver harness may run from any cwd). A module-level
    function here would pickle by reference and raise
    ModuleNotFoundError on the Python workers."""

    def decode_payload(payload: bytes, media_type: str) -> dict:
        """The codec seam. Real decoders (PIL, soundfile, pyav) slot in
        here; without them, "decode" is a deterministic byte-level feature
        extract for supported fake types, NotImplementedError otherwise."""
        if media_type not in ("image", "audio", "video"):
            raise NotImplementedError(f"no decoder for media_type={media_type!r}")
        checksum = 0
        for b in payload:
            checksum = (checksum * 131 + b) % (1 << 61)
        feature = [
            len(payload) / 1024.0,
            payload[0] / 255.0 if payload else 0.0,
            payload[-1] / 255.0 if payload else 0.0,
            (checksum % 1000) / 1000.0,
        ]
        return {"payload_bytes": len(payload), "checksum": checksum, "feature": feature}

    return decode_payload


_decode_payload = _make_decoder()


def decode_media(records: DataFrame, decoder=None) -> DataFrame:
    """Arrow-batched decode: mapInPandas over (payload, media_meta) rows,
    emitting per-record features. Batch-shape contract: each pandas
    DataFrame chunk holds payload as bytes objects and media_meta as dicts
    (Arrow struct → dict).

    ``decoder`` is the codec seam: any callable with the
    ``decode_payload(payload, media_type) → dict`` contract. Defaults to
    the deterministic fake; functions/media_codecs.make_real_decoder()
    supplies REAL stdlib-only PNG/WAV codecs (tested against JVM ImageIO
    output); PIL/ffmpeg-backed decoders slot in the same way. Must be
    by-value picklable (nested/factory-made, not module-level)."""

    decode_payload = decoder if decoder is not None else _decode_payload

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # plain lists only — never mix an index-carrying Series with
            # lists in the output frame (a batch with a non-default index
            # would silently misalign rows)
            metas = list(pdf["media_meta"])

            def mget(m, k):  # Arrow struct arrives as dict (or Row-like)
                return m[k] if isinstance(m, dict) else getattr(m, k)

            out = {
                "doc_id": pdf["doc_id"].tolist(),
                "media_type": [mget(m, "media_type") for m in metas],
                "payload_bytes": [],
                "width": [mget(m, "width") for m in metas],
                "height": [mget(m, "height") for m in metas],
                "checksum": [],
                "feature": [],
            }
            for payload, meta in zip(pdf["payload"], metas):
                d = decode_payload(bytes(payload), mget(meta, "media_type"))
                out["payload_bytes"].append(d["payload_bytes"])
                out["checksum"].append(d["checksum"])
                out["feature"].append(d["feature"])
            yield pd.DataFrame(out)

    return records.mapInPandas(decode_batches, schema=DECODE_OUTPUT_SCHEMA)


def resize_metadata(records: DataFrame, max_side: int = 256) -> DataFrame:
    """"Resize" planning pass: pure-Catalyst computation of target dims
    (aspect-preserving clamp to max_side) — the shuffle-free metadata step
    that precedes an actual pixel resize."""
    w = F.col("media_meta.width")
    h = F.col("media_meta.height")
    scale = F.least(F.lit(1.0), F.lit(max_side) / F.greatest(w, h))
    return records.withColumn(
        "resized",
        F.struct(
            F.round(w * scale).cast("int").alias("width"),
            F.round(h * scale).cast("int").alias("height"),
        ),
    )


def sample_frames(records: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sample planning: explode frame indices 0..n_frames-1 step
    every_n (video → frame rows) without touching payloads."""
    return records.withColumn(
        "frame_idx",
        F.explode(F.sequence(F.lit(0), F.col("media_meta.n_frames") - 1, F.lit(every_n))),
    )


def attach_pattern_png(
    docs: DataFrame, id_col: str = "doc_id", key_mod: int = 200, side: int = 8
) -> DataFrame:
    """Attach a REAL grayscale PNG payload per row, pixels generated by
    the closed-form pattern p(k) = (7·(id % key_mod) + 13·k) % 256 —
    rows sharing ``id % key_mod`` are pixel-identical images (planted
    duplicates). Encoding runs on EXECUTORS via the jar-free stdlib
    encoder (functions/media_codecs.encode_png_gray), one Arrow batch
    at a time; the closed form is what lets a SQL oracle replay
    everything downstream of the codec.
    """
    n_px = side * side
    # ship the codec MODULE by value (register_pickle_by_value): its
    # functions have importable qualnames cloudpickle would otherwise
    # pickle by reference, and executor workers don't share the
    # driver's sys.path hack (the multimodal gotcha — same fix as
    # queries/llm.multimodal_wav_energy)
    from pyspark import cloudpickle as _cp

    from gcs2postgres_spark.functions import media_codecs as _mc

    _cp.register_pickle_by_value(_mc)
    encode_png_gray = _mc.encode_png_gray

    def gen(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            keys = (pdf[id_col] % key_mod).astype("int64")
            pdf = pdf.copy()
            pdf["png"] = [
                encode_png_gray(
                    bytes([(7 * int(key) + 13 * k) % 256 for k in range(n_px)]),
                    side,
                    side,
                )
                for key in keys
            ]
            yield pdf[[id_col, "png"]]

    return docs.select(id_col).mapInPandas(gen, schema=f"{id_col} long, png binary")


def image_ahash(records: DataFrame, bytes_col: str = "png", id_col: str = "doc_id") -> DataFrame:
    """Perceptual average-hash over real image bytes: decode each PNG
    with the independent full-filter-spec parser, then aHash — bit k is
    1 iff 64·p(k) > Σp (exact integer comparison, no float mean) — as a
    64-char bit string. Identical images hash identically; the operator
    is the image twin of simhash for text near-dup (bucket by hash →
    candidate groups).

    Scale shape: decode+hash is one Arrow-batched mapInPandas pass —
    per-row work is constant (64 pixels), memory bounded by the batch;
    grouping by the hash string afterwards is a plain keyed aggregation.
    """

    from pyspark import cloudpickle as _cp

    from gcs2postgres_spark.functions import media_codecs as _mc

    _cp.register_pickle_by_value(_mc)
    decode_png = _mc.decode_png

    def hash_batches(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            out_ids, out_hashes = [], []
            for _, row in pdf.iterrows():
                d = decode_png(bytes(row[bytes_col]))
                px = d["pixels"]
                n = len(px)
                total = sum(px)
                bits = "".join("1" if n * p > total else "0" for p in px)
                out_ids.append(row[id_col])
                out_hashes.append(bits)
            yield pd.DataFrame({id_col: out_ids, "ahash": out_hashes})

    return records.mapInPandas(hash_batches, schema=f"{id_col} long, ahash string")
