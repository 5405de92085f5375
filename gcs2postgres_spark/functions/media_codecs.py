"""Real pure-Python media codecs for the multimodal decode seam.

The container ships no PIL/ffmpeg, so operators/multimodal.py's default
codec is a deterministic fake. These are NOT fakes: a spec-conformant
PNG still-image decoder (zlib inflate + all five scanline filters,
8-bit gray/RGB/RGBA) and a WAV (RIFF/PCM) header+sample parser, both
stdlib-only, injectable through ``decode_media(decoder=...)``.

Conformance evidence (tests/test_operators.py): PNG files produced by
the JVM's ImageIO encoder (which uses adaptive per-row filtering, so
Sub/Up/Average/Paeth paths are genuinely exercised) decode to the exact
pixel values that were drawn; WAV files written by the stdlib ``wave``
module parse back sample-for-sample via an independent RIFF walk.

Scale shape: decoders run per-row inside Arrow-batched mapInPandas —
the executor-side cost is the codec itself, the plumbing is identical
to the PIL/ffmpeg deployment."""

from __future__ import annotations

import struct
import zlib

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

# PNG color type → samples per pixel (8-bit depth only)
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def decode_png(data: bytes) -> dict:
    """Decode an 8-bit non-interlaced PNG → dict(width, height, channels,
    pixels: bytes row-major). Implements the full filter spec
    (None/Sub/Up/Average/Paeth, RFC 2083 §6) — required because real
    encoders pick filters adaptively per row."""
    if not data.startswith(_PNG_MAGIC):
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = None
    channels = None
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + body + crc
        if ctype == b"IHDR":
            width, height, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8:
                raise NotImplementedError(f"bit depth {depth} (8 only)")
            if color not in _CHANNELS:
                raise NotImplementedError(f"palette/unknown color type {color}")
            if interlace:
                raise NotImplementedError("interlaced PNG")
            channels = _CHANNELS[color]
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != (stride + 1) * height:
        raise ValueError("IDAT length mismatch")
    out = bytearray(stride * height)
    prev = bytes(stride)
    for r in range(height):
        ftype = raw[r * (stride + 1)]
        line = bytearray(raw[r * (stride + 1) + 1 : (r + 1) * (stride + 1)])
        if ftype == 1:  # Sub
            for i in range(channels, stride):
                line[i] = (line[i] + line[i - channels]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                c = prev[i - channels] if i >= channels else 0
                b = prev[i]
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        elif ftype != 0:
            raise ValueError(f"bad filter type {ftype}")
        out[r * stride : (r + 1) * stride] = line
        prev = line
    return {"width": width, "height": height, "channels": channels, "pixels": bytes(out)}


def decode_wav(data: bytes) -> dict:
    """Parse a RIFF/WAVE file (PCM 8/16-bit) → dict(sample_rate,
    n_channels, n_samples, samples: list of first-channel ints).
    Independent chunk walk — not the stdlib wave reader — so tests that
    write with ``wave`` exercise a second implementation."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    frames = b""
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (clen,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + clen]
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            audio_fmt, n_ch, rate, _byterate, _align, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if audio_fmt != 1:
                raise NotImplementedError(f"non-PCM wav (format {audio_fmt})")
            fmt = (n_ch, rate, bits)
        elif cid == b"data":
            frames = body
    if fmt is None:
        raise ValueError("missing fmt chunk")
    n_ch, rate, bits = fmt
    if bits == 16:
        vals = struct.unpack(f"<{len(frames) // 2}h", frames[: len(frames) // 2 * 2])
    elif bits == 8:
        vals = tuple(b - 128 for b in frames)
    else:
        raise NotImplementedError(f"{bits}-bit PCM")
    first_channel = list(vals[::n_ch])
    return {
        "sample_rate": rate,
        "n_channels": n_ch,
        "n_samples": len(first_channel),
        "samples": first_channel,
    }


def make_real_decoder():
    """Build a decode_payload-compatible codec (same contract as
    multimodal._make_decoder: payload×media_type → payload_bytes/
    checksum/feature) backed by the REAL parsers above. Nested closure →
    cloudpickle ships it by value to executors.

    Features: images → [width, height, channels, mean_intensity/255];
    audio → [n_samples, sample_rate, n_channels, mean_abs_amplitude]."""
    png = decode_png
    wav = decode_wav

    def decode_payload(payload: bytes, media_type: str) -> dict:
        checksum = zlib.crc32(payload)
        if media_type in ("image", "image/png"):
            d = png(payload)
            mean = sum(d["pixels"]) / len(d["pixels"]) / 255.0 if d["pixels"] else 0.0
            feature = [float(d["width"]), float(d["height"]), float(d["channels"]), mean]
        elif media_type in ("audio", "audio/wav"):
            d = wav(payload)
            n = d["n_samples"]
            mean_abs = sum(abs(s) for s in d["samples"]) / n if n else 0.0
            feature = [float(n), float(d["sample_rate"]), float(d["n_channels"]), mean_abs]
        else:
            raise NotImplementedError(f"no real decoder for media_type={media_type!r}")
        return {"payload_bytes": len(payload), "checksum": checksum, "feature": feature}

    return decode_payload


def encode_wav_pcm16(samples, sample_rate: int = 8000) -> bytes:
    """Minimal RIFF/WAVE writer: mono 16-bit PCM. Paired with
    decode_wav (an independent chunk walk, not the stdlib reader) the
    two form a real encode→parse roundtrip for the audio-column
    pipeline tests and the registered wav-energy query."""
    frames = struct.pack(f"<{len(samples)}h", *samples)
    data_len = len(frames)
    hdr = b"RIFF" + struct.pack("<I", 36 + data_len) + b"WAVE"
    fmt = b"fmt " + struct.pack(
        "<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16
    )
    return hdr + fmt + b"data" + struct.pack("<I", data_len) + frames


def encode_png_gray(pixels: bytes, width: int, height: int) -> bytes:
    """Minimal standards-compliant PNG encoder: 8-bit grayscale,
    non-interlaced, filter type 0 on every row, one IDAT, stdlib zlib —
    the jar-free counterpart of decode_png (which handles the FULL
    filter spec, so it reads this encoder's output and any real
    encoder's alike). Used by the multimodal fixtures to build real
    image bytes on executors without PIL/ImageIO."""
    import struct
    import zlib

    if len(pixels) != width * height:
        raise ValueError(f"need {width * height} pixels, got {len(pixels)}")

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)  # gray, 8-bit
    raw = b"".join(
        b"\x00" + pixels[r * width : (r + 1) * width] for r in range(height)
    )
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 9))
        + chunk(b"IEND", b"")
    )
