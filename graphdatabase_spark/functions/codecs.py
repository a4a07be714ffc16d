"""Pure-Python media codecs for the multimodal pipeline's real-codec
hook (multimodal.py `_decode_with_codec`).

This container ships no native media libraries, but two ubiquitous
formats are fully decodable with nothing beyond the standard library:

- **PNG** (RFC 2083 / W3C spec): chunked container, IHDR geometry,
  IDAT = zlib-compressed scanlines with per-row filters
  (None/Sub/Up/Average/Paeth). Decode = inflate + unfilter; encode =
  filter-0 rows + deflate + CRC32. Grayscale (color type 0) and
  truecolor (color type 2), 8-bit — the shapes a feature-extraction
  stage actually consumes.
- **WAV** (RIFF container, PCM): fmt/data chunk walk, 16-bit PCM
  samples via the array module.

Everything is byte-level and deterministic, so decoded output is
value-checkable; the Spark side moves payloads through the same
Arrow-batched ``mapInPandas`` plumbing as the fake GDBF container
(the registry's oracle contract is unchanged — real-format payloads
simply stop raising where they used to hit NotImplementedError).
"""

from __future__ import annotations

import struct
import sys
import zlib
from array import array

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

# channels per PNG color type (8-bit depths only)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def sniff(data: bytes) -> str | None:
    """Identify a payload's container format from its magic bytes."""
    if data[:8] == PNG_MAGIC:
        return "png"
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    return None


# -- PNG ----------------------------------------------------------------


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> dict:
    """Decode an 8-bit grayscale/truecolor PNG: returns ``{"width",
    "height", "color_type", "channels", "pixels"}`` where ``pixels`` is
    one ``bytes`` of raw samples per scanline (filters undone)."""
    if data[:8] != PNG_MAGIC:
        raise ValueError("not a PNG: bad signature")
    pos, ihdr, idat = 8, None, b""
    while pos + 8 <= len(data):
        (length,), ctype = struct.unpack(">I", data[pos:pos + 4]), data[pos + 4:pos + 8]
        chunk = data[pos + 8:pos + 8 + length]
        if len(chunk) != length:
            raise ValueError("truncated PNG chunk")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", chunk)
        elif ctype == b"IDAT":
            idat += chunk
        elif ctype == b"IEND":
            break
        pos += 12 + length  # len + type + data + crc
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    width, height, bit_depth, color_type, _comp, _filt, interlace = ihdr
    if bit_depth != 8 or color_type not in _PNG_CHANNELS or interlace != 0:
        raise NotImplementedError(
            f"PNG variant unsupported by the pure-Python codec: "
            f"depth={bit_depth} color={color_type} interlace={interlace}")
    ch = _PNG_CHANNELS[color_type]
    stride = width * ch
    raw = zlib.decompress(idat)
    if len(raw) != (stride + 1) * height:
        raise ValueError("PNG pixel data length mismatch")
    rows: list[bytes] = []
    prev = bytearray(stride)
    for y in range(height):
        off = y * (stride + 1)
        ftype, line = raw[off], bytearray(raw[off + 1:off + 1 + stride])
        if ftype == 1:    # Sub
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                ul = prev[i - ch] if i >= ch else 0
                line[i] = (line[i] + _paeth(left, prev[i], ul)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unknown PNG filter type {ftype}")
        prev = line
        rows.append(bytes(line))
    return {"width": width, "height": height, "color_type": color_type,
            "channels": ch, "pixels": rows}


def _png_chunk(ctype: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + ctype + payload
            + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF))


def encode_png(rows: list[bytes], width: int, height: int,
               color_type: int = 0) -> bytes:
    """Encode raw 8-bit scanlines as a PNG (filter type 0 per row)."""
    ch = _PNG_CHANNELS[color_type]
    if len(rows) != height or any(len(r) != width * ch for r in rows):
        raise ValueError("scanline geometry does not match width/height")
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + r for r in rows)
    return (PNG_MAGIC + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(raw))
            + _png_chunk(b"IEND", b""))


def resize_png(data: bytes, factor: int) -> bytes:
    """Nearest-neighbor downsample by ``factor`` in both axes,
    re-encoded as PNG — the real-codec form of the resize stage."""
    img = decode_png(data)
    ch = img["channels"]
    out_rows = []
    for y in range(0, img["height"], factor):
        row = img["pixels"][y]
        out = bytearray()
        for x in range(0, img["width"], factor):
            out += row[x * ch:(x + 1) * ch]
        out_rows.append(bytes(out))
    new_w = (img["width"] + factor - 1) // factor
    return encode_png(out_rows, new_w, len(out_rows), img["color_type"])


# -- WAV ----------------------------------------------------------------


def decode_wav(data: bytes) -> dict:
    """Decode a 16-bit PCM WAV: ``{"sample_rate", "n_channels",
    "samples"}`` with samples as an ``array('h')`` (interleaved)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV: bad RIFF/WAVE header")
    pos, fmt, pcm = 12, None, None
    while pos + 8 <= len(data):
        cid, ln = data[pos:pos + 4], struct.unpack("<I", data[pos + 4:pos + 8])[0]
        chunk = data[pos + 8:pos + 8 + ln]
        if len(chunk) != ln:
            raise ValueError("truncated WAV chunk")
        if cid == b"fmt ":
            if ln < 16:
                raise ValueError("WAV fmt chunk too short")
            fmt = struct.unpack("<HHIIHH", chunk[:16])
        elif cid == b"data":
            pcm = chunk
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
    if fmt is None or pcm is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, n_channels, sample_rate, _byte_rate, _align, bits = fmt
    if audio_fmt != 1 or bits != 16:
        raise NotImplementedError(
            f"WAV variant unsupported by the pure-Python codec: "
            f"fmt={audio_fmt} bits={bits}")
    samples = array("h")
    samples.frombytes(pcm[:len(pcm) - (len(pcm) % 2)])
    if sys.byteorder == "big":  # WAV PCM is little-endian on disk
        samples.byteswap()
    return {"sample_rate": sample_rate, "n_channels": n_channels,
            "samples": samples}


def encode_wav(samples: array, sample_rate: int, n_channels: int = 1) -> bytes:
    """Encode interleaved 16-bit PCM samples as a WAV file."""
    if sys.byteorder == "big":  # emit little-endian PCM regardless of host
        samples = array("h", samples)
        samples.byteswap()
    pcm = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, n_channels, sample_rate,
                      sample_rate * n_channels * 2, n_channels * 2, 16)
    body = (b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(pcm)) + pcm)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def resample_wav(data: bytes, factor: int) -> bytes:
    """Decimate by ``factor`` (keep every factor-th frame, all
    channels), re-encoded at the correspondingly lower sample rate."""
    wav = decode_wav(data)
    nch = wav["n_channels"]
    out = array("h")
    for i in range(0, len(wav["samples"]) // nch, factor):
        out.extend(wav["samples"][i * nch:(i + 1) * nch])
    return encode_wav(out, max(1, wav["sample_rate"] // factor), nch)


# -- unified hook -------------------------------------------------------


def decode_media(data: bytes) -> tuple[str, bytes]:
    """Real-codec decode: ``(kind, body)`` where body is the RAW
    decoded content (PNG → concatenated unfiltered scanline samples,
    WAV → PCM bytes) — the same ``(kind, body)`` contract as the GDBF
    structural decode, so the downstream feature/frame/resize stages
    are format-agnostic."""
    fmt = sniff(data)
    if fmt == "png":
        return "image", b"".join(decode_png(data)["pixels"])
    if fmt == "wav":
        return "audio", decode_wav(data)["samples"].tobytes()
    raise ValueError("unrecognized media container")
