"""Crafted-payload unit tests for the pure-Python media codec layer
(graphdatabase_spark/functions/codecs.py).

Strategy: build payloads bottom-up with struct/zlib so every byte is
controlled, then check decode round-trips bit-exactly.  For PNG, a
local *filtering* encoder applies each filter type (0-4) forward so
decode_png's unfilter loops are exercised against known pixels for
both grayscale and truecolor.  No Spark session required.
"""

from __future__ import annotations

import struct
import zlib
from array import array

import pytest

from graphdatabase_spark.functions import codecs
from graphdatabase_spark.functions.codecs import (
    PNG_MAGIC,
    decode_media,
    decode_png,
    decode_wav,
    encode_png,
    encode_wav,
    resample_wav,
    resize_png,
    sniff,
)


# -- helpers -------------------------------------------------------------


def _png_chunk(ctype: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + ctype + payload
            + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF))


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _filter_row(ftype: int, line: bytes, prev: bytes, ch: int) -> bytes:
    """Apply PNG filter `ftype` forward (spec section 6) to raw samples."""
    out = bytearray(len(line))
    for i in range(len(line)):
        left = line[i - ch] if i >= ch else 0
        up = prev[i]
        ul = prev[i - ch] if i >= ch else 0
        if ftype == 0:
            pred = 0
        elif ftype == 1:
            pred = left
        elif ftype == 2:
            pred = up
        elif ftype == 3:
            pred = (left + up) >> 1
        elif ftype == 4:
            pred = _paeth(left, up, ul)
        else:
            raise AssertionError(ftype)
        out[i] = (line[i] - pred) & 0xFF
    return bytes(out)


def make_png(rows: list[bytes], width: int, height: int, color_type: int,
             filters: list[int]) -> bytes:
    """Encode with an explicit per-row filter type (the shipped
    encode_png only emits filter 0; tests need 1-4 on the wire)."""
    ch = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
    prev = bytes(width * ch)
    raw = bytearray()
    for r, ft in zip(rows, filters):
        raw.append(ft)
        raw += _filter_row(ft, r, prev, ch)
        prev = r
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (PNG_MAGIC + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _png_chunk(b"IEND", b""))


def _pixels(w: int, h: int, ch: int) -> list[bytes]:
    # deterministic, non-trivial gradient with wraparound
    return [bytes(((x * 7 + y * 13 + c * 29) % 256)
                  for x in range(w) for c in range(ch))
            for y in range(h)]


def make_wav(samples: list[int], rate: int = 8000, nch: int = 1,
             extra_chunk: bytes | None = None) -> bytes:
    pcm = array("h", samples).tobytes()
    fmt = struct.pack("<HHIIHH", 1, nch, rate, rate * nch * 2, nch * 2, 16)
    body = b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
    if extra_chunk is not None:
        body += extra_chunk
    body += b"data" + struct.pack("<I", len(pcm)) + pcm
    return b"RIFF" + struct.pack("<I", len(body)) + body


# -- sniff ---------------------------------------------------------------


def test_sniff():
    assert sniff(make_png(_pixels(2, 2, 1), 2, 2, 0, [0, 0])) == "png"
    assert sniff(make_wav([1, 2, 3])) == "wav"
    assert sniff(b"GDBF0hello") is None
    assert sniff(b"") is None
    assert sniff(b"RIFFxxxxAVI ") is None  # RIFF but not WAVE


# -- PNG decode: every filter type, both color types ---------------------


@pytest.mark.parametrize("color_type,ch", [(0, 1), (2, 3)])
@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_png_filter_roundtrip(color_type, ch, ftype):
    w, h = 5, 4
    rows = _pixels(w, h, ch)
    data = make_png(rows, w, h, color_type, [ftype] * h)
    img = decode_png(data)
    assert (img["width"], img["height"]) == (w, h)
    assert img["channels"] == ch
    assert img["pixels"] == rows


def test_png_mixed_filters():
    w, h, ch = 7, 5, 3
    rows = _pixels(w, h, ch)
    data = make_png(rows, w, h, 2, [0, 1, 2, 3, 4])
    assert decode_png(data)["pixels"] == rows


def test_png_encode_decode_roundtrip():
    w, h = 6, 3
    rows = _pixels(w, h, 3)
    assert decode_png(encode_png(rows, w, h, 2))["pixels"] == rows


def test_png_errors():
    with pytest.raises(ValueError, match="bad signature"):
        decode_png(b"not a png at all")
    good = make_png(_pixels(3, 3, 1), 3, 3, 0, [0, 0, 0])
    # cut IEND (12B) + IDAT crc (4B) + 4 bytes of IDAT payload
    with pytest.raises(ValueError, match="truncated"):
        decode_png(good[:-20])
    # 16-bit depth is an unsupported variant, not a data error
    ihdr16 = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    bad = (PNG_MAGIC + _png_chunk(b"IHDR", ihdr16)
           + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 10))
           + _png_chunk(b"IEND", b""))
    with pytest.raises(NotImplementedError):
        decode_png(bad)
    # pixel data shorter than geometry demands
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0)
    short = (PNG_MAGIC + _png_chunk(b"IHDR", ihdr)
             + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 5))
             + _png_chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="length mismatch"):
        decode_png(short)


def test_resize_png_geometry():
    w, h = 7, 5
    rows = _pixels(w, h, 3)
    out = decode_png(resize_png(make_png(rows, w, h, 2, [0] * h), 2))
    # ceil(7/2)=4 wide, ceil(5/2)=3 tall, pixels = every 2nd sample
    assert (out["width"], out["height"]) == (4, 3)
    for oy, y in enumerate(range(0, h, 2)):
        expect = b"".join(rows[y][x * 3:(x + 1) * 3] for x in range(0, w, 2))
        assert out["pixels"][oy] == expect


def test_resize_png_identity():
    w, h = 4, 4
    rows = _pixels(w, h, 1)
    out = decode_png(resize_png(make_png(rows, w, h, 0, [1] * h), 1))
    assert out["pixels"] == rows


# -- WAV -----------------------------------------------------------------


def test_wav_decode_roundtrip():
    samples = [0, 100, -100, 32767, -32768, 7]
    wav = decode_wav(make_wav(samples, rate=44100, nch=2))
    assert wav["sample_rate"] == 44100
    assert wav["n_channels"] == 2
    assert list(wav["samples"]) == samples


def test_wav_odd_length_chunk_walk():
    """A 3-byte odd-length chunk before `data` must be word-aligned
    past, not desync the walk."""
    odd = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"  # pad byte
    samples = [5, -5, 123]
    wav = decode_wav(make_wav(samples, extra_chunk=odd))
    assert list(wav["samples"]) == samples


def test_wav_encode_decode_roundtrip():
    samples = array("h", [1, -2, 3, -4])
    wav = decode_wav(encode_wav(samples, 16000, n_channels=1))
    assert wav["samples"] == samples
    assert wav["sample_rate"] == 16000


def test_wav_errors():
    with pytest.raises(ValueError, match="RIFF/WAVE"):
        decode_wav(b"nope")
    good = make_wav([1, 2, 3, 4])
    with pytest.raises(ValueError, match="truncated WAV chunk"):
        decode_wav(good[:-3])  # data chunk declares more than remains
    # fmt chunk shorter than the 16-byte PCM header → ValueError, not struct.error
    short_fmt = (b"RIFF" + struct.pack("<I", 4 + 8 + 8) + b"WAVE"
                 + b"fmt " + struct.pack("<I", 8) + b"\x00" * 8
                 + b"data" + struct.pack("<I", 0))
    with pytest.raises(ValueError, match="fmt chunk too short"):
        decode_wav(short_fmt)
    # float PCM (fmt=3) is unsupported, not corrupt
    pcm = array("h", [1]).tobytes()
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 16000, 2, 16)
    body = (b"WAVEfmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", len(pcm)) + pcm)
    with pytest.raises(NotImplementedError):
        decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
    # missing data chunk
    body = b"WAVEfmt " + struct.pack("<I", 16) + struct.pack(
        "<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    with pytest.raises(ValueError, match="missing fmt/data"):
        decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)


def test_resample_wav_decimation():
    # stereo: frames (L,R); keep every 2nd frame, halve the rate
    samples = [10, -10, 20, -20, 30, -30, 40, -40]
    out = decode_wav(resample_wav(make_wav(samples, rate=8000, nch=2), 2))
    assert list(out["samples"]) == [10, -10, 30, -30]
    assert out["sample_rate"] == 4000
    assert out["n_channels"] == 2


# -- unified hook + multimodal error contract ----------------------------


def test_decode_media_dispatch():
    rows = _pixels(3, 2, 1)
    kind, body = decode_media(make_png(rows, 3, 2, 0, [0, 0]))
    assert kind == "image"
    assert body == b"".join(rows)
    kind, body = decode_media(make_wav([1, 2]))
    assert kind == "audio"
    assert body == array("h", [1, 2]).tobytes()
    with pytest.raises(ValueError):
        decode_media(b"ZZZZZZZZZZZZ")


def test_fake_decode_routes_real_formats():
    """multimodal._fake_decode: GDBF → structural parse, sniffable real
    media → codec decode, anything else → ValueError (pinned)."""
    from graphdatabase_spark.functions.multimodal import MAGIC, _fake_decode

    kind, body = _fake_decode(MAGIC + b"0payload")
    assert kind == "image" and body == b"payload"
    kind, body = _fake_decode(make_wav([9, -9]))
    assert kind == "audio" and body == array("h", [9, -9]).tobytes()
    with pytest.raises(ValueError):
        _fake_decode(b"bad magic bytes here")
