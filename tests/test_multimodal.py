"""Multimodal binary-column plumbing: oracle parity for metadata and
Arrow-batched feature extraction, frame-sampling fan-out shape, codec
stub behavior."""

import pytest
from pyspark.sql import functions as F

from graphdatabase_spark.functions import multimodal as mm

from tests.parity import assert_parity


@pytest.mark.parametrize("name", sorted(mm.QUERIES))
def test_multimodal_parity(spark, sf_dir, name):
    assert_parity(mm.QUERIES[name](spark, sf_dir), mm.ORACLES[name], sf_dir)


def test_media_table_schema(spark, sf_dir):
    m = mm.media_table(spark, sf_dir)
    assert dict(m.dtypes)["payload"] == "binary"
    assert dict(m.dtypes)["meta"].startswith("struct<n_bytes:int,content_id:bigint,magic_ok:boolean")
    row = m.filter(F.col("doc_id") == 0).collect()[0]
    assert bytes(row["payload"])[:4] == mm.MAGIC
    assert row["meta"]["magic_ok"] is True
    assert row["kind"] == "image"  # doc_id 0 % 3


def test_frame_sampling_shape(spark, sf_dir):
    """Every 4th 64-byte slice; frame bytes must reassemble into the
    original body at those offsets."""
    m = mm.media_table(spark, sf_dir).filter(F.col("doc_id") < 20).cache()
    frames = mm.sample_frames(m, frame_size=64, every=4).collect()
    bodies = {r["doc_id"]: bytes(r["payload"])[5:] for r in m.collect()}
    m.unpersist()
    assert frames
    seen = set()
    for r in frames:
        body = bodies[r["doc_id"]]
        assert r["frame_idx"] % 4 == 0
        assert bytes(r["frame_bytes"]) == body[r["frame_idx"] * 64:(r["frame_idx"] + 1) * 64]
        seen.add(r["doc_id"])
    # every doc with a non-empty body yields at least frame 0
    assert seen == {d for d, b in bodies.items() if b}


def test_codec_stub_raises():
    with pytest.raises(NotImplementedError):
        mm._decode_with_codec(b"GDBF0abc", "image")


def test_fake_decode_roundtrip():
    kind, body = mm._fake_decode(mm.MAGIC + b"2" + b"hello")
    assert kind == "video" and body == b"hello"
    with pytest.raises(ValueError):
        mm._fake_decode(b"XXXX0abc")


def test_resize_downsamples_deterministically(spark, sf_dir):
    m = mm.media_table(spark, sf_dir).filter(F.col("doc_id") < 10).cache()
    small = {r["doc_id"]: bytes(r["payload_small"])
             for r in mm.resize_payloads(m, factor=4).collect()}
    bodies = {r["doc_id"]: bytes(r["payload"])[5:] for r in m.collect()}
    m.unpersist()
    assert small.keys() == bodies.keys()
    for d, body in bodies.items():
        assert small[d] == body[::4]
        assert len(small[d]) <= len(body) // 4 + 1


def test_real_codec_payloads_through_spark_pipeline(spark):
    """REAL media payloads (crafted PNG + WAV, no GDBF container)
    through the actual Arrow/mapInPandas pipeline: features decode via
    the pure-Python codecs, frames slice the decoded body, and resize
    re-encodes a genuinely downsampled PNG/WAV — closing the gap where
    the real-codec branch was only reachable, never driven, from the
    Spark side."""
    from array import array

    from graphdatabase_spark.functions import codecs

    # 4x4 grayscale gradient PNG (filter 0 rows) + 8-sample mono WAV
    rows = [bytes((x * 16 + y * 64) % 256 for x in range(4)) for y in range(4)]
    png = codecs.encode_png(rows, 4, 4, color_type=0)
    samples = array("h", [100, -100, 200, -200, 300, -300, 400, -400])
    wav = codecs.encode_wav(samples, 8000, n_channels=1)
    media = spark.createDataFrame(
        [(1, bytearray(png)), (2, bytearray(wav))],
        "doc_id long, payload binary")

    feats = {r["doc_id"]: r for r in mm.extract_features(media).collect()}
    assert feats[1]["kind"] == "image"
    assert feats[1]["n_bytes"] == 16  # 4x4 decoded samples, not file size
    body = b"".join(rows)
    assert feats[1]["max_byte"] == max(body)
    assert abs(feats[1]["mean_byte"] - sum(body) / 16) < 1e-9
    assert feats[2]["kind"] == "audio"
    assert feats[2]["n_bytes"] == 16  # 8 samples x 2 bytes of raw PCM

    frames = mm.sample_frames(media, frame_size=8, every=1).collect()
    got1 = b"".join(bytes(r["frame_bytes"]) for r in sorted(
        (r for r in frames if r["doc_id"] == 1), key=lambda r: r["frame_idx"]))
    assert got1 == body  # frames reassemble the DECODED pixels
    got2 = b"".join(bytes(r["frame_bytes"]) for r in sorted(
        (r for r in frames if r["doc_id"] == 2), key=lambda r: r["frame_idx"]))
    assert got2 == samples.tobytes()

    small = {r["doc_id"]: r for r in mm.resize_payloads(media, factor=2).collect()}
    out_img = codecs.decode_png(bytes(small[1]["payload_small"]))
    assert (out_img["width"], out_img["height"]) == (2, 2)
    assert out_img["pixels"] == [rows[0][::2], rows[2][::2]]  # true NN downsample
    out_wav = codecs.decode_wav(bytes(small[2]["payload_small"]))
    assert list(out_wav["samples"]) == [100, 200, 300, 400]
    assert out_wav["sample_rate"] == 4000
