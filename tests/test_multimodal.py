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
