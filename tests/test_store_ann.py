"""The stored ANN index (round-13 verdict item 2): trained quantizer
artifacts committed as versioned store tables, served from the
snapshot read instead of the session cache — train-once / serve-many,
with time travel making index rollback a RESTORE instead of a
retrain. The reference has no index artifacts at all (its store is
0/1 matrix cells, ``secondary_server.c:544-559``); this is the
production shape of the engine's own quantizer training.
"""

from pyspark.sql import functions as F

from graphdatabase_spark.functions import similarity as sim
from graphdatabase_spark.operators import store_queries as sq
import pytest

pytestmark = pytest.mark.slow  # heavyweight integration module: full-suite tier (pyproject.toml)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_stored_serve_equals_cache_serve(spark, sf_dir):
    stored = sq.q_embedding_ivf_stored_topk(spark, sf_dir).collect()
    cached = sim.q_embedding_ivf_trained_topk(spark, sf_dir).collect()
    assert [tuple(r) for r in stored] == [tuple(r) for r in cached]


def test_stored_codebook_versions(spark, sf_dir):
    # latest = the trained centroids, exactly as computed
    latest = _rows(sq.stored_ivf_codebook(spark, sf_dir))
    trained = _rows(sim.trained_centroids(spark, sf_dir)
                    .select(F.col("cell").cast("long"), "cv"))
    assert latest == trained
    # VERSION AS OF 1 = the seed codebook (history keeps the
    # pre-retrain artifact readable)
    seeds = _rows(sq.stored_ivf_codebook(spark, sf_dir, seq=1))
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    expect = _rows(emb.filter(F.col("vec_id") < sim.IVF_CELLS)
                   .select(F.col("vec_id").cast("long").alias("cell"),
                           sim.quantized(F.col("embedding")).alias("cv")))
    assert seeds == expect
    assert seeds != trained   # the Lloyd step actually moved centroids


def test_stored_pq_codebook_roundtrip(spark, sf_dir):
    eng = sq._ann_store_engine(spark, sf_dir)
    got = _rows(eng.snapshot().vertices("pq_codebook", props=True)
                .select((F.col("vid") / sim.PQ_CODES).cast("long").alias("m"),
                        (F.col("vid") % sim.PQ_CODES).cast("long").alias("code"),
                        "csub"))
    want = _rows(sim.trained_pq_codebook(spark, sf_dir))
    assert got == want


def test_index_rollback_is_restore(spark, sf_dir):
    """RESTORE TO VERSION AS OF 1 rolls the serving codebook back to
    the seed quantizer — no retrain; restoring to the last seq brings
    the trained artifacts back (both through the SQL grammar)."""
    eng = sq._ann_store_engine(spark, sf_dir)
    top_seq = eng.snapshot().manifest["seq"]
    try:
        eng.sql("RESTORE gdb TO VERSION AS OF 1")
        rolled = _rows(sq.stored_ivf_codebook(spark, sf_dir))
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        seeds = _rows(emb.filter(F.col("vec_id") < sim.IVF_CELLS)
                      .select(F.col("vec_id").cast("long").alias("cell"),
                              sim.quantized(F.col("embedding")).alias("cv")))
        assert rolled == seeds
    finally:
        # bring the trained artifacts back so the memoized fixture
        # store keeps serving the trained codebook for other tests
        eng.sql(f"RESTORE gdb TO VERSION AS OF {top_seq}")
    assert _rows(sq.stored_ivf_codebook(spark, sf_dir)) == _rows(
        sim.trained_centroids(spark, sf_dir)
        .select(F.col("cell").cast("long"), "cv"))


def test_stored_pq_serve_equals_cache_serve(spark, sf_dir):
    stored = sq.q_embedding_pq_stored_topk(spark, sf_dir).collect()
    cached = sim.q_embedding_pq_trained_topk(spark, sf_dir).collect()
    assert [tuple(r) for r in stored] == [tuple(r) for r in cached]


def test_stored_ivfpq_serve_equals_session_pipeline(spark, sf_dir):
    """The committed coarse + residual codebooks serve the identical
    top-k as the session-computed IVFADC pipeline — the storage
    round-trip of the COMPOSED quantizer (its driver oracle is the
    session pipeline unrolled, so this equality is what makes the
    shared-oracle hash check meaningful)."""
    stored = sq.q_embedding_ivfpq_topk(spark, sf_dir).collect()
    session = sim.q_embedding_ivfpq_topk(spark, sf_dir).collect()
    assert [tuple(r) for r in stored] == [tuple(r) for r in session]
    assert stored   # non-trivial result


def test_stored_ivfpq_codebook_roundtrip(spark, sf_dir):
    got = _rows(sq.stored_ivfpq_codebook(spark, sf_dir)
                .select(F.col("m").cast("long"),
                        F.col("code").cast("long"), "csub"))
    tc = sim.trained_centroids(spark, sf_dir)
    want = _rows(sim.ivfpq_residual_codebook(spark, sf_dir, tc)
                 .select(F.col("m").cast("long"),
                         F.col("code").cast("long"), "csub"))
    assert got == want and got


def test_ivfpq_rollback_is_restore_too(spark, sf_dir):
    """The composed index's rollback story matches its single-index
    twins: RESTORE to before the residual-codebook commit (seq 4)
    removes the ivfpq_codebook table from the catalog; restoring back
    brings the identical serving result — no retrain."""
    eng = sq._ann_store_engine(spark, sf_dir)
    top_seq = eng.snapshot().manifest["seq"]
    before = [tuple(r) for r in
              sq.q_embedding_ivfpq_topk(spark, sf_dir).collect()]
    try:
        eng.sql("RESTORE gdb TO VERSION AS OF 3")
        assert "ivfpq_codebook" not in eng.snapshot().graphs()
        assert "pq_codebook" in eng.snapshot().graphs()
    finally:
        eng.sql(f"RESTORE gdb TO VERSION AS OF {top_seq}")
    assert "ivfpq_codebook" in eng.snapshot().graphs()
    after = [tuple(r) for r in
             sq.q_embedding_ivfpq_topk(spark, sf_dir).collect()]
    assert after == before
