"""Text analytics, dedup, and similarity: oracle parity + semantic
unit tests (LSH recall/precision, simhash Hamming property)."""

import pytest
from pyspark.sql import functions as F

from graphdatabase_spark.functions import dedup, similarity, text

from tests.parity import assert_parity


@pytest.mark.parametrize("name", sorted(text.QUERIES))
def test_text_parity(spark, sf_dir, name):
    assert_parity(text.QUERIES[name](spark, sf_dir), text.ORACLES[name], sf_dir)


@pytest.mark.parametrize("name", sorted(dedup.ORACLES))
def test_dedup_parity(spark, sf_dir, name):
    assert_parity(dedup.QUERIES[name](spark, sf_dir), dedup.ORACLES[name], sf_dir)


@pytest.mark.parametrize("name", sorted(similarity.ORACLES))
def test_similarity_parity(spark, sf_dir, name):
    assert_parity(similarity.QUERIES[name](spark, sf_dir), similarity.ORACLES[name], sf_dir)


def test_minhash_lsh_recall_precision(spark, sf_dir_mid):
    """LSH candidates ∘ exact verification: precision is 1.0 by
    construction; recall vs the exact operator must be high at the
    threshold (32 hashes / 8 bands ⇒ pair-capture prob ≈ 0.99+ at
    s ≥ 0.5... measured here against planted near-dups)."""
    sh = dedup.shingle_hashes(dedup.doc_shingles(spark, sf_dir_mid)).cache()
    exact = {(r["doc1"], r["doc2"]) for r in
             dedup.near_dup_pairs(sh, dedup.NEAR_DUP_THRESHOLD).collect()}
    got = {(r["doc1"], r["doc2"]) for r in
           dedup.q_dedup_minhash_lsh(spark, sf_dir_mid).collect()}
    sh.unpersist()
    assert exact, "test data must contain near-duplicate pairs"
    assert got <= exact  # precision 1.0 (exact verification)
    recall = len(got & exact) / len(exact)
    assert recall >= 0.9, f"recall {recall:.2f} over {len(exact)} true pairs"


def test_simhash_near_dups_are_hamming_close(spark, sf_dir_mid):
    """Near-identical docs (exact Jaccard ≥ 0.8) must land within small
    Hamming distance; random doc pairs must be far — the property that
    makes SimHash usable as a dedup prefilter."""
    sh = dedup.shingle_hashes(dedup.doc_shingles(spark, sf_dir_mid)).cache()
    sims = {r["doc_id"]: r["simhash"] for r in
            dedup.q_dedup_simhash(spark, sf_dir_mid).collect()}
    close = dedup.near_dup_pairs(sh, 0.8).collect()
    sh.unpersist()
    assert close

    def hamming(a, b):
        return bin(a ^ b).count("1")

    near = [hamming(sims[r["doc1"]], sims[r["doc2"]]) for r in close]
    assert max(near) <= 12, f"near-dup Hamming distances too large: {sorted(near)[-5:]}"
    # contrast: an arbitrary unrelated pair should be ~30 bits apart
    ids = sorted(sims)
    far = hamming(sims[ids[1]], sims[ids[2]])
    assert far > 12


def test_ann_lsh_finds_near_neighbors(spark, sf_dir):
    """The ANN result must be a prefix-quality subset: every returned
    neighbor's cosine is exact, and the top-1 exact neighbor is found
    whenever it shares the query's bucket (sanity: result non-empty and
    scores descend)."""
    rows = similarity.q_embedding_ann_lsh(spark, sf_dir).collect()
    assert rows, "query bucket must contain at least one neighbor"
    scores = [r["cos_sim"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_tokens_convention(spark):
    df = spark.createDataFrame([("Hello, World2  x!",)], "text string")
    toks = df.select(text.tokens_col("text").alias("t")).collect()[0]["t"]
    assert toks == ["hello", "world2", "x"]
    sh = df.select(text.shingles_col(text.tokens_col("text"), 2).alias("s")).collect()[0]["s"]
    assert sh == ["hello world2", "world2 x"]
    # fewer tokens than k ⇒ no shingles
    df1 = spark.createDataFrame([("one",)], "text string")
    sh1 = df1.select(text.shingles_col(text.tokens_col("text"), 3).alias("s")).collect()[0]["s"]
    assert sh1 == []
