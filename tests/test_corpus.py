"""Corpus-preparation operators: oracle parity + the semantic
invariants a training pipeline depends on (cluster soundness, split
determinism/coverage, keep-list consistency)."""

import pytest
from pyspark.sql import functions as F

from graphdatabase_spark.functions import corpus, dedup

from tests.parity import assert_parity


@pytest.mark.parametrize("name", sorted(corpus.ORACLES))
def test_corpus_parity(spark, sf_dir, name):
    assert_parity(corpus.QUERIES[name](spark, sf_dir), corpus.ORACLES[name], sf_dir)


def test_dedup_clusters_soundness(spark, sf_dir_mid):
    """Cluster invariants: the representative is a member of its own
    cluster and the minimum doc_id in it; keep is set exactly on the
    representatives; every near-dup pair lands in one cluster."""
    rows = corpus.q_dedup_clusters(spark, sf_dir_mid).collect()
    rep = {r["doc_id"]: r["cluster_rep"] for r in rows}
    keep = {r["doc_id"] for r in rows if r["keep"] == 1}
    assert all(rep[c] == c for c in set(rep.values()))  # rep maps to itself
    assert all(r <= d for d, r in rep.items())          # rep = min member
    assert keep == set(rep.values())
    pairs = dedup.near_dup_pairs(
        dedup.cached_shingle_hashes(spark, sf_dir_mid)).collect()
    assert pairs, "corpus must contain near-dup pairs"
    assert all(rep[p["doc1"]] == rep[p["doc2"]] for p in pairs)


def test_sample_split_is_deterministic_and_total(spark, sf_dir):
    a = {(r["doc_id"], r["split"]) for r in
         corpus.q_sample_split(spark, sf_dir).collect()}
    b = {(r["doc_id"], r["split"]) for r in
         corpus.q_sample_split(spark, sf_dir).collect()}
    assert a == b  # deterministic across runs
    from graphdatabase_spark.sources.tables import load_table
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert len(a) == n_docs  # total: every doc gets exactly one split
    frac_train = sum(1 for _, s in a if s == "train") / n_docs
    assert 0.6 < frac_train < 0.95  # ~80% modulo hash noise at small n


def test_corpus_prep_respects_all_filters(spark, sf_dir):
    out = corpus.q_corpus_prep(spark, sf_dir).collect()
    assert out, "keep-list must be non-empty"
    assert all(r["lang"] == "en" for r in out)
    assert all(r["quality_score"] >= corpus.QUALITY_THRESHOLD for r in out)
    # survivors are exact-dedup representatives: no two share content
    from graphdatabase_spark.sources.tables import load_table
    docs = load_table(spark, sf_dir, "documents")
    kept_ids = [r["doc_id"] for r in out]
    hashes = (docs.filter(F.col("doc_id").isin(kept_ids))
              .select(F.md5("text").alias("m")).collect())
    assert len(hashes) == len({r["m"] for r in hashes})
