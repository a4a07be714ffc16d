"""Corpus-preparation operators: the end-to-end decisions an LLM data
pipeline makes on top of the per-doc analytics (SURVEY.md §2.3
"LLM-data-pipeline extensions"; reference has no counterpart — its
complete text surface is word-count/file-search,
``Assignment1/server.c:88-252``).

- ``dedup_clusters``: near-dup *pairs* promoted to dedup *decisions* —
  connected components over the pair graph, canonical representative =
  min doc_id, ``keep`` flag per doc. This is the operator that actually
  shrinks a corpus; pairs alone don't say which copy survives.
- ``sample_split``: deterministic train/val/test assignment by content-
  independent hash — reproducible across runs, engines, and cluster
  sizes (never ``rand()``: re-running must not reshuffle the split).
- ``top_ngrams``: corpus-wide heavy hitters (bigram document
  frequency) — the boilerplate/contamination scan run before dedup
  threshold tuning.
- ``corpus_prep``: the composed keep-list — language filter + quality
  threshold + exact-dedup survivor + split tag, one DataFrame a
  downstream tokenizer job consumes directly.

Scale notes: everything is built from the already-scale-shaped pieces
(hash groupBys, the shared shingle index, HashMin Pregel over the —
tiny — near-dup pair graph; at 100 TB the pair graph is orders of
magnitude smaller than the corpus, so the CC loop runs on a sliver).
The split/keep joins are all on ``doc_id`` — AQE broadcasts the small
sides (keep-list, split map are 8-byte-key projections).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from graphdatabase_spark.functions import text
from graphdatabase_spark.functions.dedup import (
    NEAR_DUP_THRESHOLD,
    _hashes_cte,
    cached_shingle_hashes,
    near_dup_pairs,
)
from graphdatabase_spark.functions.hashing import md5_int64, md5_int64_sql_duckdb
from graphdatabase_spark.operators import pregel
from graphdatabase_spark.sources.tables import load_table

SPLIT_SALT = "split"
TRAIN_PCT, VAL_PCT = 80, 10  # remainder = test
NGRAM_K = 2
TOP_NGRAMS = 20
QUALITY_THRESHOLD = 0.37  # ≈ median of the synthetic corpus (probed at sf0.01)


# --- dedup_clusters ----------------------------------------------------------

def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, cluster_rep, keep) for EVERY document: connected
    components over the exact near-dup pair graph (Jaccard ≥ 0.5),
    singletons being their own representative.

    The pair graph is built by the inverted-index near-dup operator and
    is tiny relative to the corpus (only docs with a near-duplicate
    appear), so the HashMin Pregel loop iterates over a sliver; the
    final left-join back to all docs is one broadcast-able join."""
    pairs = near_dup_pairs(cached_shingle_hashes(spark, sf_dir))
    edges = pairs.select(F.col("doc1").alias("src"), F.col("doc2").alias("dst"))
    docs = load_table(spark, sf_dir, "documents").select(F.col("doc_id").alias("vid"))
    cc = pregel.connected_components(edges, docs)
    return cc.select(
        F.col("vid").alias("doc_id"),
        F.col("component").alias("cluster_rep"),
        (F.col("vid") == F.col("component")).cast("int").alias("keep"))


ORACLE_DEDUP_CLUSTERS = f"""
WITH RECURSIVE {_hashes_cte()},
cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh_h GROUP BY doc_id),
pr AS (
  SELECT a.doc_id AS doc1, b.doc_id AS doc2, COUNT(*) AS inter
  FROM sh_h a JOIN sh_h b ON a.h = b.h AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT doc1, doc2
  FROM pr JOIN cnt c1 ON c1.doc_id = doc1 JOIN cnt c2 ON c2.doc_id = doc2
  WHERE CAST(inter AS DOUBLE) / (c1.n + c2.n - inter) >= {NEAR_DUP_THRESHOLD}
),
und AS (SELECT doc1 AS a, doc2 AS b FROM pairs UNION SELECT doc2, doc1 FROM pairs),
reach(s, t) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT r.s, u.b FROM reach r JOIN und u ON u.a = r.t
)
SELECT s AS doc_id, MIN(t) AS cluster_rep, CAST(s = MIN(t) AS INT) AS keep
FROM reach GROUP BY s
"""


# --- sample_split ------------------------------------------------------------

def split_col(key: F.Column) -> F.Column:
    """Deterministic percent bucket from a salted md5 of the key —
    content-independent, engine-portable, stable under re-partitioning
    (the reason this is never ``rand(seed)``: Spark's rand is
    partition-dependent, so a repartition would reshuffle the split)."""
    return (md5_int64(key.cast("string"), salt=SPLIT_SALT) % 100).cast("int")


def q_sample_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    pct = split_col(F.col("doc_id"))
    split = (F.when(pct < TRAIN_PCT, "train")
             .when(pct < TRAIN_PCT + VAL_PCT, "val")
             .otherwise("test"))
    return docs.select("doc_id", pct.alias("bucket_pct"), split.alias("split"))


ORACLE_SAMPLE_SPLIT = f"""
SELECT doc_id,
       CAST(h % 100 AS INT) AS bucket_pct,
       CASE WHEN h % 100 < {TRAIN_PCT} THEN 'train'
            WHEN h % 100 < {TRAIN_PCT + VAL_PCT} THEN 'val'
            ELSE 'test' END AS split
FROM (SELECT doc_id,
             {md5_int64_sql_duckdb("CAST(doc_id AS VARCHAR)", salt=SPLIT_SALT)} AS h
      FROM documents)
"""


# --- top_ngrams (corpus heavy hitters) ---------------------------------------

def q_top_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top bigrams by DOCUMENT frequency (shingles are deduped within a
    doc, so the count is "how many docs contain this bigram" — the
    boilerplate signal, robust to one doc repeating a phrase). Map-side
    combined groupBy + TakeOrdered top-k; ties broken by ngram text so
    the result is total-ordered and oracle-stable."""
    docs = load_table(spark, sf_dir, "documents", spread=True).select("text")
    grams = docs.select(F.explode(
        text.shingles_col(text.tokens_col("text"), NGRAM_K)).alias("ngram"))
    return (grams.groupBy("ngram").agg(F.count(F.lit(1)).alias("n_docs"))
            .orderBy(F.desc("n_docs"), F.asc("ngram")).limit(TOP_NGRAMS))


ORACLE_TOP_NGRAMS = f"""
SELECT g AS ngram, COUNT(*) AS n_docs
FROM (SELECT unnest({text.shingles_sql(text.tokens_sql('text'), NGRAM_K)}) AS g
      FROM documents)
GROUP BY g
ORDER BY n_docs DESC, ngram ASC
LIMIT {TOP_NGRAMS}
"""


# --- corpus_prep (the composed keep-list) ------------------------------------

def q_corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The final pre-tokenization keep-list: English docs above the
    quality threshold that survive exact dedup, tagged with their
    train/val/test split. One narrow row per surviving doc — exactly
    what a downstream tokenizer/packer job consumes.

    Plan shape: the quality metrics are per-row expressions (codegen);
    the exact-dedup keep-list and the split map are doc_id projections
    that AQE broadcasts into the joins; nothing here adds a shuffle
    beyond the dedup groupBy."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    quality = text.q_quality_score(spark, sf_dir).select(
        "doc_id", "n_tokens", "quality_score")
    keep = (docs.select("doc_id", F.md5("text").alias("m"))
            .groupBy("m").agg(F.min("doc_id").alias("doc_id"))
            .select("doc_id"))
    split = q_sample_split(spark, sf_dir).select("doc_id", "split")
    return (docs.select("doc_id", "lang")
            .join(keep, "doc_id", "left_semi")
            .join(quality, "doc_id")
            .join(split, "doc_id")
            .filter((F.col("lang") == "en")
                    & (F.col("quality_score") >= QUALITY_THRESHOLD))
            .select("doc_id", "lang", "n_tokens", "quality_score", "split"))


ORACLE_CORPUS_PREP = f"""
WITH qual AS ({text.ORACLE_QUALITY_SCORE}),
keep AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
spl AS ({ORACLE_SAMPLE_SPLIT})
SELECT d.doc_id, d.lang, q.n_tokens, q.quality_score, s.split
FROM documents d
JOIN keep k ON k.doc_id = d.doc_id
JOIN qual q ON q.doc_id = d.doc_id
JOIN spl s ON s.doc_id = d.doc_id
WHERE d.lang = 'en' AND q.quality_score >= {QUALITY_THRESHOLD}
"""


# --- tfidf_top_terms (keyword extraction) ------------------------------------

TFIDF_SCALE = 1_000_000
TFIDF_TOP = 3


def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-``TFIDF_TOP`` characteristic terms per document by an
    INTEGER-exact TF-IDF proxy: ``score = tf * ((N * SCALE) // df)`` —
    monotone in the real tf·idf ranking (idf_proxy is monotone
    decreasing in df, exactly like log(N/df)) but all-integer, so both
    engines rank identically with no float-log ulp risk. Ties break by
    term text: total order, oracle-stable.

    Plan shape at scale: one explode + (doc, term) count shuffle, one
    term-keyed df aggregate joined back (term dictionary ≪ corpus —
    AQE broadcasts it), one per-doc window top-k. No Python anywhere."""
    docs = load_table(spark, sf_dir, "documents", spread=True).select("doc_id", "text")
    n_docs = load_table(spark, sf_dir, "documents").count()
    terms = docs.select("doc_id", F.explode(text.tokens_col("text")).alias("term"))
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(df_, "term").select(
        "doc_id", "term", "tf", "df",
        (F.col("tf") * F.expr(f"({n_docs}L * {TFIDF_SCALE}L) div df")).alias("score"))
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (scored.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= TFIDF_TOP)
            .select("doc_id", "term", "tf", "df", "score", "rk"))


ORACLE_TFIDF_TOP_TERMS = f"""
WITH terms AS (
  SELECT doc_id, unnest({text.tokens_sql('text')}) AS term FROM documents
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY 1, 2),
dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT doc_id, term, tf, df,
         tf * (((SELECT n_docs FROM n) * {TFIDF_SCALE}) // df) AS score
  FROM tf JOIN dfreq USING (term)
)
SELECT doc_id, term, tf, df, CAST(score AS BIGINT) AS score, CAST(rk AS INT) AS rk
FROM (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rk
      FROM scored)
WHERE rk <= {TFIDF_TOP}
"""


QUERIES = {
    "dedup_clusters": q_dedup_clusters,
    "sample_split": q_sample_split,
    "top_ngrams": q_top_ngrams,
    "corpus_prep": q_corpus_prep,
    "tfidf_top_terms": q_tfidf_top_terms,
}

ORACLES = {
    "dedup_clusters": ORACLE_DEDUP_CLUSTERS,
    "sample_split": ORACLE_SAMPLE_SPLIT,
    "top_ngrams": ORACLE_TOP_NGRAMS,
    "corpus_prep": ORACLE_CORPUS_PREP,
    "tfidf_top_terms": ORACLE_TFIDF_TOP_TERMS,
}
