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
    exact_dedup_groups,
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

def exact_dedup_keep(docs: DataFrame) -> DataFrame:
    """The exact-dedup survivor list: one ``doc_id`` per distinct
    text, derived from :func:`dedup.exact_dedup_groups` — the single
    definition of the survivor rule (md5 groupBy, min doc_id wins) —
    so ``corpus_prep``, ``corpus_funnel`` and ``dedup_exact`` can
    never fork on hash choice or tie-break."""
    return exact_dedup_groups(docs).select(F.col("keep_doc_id").alias("doc_id"))


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
    keep = exact_dedup_keep(docs)
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
    AQE broadcasts it), one per-doc window top-k. No Python anywhere.
    The corpus size enters as a broadcast 1-row aggregate (the
    search_bm25 pattern), NOT a driver-side .count() — the builder
    stays lazy and no extra scan job runs per invocation."""
    docs = load_table(spark, sf_dir, "documents", spread=True).select("doc_id", "text")
    n_docs = (load_table(spark, sf_dir, "documents")
              .agg(F.count(F.lit(1)).alias("__n")))
    terms = docs.select("doc_id", F.explode(text.tokens_col("text")).alias("term"))
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(df_, "term").crossJoin(F.broadcast(n_docs)).select(
        "doc_id", "term", "tf", "df",
        (F.col("tf") * F.expr(f"(__n * {TFIDF_SCALE}L) div df")).alias("score"))
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


# --- contamination_check (benchmark decontamination scan) --------------------

# The "benchmark" here is a deterministic corpus slice (doc_id % 100 ==
# BENCH_MOD); in production it's the eval sets the training corpus must
# not leak. A doc is contaminated when ≥ CONTAM_THRESHOLD of its
# shingles appear anywhere in the benchmark — the n-gram-overlap
# decontamination rule used by large-corpus pipelines.
BENCH_MOD = 7
CONTAM_THRESHOLD = 0.1


def q_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_shingles, n_shared, overlap, contaminated) for every
    corpus doc sharing ≥ 1 shingle hash with the benchmark slice.

    Plan shape at 100 TB: the benchmark shingle set is tiny relative to
    the corpus → distinct once and broadcast; the corpus side is the
    session-shared shingle index (no re-tokenization), so the scan is
    one broadcast-hash semi join + two map-side-combined aggregates —
    the corpus is never self-joined and never shuffled on text."""
    hashes = cached_shingle_hashes(spark, sf_dir)
    corpus = hashes.filter(F.col("doc_id") % 100 != BENCH_MOD)
    bench_h = (hashes.filter(F.col("doc_id") % 100 == BENCH_MOD)
               .select("h").distinct())
    totals = corpus.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    shared = (corpus.join(F.broadcast(bench_h), "h")
              .groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shared")))
    overlap = F.col("n_shared").cast("double") / F.col("n_shingles")
    return (shared.join(totals, "doc_id")
            .select("doc_id", "n_shingles", "n_shared", overlap.alias("overlap"),
                    (overlap >= CONTAM_THRESHOLD).cast("int").alias("contaminated")))


ORACLE_CONTAMINATION_CHECK = f"""
WITH {_hashes_cte()},
bench AS (SELECT DISTINCT h FROM sh_h WHERE doc_id % 100 = {BENCH_MOD}),
tot AS (SELECT doc_id, COUNT(*) AS n_shingles FROM sh_h
        WHERE doc_id % 100 <> {BENCH_MOD} GROUP BY doc_id),
shr AS (SELECT s.doc_id, COUNT(*) AS n_shared FROM sh_h s JOIN bench USING (h)
        WHERE s.doc_id % 100 <> {BENCH_MOD} GROUP BY s.doc_id)
SELECT doc_id, n_shingles, n_shared,
       CAST(n_shared AS DOUBLE) / n_shingles AS overlap,
       CAST(CAST(n_shared AS DOUBLE) / n_shingles >= {CONTAM_THRESHOLD} AS INT) AS contaminated
FROM shr JOIN tot USING (doc_id)
"""


# --- quality_repetition (Gopher-style repetition signals) --------------------

REP_K = 3  # n-gram order for the repetition scan


def _raw_grams_col(toks: F.Column, k: int = REP_K) -> F.Column:
    """NON-distinct k-gram list (unlike text.shingles_col, duplicates
    are the signal here)."""
    idx = F.when(F.size(toks) >= k, F.sequence(F.lit(1), F.size(toks) - (k - 1))) \
        .otherwise(F.array().cast("array<int>"))
    return F.transform(idx, lambda i: F.concat_ws(
        " ", *[F.element_at(toks, i + j) for j in range(k)]))


def _raw_grams_sql(toks_expr: str, k: int = REP_K) -> str:
    joined = " || ' ' || ".join(f"__T__[i+{j}]" if j else "__T__[i]" for j in range(k))
    sql = (f"list_transform(range(1, greatest(len(__T__) - {k - 1}, 0) + 1), "
           f"i -> {joined})")
    return sql.replace("__T__", f"({toks_expr})")


def q_quality_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc repetition quality signals (the Gopher/MassiveText
    repetition filters): duplicate-3-gram fraction and the top
    3-gram's share of all 3-grams. High values flag boilerplate,
    templated spam, and decode loops.

    All-integer counts divided once in double (identical IEEE result in
    both engines). Plan: explode + one (doc, gram) count shuffle + one
    per-doc aggregate — same shape as TF-IDF's tf stage; no Python."""
    docs = load_table(spark, sf_dir, "documents", spread=True).select("doc_id", "text")
    grams = docs.select("doc_id", F.explode(
        _raw_grams_col(text.tokens_col("text"))).alias("gram"))
    tf = grams.groupBy("doc_id", "gram").agg(F.count(F.lit(1)).alias("c"))
    return (tf.groupBy("doc_id")
            .agg(F.sum("c").alias("n_grams"),
                 F.count(F.lit(1)).alias("n_distinct"),
                 F.max("c").alias("top_gram_n"))
            .select("doc_id", "n_grams", "n_distinct", "top_gram_n",
                    (F.lit(1.0) - F.col("n_distinct").cast("double") / F.col("n_grams")).alias("dup_gram_frac"),
                    (F.col("top_gram_n").cast("double") / F.col("n_grams")).alias("top_gram_frac")))


ORACLE_QUALITY_REPETITION = f"""
WITH e AS (
  SELECT doc_id, unnest({_raw_grams_sql(text.tokens_sql('text'))}) AS gram
  FROM documents
),
tf AS (SELECT doc_id, gram, COUNT(*) AS c FROM e GROUP BY 1, 2)
SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_grams, COUNT(*) AS n_distinct, MAX(c) AS top_gram_n,
       1.0 - CAST(COUNT(*) AS DOUBLE) / CAST(SUM(c) AS BIGINT) AS dup_gram_frac,
       CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS BIGINT) AS top_gram_frac
FROM tf GROUP BY doc_id
"""


# --- corpus_histogram (corpus composition report) ----------------------------

HIST_BUCKET_CHARS = 50


def q_corpus_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition: doc counts + char/token mass per (source,
    lang, length bucket) — the reporting rollup every corpus build
    publishes alongside the data. One map-side-combined aggregate over
    per-row expressions; no joins, no Python."""
    docs = load_table(spark, sf_dir, "documents").select(
        "source", "lang", "n_chars",
        F.size(text.tokens_col("text")).alias("n_tokens"))
    bucket = (F.floor(F.col("n_chars") / HIST_BUCKET_CHARS) * HIST_BUCKET_CHARS).cast("long")
    return (docs.groupBy("source", "lang", bucket.alias("len_bucket"))
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_chars").alias("total_chars"),
                 F.sum("n_tokens").alias("total_tokens")))


ORACLE_CORPUS_HISTOGRAM = f"""
SELECT source, lang,
       CAST(FLOOR(n_chars / {HIST_BUCKET_CHARS}) * {HIST_BUCKET_CHARS} AS BIGINT) AS len_bucket,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(len({text.tokens_sql('text')})) AS BIGINT) AS total_tokens
FROM documents
GROUP BY 1, 2, 3
"""


# --- sequence_pack (concat-and-chunk packing plan) ---------------------------

SEQ_LEN = 512
PACK_SHARDS = 8


def q_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The packing plan a tokenizer job executes: docs are concatenated
    in deterministic order within a shard and chunked into fixed
    ``SEQ_LEN``-token training sequences; each doc's row says which
    sequence it starts in and at what offset (GPT-style
    concat-and-chunk, no padding).

    Scale shape: the only ordering is WITHIN a shard (doc_id % shards)
    — one window per shard partition, embarrassingly parallel across
    shards, never a global sort. At 100 TB you raise ``PACK_SHARDS`` to
    ~total_tokens/seq_len/1e6 so each shard's running sum stays a
    single-task-friendly slice; packing stays reproducible because
    shard assignment and intra-shard order are content-independent."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", (F.col("doc_id") % PACK_SHARDS).alias("shard"),
        F.size(text.tokens_col("text")).alias("n_tokens"))
    w = (Window.partitionBy("shard").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return docs.select(
        "doc_id", "shard", "n_tokens",
        (cum_before / SEQ_LEN).cast("long").alias("seq_id"),
        (cum_before % SEQ_LEN).cast("long").alias("seq_offset"))


ORACLE_SEQUENCE_PACK = f"""
WITH t AS (
  SELECT doc_id, doc_id % {PACK_SHARDS} AS shard,
         len({text.tokens_sql('text')}) AS n_tokens
  FROM documents
),
c AS (
  SELECT *, CAST(COALESCE(SUM(n_tokens) OVER (
              PARTITION BY shard ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
  FROM t
)
SELECT doc_id, shard, CAST(n_tokens AS BIGINT) AS n_tokens,
       cum_before // {SEQ_LEN} AS seq_id,
       cum_before % {SEQ_LEN} AS seq_offset
FROM c
"""


QUERIES = {
    "dedup_clusters": q_dedup_clusters,
    "sample_split": q_sample_split,
    "top_ngrams": q_top_ngrams,
    "corpus_prep": q_corpus_prep,
    "tfidf_top_terms": q_tfidf_top_terms,
    "contamination_check": q_contamination_check,
    "quality_repetition": q_quality_repetition,
    "corpus_histogram": q_corpus_histogram,
    "sequence_pack": q_sequence_pack,
}

ORACLES = {
    "dedup_clusters": ORACLE_DEDUP_CLUSTERS,
    "sample_split": ORACLE_SAMPLE_SPLIT,
    "top_ngrams": ORACLE_TOP_NGRAMS,
    "corpus_prep": ORACLE_CORPUS_PREP,
    "tfidf_top_terms": ORACLE_TFIDF_TOP_TERMS,
    "contamination_check": ORACLE_CONTAMINATION_CHECK,
    "quality_repetition": ORACLE_QUALITY_REPETITION,
    "corpus_histogram": ORACLE_CORPUS_HISTOGRAM,
    "sequence_pack": ORACLE_SEQUENCE_PACK,
}
