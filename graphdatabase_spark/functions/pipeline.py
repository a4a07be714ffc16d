"""Pipeline-governance operators: the corpus-engineering steps that sit
AROUND the per-doc analytics in a production LLM data pipeline — PII /
blocklist scrubbing, substring-level (chunk) dedup, deterministic
domain mixing, filter-funnel observability, and IVF retraining (one
k-means step). SURVEY.md §2.3 "LLM-data-pipeline extensions"; the
reference's complete text surface is word-count / file-search
(``Assignment1/server.c:88-252``) — these are north-star extensions.

Everything here is built-in Catalyst expressions (regexp / higher-order
array functions / hash groupBys) — JVM-side, whole-stage codegen, no
Python row paths. Each operator documents its 100 TB plan shape inline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphdatabase_spark.functions import similarity, text
from graphdatabase_spark.functions.hashing import md5_int64, md5_int64_sql_duckdb
from graphdatabase_spark.sources.tables import load_table

# --- pii_scrub ---------------------------------------------------------------

# Patterns are RE2/Java-regex common subset (no lookaround, no
# backrefs) so Spark and the SQL oracle compile them identically.  The
# synthetic corpus contains no digits or addresses, so the registry
# instance includes one corpus-marker pattern that DOES fire on the
# testdata — exercising the count + redact path end-to-end on real
# rows; the true PII regexes are pinned by unit tests on crafted rows
# (tests/test_pipeline.py).
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
    "ip": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "marker": r"\bvalue\b",
}
REDACT = "[PII]"


def scrub_frame(docs: DataFrame,
                patterns: dict[str, str] = PII_PATTERNS) -> DataFrame:
    """Apply the PII scan + redaction projection to any (doc_id, text)
    frame: one match count per pattern (counted independently on the
    original text) and the redacted text's length + md5 (patterns
    applied in dict order)."""
    clean = F.col("text")
    for pat in patterns.values():
        clean = F.regexp_replace(clean, pat, REDACT)
    counts = [F.regexp_count("text", F.lit(pat)).alias(f"n_{name}")
              for name, pat in patterns.items()]
    return docs.select(
        "doc_id", *counts,
        F.length(clean).alias("clean_len"),
        F.md5(clean).alias("clean_md5"))


def q_pii_scrub(spark: SparkSession, sf_dir: str,
                patterns: dict[str, str] = PII_PATTERNS) -> DataFrame:
    """Per-doc PII scan + redaction over the documents table (see
    :func:`scrub_frame` for the projection semantics).

    Plan shape at 100 TB: a pure per-row projection — no shuffle, no
    join, no Python; regexps run inside whole-stage codegen and the
    scan's column pruning reads only (doc_id, text). The md5 keeps the
    redacted text value-checkable without hauling full strings through
    the comparator. In production the pattern dict is the real PII list
    (emails / phones / national ids / IP addresses)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return scrub_frame(docs, patterns)


def _oracle_pii_scrub(patterns: dict[str, str] = PII_PATTERNS) -> str:
    clean = "text"
    for pat in patterns.values():
        clean = f"regexp_replace({clean}, '{pat}', '{REDACT}', 'g')"
    counts = ",\n       ".join(
        f"CAST(len(regexp_extract_all(text, '{pat}')) AS INT) AS n_{name}"
        for name, pat in patterns.items())
    return f"""
SELECT doc_id,
       {counts},
       CAST(length({clean}) AS INT) AS clean_len,
       md5({clean}) AS clean_md5
FROM documents
"""


ORACLE_PII_SCRUB = _oracle_pii_scrub()


# --- chunk_dedup (substring-level exact dedup) -------------------------------

# Non-overlapping CHUNK_TOKS-token chunks; a chunk is "duplicated" when
# its text occurs >= 2 times anywhere in the corpus (within- or
# cross-doc) — the Lee et al. 2021 "Deduplicating Training Data"
# substring signal at paragraph granularity.
CHUNK_TOKS = 8


def chunk_hashes(docs: DataFrame) -> DataFrame:
    """(doc_id, h): one row per non-overlapping ``CHUNK_TOKS``-token
    chunk, h = 60-bit md5 of the space-joined chunk text. Duplicates
    within a doc are kept — repetition is part of the signal."""
    toks = text.tokens_col("text")
    n_chunks = F.floor(F.size(toks) / CHUNK_TOKS).cast("int")
    idx = F.when(n_chunks >= 1, F.sequence(F.lit(0), n_chunks - 1)) \
        .otherwise(F.array().cast("array<int>"))
    chunks = F.transform(
        idx, lambda i: F.array_join(F.slice(toks, i * CHUNK_TOKS + 1, CHUNK_TOKS), " "))
    return docs.select("doc_id", F.explode(chunks).alias("chunk")) \
        .select("doc_id", md5_int64(F.col("chunk")).alias("h"))


def q_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_chunks, n_dup_chunks, dup_chunk_frac) for every doc
    with ≥ 1 full chunk: the fraction of a doc's chunks whose text
    occurs ≥ 2 times in the corpus.

    Plan shape at 100 TB: the chunk index is ~n_tokens/CHUNK_TOKS rows
    of (doc_id, int64) — hashes shuffle, never text. Two hash-keyed
    aggregates (chunk-occurrence count, per-doc rollup) + one join on
    the hash — the same shape as the shingle inverted index, and like
    it this never self-joins the corpus. Chunks that explode in
    frequency (boilerplate) only widen one aggregate row, not a join."""
    docs = load_table(spark, sf_dir, "documents", spread=True).select("doc_id", "text")
    ch = chunk_hashes(docs)
    occ = ch.groupBy("h").agg(F.count(F.lit(1)).alias("occ"))
    dup = (F.col("occ") >= 2).cast("int")
    return (ch.join(occ, "h")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_chunks"),
                 F.sum(dup).alias("n_dup_chunks"))
            .select("doc_id", "n_chunks", "n_dup_chunks",
                    (F.col("n_dup_chunks").cast("double") / F.col("n_chunks"))
                    .alias("dup_chunk_frac")))


_CHUNK_TXT_SQL = f"array_to_string(toks[i*{CHUNK_TOKS}+1 : i*{CHUNK_TOKS}+{CHUNK_TOKS}], ' ')"

ORACLE_CHUNK_DEDUP = f"""
WITH t AS (SELECT doc_id, {text.tokens_sql('text')} AS toks FROM documents),
ch AS (
  SELECT doc_id, toks,
         unnest(range(0, CAST(len(toks) // {CHUNK_TOKS} AS BIGINT))) AS i
  FROM t
),
h AS (SELECT doc_id, {md5_int64_sql_duckdb(_CHUNK_TXT_SQL)} AS h FROM ch),
occ AS (SELECT h, COUNT(*) AS occ FROM h GROUP BY h)
SELECT doc_id, COUNT(*) AS n_chunks,
       CAST(SUM(CASE WHEN occ >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
       CAST(SUM(CASE WHEN occ >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS dup_chunk_frac
FROM h JOIN occ USING (h)
GROUP BY doc_id
"""


# --- domain_mix (deterministic stratified down/up-weighting) -----------------

# Per-source sampling rates — the "data mixing" step that rebalances
# corpus composition before training (e.g. downweight crawl relative to
# curated sources). Tier = source number mod 4 keeps the demo rule
# content-independent; production passes an explicit source→pct map.
MIX_SALT = "mix"
MIX_PCTS = (100, 50, 25, 10)


def q_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, keep_pct, n_docs, n_kept, tokens_kept): the realized
    sampling plan after deterministic per-source down-sampling. A doc
    is kept iff its salted content-independent md5 bucket falls below
    the source's target rate — reproducible across runs, engines, and
    partitionings (never ``rand()``), so the mixed corpus is stable
    and auditable.

    Plan shape at 100 TB: one scan, per-row hash + CASE expressions,
    one map-side-combined aggregate keyed by source (tiny key space) —
    no join, no second pass."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.size(text.tokens_col("text")).alias("n_toks"))
    # Full numeric suffix, overflow-safe: try_cast -> NULL for
    # non-numeric/oversized suffixes, which the when-chain routes to
    # the bottom tier — the identical TRY_CAST/ELSE semantics the
    # oracle uses, so the two can't diverge on exotic source ids.
    tier = F.expr("try_cast(substring(source, 4) AS BIGINT)") % 4
    pct = (F.when(tier == 0, MIX_PCTS[0]).when(tier == 1, MIX_PCTS[1])
           .when(tier == 2, MIX_PCTS[2]).otherwise(MIX_PCTS[3]))
    kept = (md5_int64(F.col("doc_id").cast("string"), salt=MIX_SALT) % 100 < pct) \
        .cast("int")
    return (docs.select("source", pct.cast("int").alias("keep_pct"),
                        kept.alias("kept"), "n_toks")
            .groupBy("source", "keep_pct")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("kept").alias("n_kept"),
                 F.sum(F.col("kept") * F.col("n_toks")).alias("tokens_kept")))


ORACLE_DOMAIN_MIX = f"""
WITH t AS (
  SELECT source,
         CAST(CASE TRY_CAST(substr(source, 4) AS BIGINT) % 4
              WHEN 0 THEN {MIX_PCTS[0]} WHEN 1 THEN {MIX_PCTS[1]}
              WHEN 2 THEN {MIX_PCTS[2]} ELSE {MIX_PCTS[3]} END AS INT) AS keep_pct,
         CASE WHEN {md5_int64_sql_duckdb("CAST(doc_id AS VARCHAR)", salt=MIX_SALT)} % 100
                   < CASE TRY_CAST(substr(source, 4) AS BIGINT) % 4
                     WHEN 0 THEN {MIX_PCTS[0]} WHEN 1 THEN {MIX_PCTS[1]}
                     WHEN 2 THEN {MIX_PCTS[2]} ELSE {MIX_PCTS[3]} END
              THEN 1 ELSE 0 END AS kept,
         len({text.tokens_sql('text')}) AS n_toks
  FROM documents
)
SELECT source, keep_pct, COUNT(*) AS n_docs,
       CAST(SUM(kept) AS BIGINT) AS n_kept,
       CAST(SUM(kept * n_toks) AS BIGINT) AS tokens_kept
FROM t GROUP BY source, keep_pct
"""


# --- corpus_funnel (filter-pipeline observability) ---------------------------

FUNNEL_MIN_CHARS = 120  # length gate (~p10 of the synthetic corpus)


def q_corpus_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row filter funnel: how many docs survive each CUMULATIVE
    stage of the standard quality pipeline — total → lang filter →
    length gate → quality threshold → exact-dedup survivor. The
    observability report every corpus build publishes so a mis-tuned
    filter (or a broken upstream feed) is visible as a cliff between
    stages.

    Plan shape at 100 TB: per-row flag expressions + ONE global
    conditional-sum aggregate (map-side combined into a single row);
    the only join is the exact-dedup keep-list — a doc_id projection
    AQE broadcasts. Same single-scan shape regardless of corpus size."""
    from graphdatabase_spark.functions.corpus import QUALITY_THRESHOLD, exact_dedup_keep

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars", "text")
    quality = text.q_quality_score(spark, sf_dir).select("doc_id", "quality_score")
    keep = exact_dedup_keep(docs).select("doc_id", F.lit(1).alias("is_keep"))
    flags = docs.join(quality, "doc_id").join(keep, "doc_id", "left")
    s1 = F.col("lang") == "en"
    s2 = s1 & (F.col("n_chars") >= FUNNEL_MIN_CHARS)
    s3 = s2 & (F.col("quality_score") >= QUALITY_THRESHOLD)
    s4 = s3 & F.col("is_keep").isNotNull()
    return flags.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(s1.cast("long")).alias("n_lang"),
        F.sum(s2.cast("long")).alias("n_len"),
        F.sum(s3.cast("long")).alias("n_quality"),
        F.sum(s4.cast("long")).alias("n_dedup"))


def _oracle_corpus_funnel() -> str:
    from graphdatabase_spark.functions.corpus import QUALITY_THRESHOLD

    return f"""
WITH qual AS ({text.ORACLE_QUALITY_SCORE}),
keep AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
f AS (
  SELECT d.doc_id,
         CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS s1,
         CASE WHEN d.lang = 'en' AND d.n_chars >= {FUNNEL_MIN_CHARS} THEN 1 ELSE 0 END AS s2,
         CASE WHEN d.lang = 'en' AND d.n_chars >= {FUNNEL_MIN_CHARS}
                   AND q.quality_score >= {QUALITY_THRESHOLD} THEN 1 ELSE 0 END AS s3,
         CASE WHEN d.lang = 'en' AND d.n_chars >= {FUNNEL_MIN_CHARS}
                   AND q.quality_score >= {QUALITY_THRESHOLD}
                   AND k.doc_id IS NOT NULL THEN 1 ELSE 0 END AS s4
  FROM documents d
  JOIN qual q ON q.doc_id = d.doc_id
  LEFT JOIN keep k ON k.doc_id = d.doc_id
)
SELECT COUNT(*) AS n_total,
       CAST(SUM(s1) AS BIGINT) AS n_lang,
       CAST(SUM(s2) AS BIGINT) AS n_len,
       CAST(SUM(s3) AS BIGINT) AS n_quality,
       CAST(SUM(s4) AS BIGINT) AS n_dedup
FROM f
"""


# --- ivf_recenter (one k-means / Lloyd step over the IVF index) --------------


def q_ivf_recenter(spark: SparkSession, sf_dir: str,
                   n_cells: int = similarity.IVF_CELLS) -> DataFrame:
    """One Lloyd iteration of the IVF coarse quantizer: for every
    (cell, dim), the member count and the new centroid component =
    floor(mean of the members' quantized components). This is the
    training step that turns the seed-vector quantizer into a
    data-adaptive one — re-run until assignment churn is low, then
    rebuild the shared cell materialization from the new centroids.

    All arithmetic is exact int64 (sum of quantized components, one
    floor-division at the end — |sum| stays ≪ 2^53 so the double
    rounding is exact), keeping even the training step value-checkable
    in SQL.

    Plan shape at 100 TB: reuses the session-shared cell assignment
    (built once for the whole IVF family), explodes to (cell, dim)
    pairs — a narrow 1→64 fan-out, no shuffle — and runs ONE map-side-
    combined aggregate keyed by (cell, dim): cells × dims output rows,
    independent of N. The classic k-means-on-MapReduce shape."""
    cells = similarity.cached_ivf_cells(spark, sf_dir, n_cells)
    ex = cells.select("cell", F.posexplode("v").alias("dim", "cq"))
    return (ex.groupBy("cell", "dim")
            .agg(F.count(F.lit(1)).alias("n_vecs"),
                 F.sum("cq").alias("sum_q"))
            .select("cell", "dim", "n_vecs",
                    F.floor(F.col("sum_q").cast("double") / F.col("n_vecs"))
                    .cast("long").alias("c_q")))


_IVF_DOT_SQL = (f"list_sum(list_transform(range(1, {similarity.EMB_DIM} + 1), "
                "i -> cv[i] * v[i]))")

ORACLE_IVF_RECENTER = f"""
WITH quant AS (
  SELECT vec_id, {similarity.QUANTIZED_SQL} AS v FROM embeddings
),
centroids AS (
  SELECT vec_id AS cell, v AS cv FROM quant WHERE vec_id < {similarity.IVF_CELLS}
),
assigned AS (
  SELECT vec_id, v, cell,
         row_number() OVER (PARTITION BY vec_id ORDER BY
           (list_sum(list_transform(cv, x -> x * x)) - 2 * {_IVF_DOT_SQL}) ASC,
           cell ASC) AS rk
  FROM quant CROSS JOIN centroids
),
cells AS (SELECT vec_id, v, cell FROM assigned WHERE rk = 1),
ex AS (
  SELECT cell, v, unnest(range(1, {similarity.EMB_DIM} + 1)) AS d FROM cells
)
SELECT cell, CAST(d - 1 AS INT) AS dim, COUNT(*) AS n_vecs,
       CAST(floor(CAST(SUM(v[d]) AS DOUBLE) / COUNT(*)) AS BIGINT) AS c_q
FROM ex GROUP BY cell, d
"""


# --- pq_recenter (PQ codebook training: the Lloyd step per subspace) ---------

def q_pq_recenter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Lloyd iteration of the PQ codebooks — ``ivf_recenter``'s
    pattern applied per SUBSPACE (round-11 verdict item 4): for every
    (subspace m, code, dim-within-subspace), the member count and the
    new centroid component = floor(mean of the members' quantized
    subvector components). This is the training step that turns the
    seed codebooks (first-PQ_CODES-vectors-per-subspace,
    similarity.py) into data-adaptive ones: re-run until churn is low,
    then rebuild the shared PQ index from the trained codebooks.
    ``tests/test_similarity.py`` pins that ONE step already reduces
    total ADC quantization error on the fixture embeddings.

    All arithmetic is exact int64 (sums of quantized components, one
    floor-division — |sum| ≪ 2^53 so the double rounding is exact),
    keeping the training step value-checkable in SQL.

    Plan shape at 100 TB: reuses the session-shared PQ index (vector →
    codes, built once for the whole PQ family), re-slices the already-
    cached quantized vectors into subvectors (a narrow 1 → PQ_M ×
    PQ_SUBDIM fan-out, no shuffle), and runs ONE map-side-combined
    aggregate keyed by (m, code, dim): PQ_M × PQ_CODES × PQ_SUBDIM
    output rows, independent of N — the k-means-on-MapReduce shape,
    once per subspace in the same job."""
    pq = similarity.cached_pq_codes(spark, sf_dir)
    ex = (pq.select("codes", F.posexplode(
              F.expr(similarity._SUBSLICES_EXPR)).alias("m", "sub"))
          .select("m",
                  F.element_at("codes", F.col("m") + 1).cast("int")
                  .alias("code"),
                  F.posexplode("sub").alias("dim", "cq")))
    return (ex.groupBy("m", "code", "dim")
            .agg(F.count(F.lit(1)).alias("n_vecs"),
                 F.sum("cq").alias("sum_q"))
            .select(F.col("m").cast("int").alias("m"), "code",
                    F.col("dim").cast("int").alias("dim"), "n_vecs",
                    F.floor(F.col("sum_q").cast("double") / F.col("n_vecs"))
                    .cast("long").alias("c_q")))


ORACLE_PQ_RECENTER = f"""
WITH quant AS (
  SELECT vec_id, {similarity.QUANTIZED_SQL} AS v FROM embeddings
),
subs AS (
  SELECT vec_id, m,
         array_slice(v, m * {similarity.PQ_SUBDIM} + 1,
                     m * {similarity.PQ_SUBDIM} + {similarity.PQ_SUBDIM}) AS sub
  FROM quant CROSS JOIN
       (SELECT unnest(generate_series(0, {similarity.PQ_M - 1})) AS m)
),
cb AS (
  SELECT m, vec_id AS code, sub AS csub
  FROM subs WHERE vec_id < {similarity.PQ_CODES}
),
encoded AS (
  SELECT subs.vec_id, m, code,
         row_number() OVER (PARTITION BY subs.vec_id, m ORDER BY
           (list_sum(list_transform(range(1, {similarity.PQ_SUBDIM} + 1),
              i -> csub[i] * csub[i] - 2 * csub[i] * sub[i]))) ASC,
           code ASC) AS rk
  FROM subs JOIN cb USING (m)
),
codes AS (SELECT vec_id, m, code FROM encoded WHERE rk = 1),
ex AS (
  SELECT c.m, c.code, s.sub,
         unnest(range(1, {similarity.PQ_SUBDIM} + 1)) AS d
  FROM codes c JOIN subs s ON s.vec_id = c.vec_id AND s.m = c.m
)
SELECT CAST(m AS INT) AS m, CAST(code AS INT) AS code,
       CAST(d - 1 AS INT) AS dim, COUNT(*) AS n_vecs,
       CAST(floor(CAST(SUM(sub[d]) AS DOUBLE) / COUNT(*)) AS BIGINT) AS c_q
FROM ex GROUP BY m, code, d
"""


# --- hybrid_search_rrf (keyword + vector rank fusion) ------------------------

RRF_K = 60       # the standard reciprocal-rank-fusion damping constant
RRF_TOPK = 10


def q_hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: reciprocal-rank fusion of the BM25 keyword
    top-k and the embedding-cosine top-k —
    ``rrf = Σ 1/(60 + rank)`` over the lists a doc appears in (the
    standard RAG-serving recipe for combining lexical and vector
    recall; doc_id ≡ vec_id in the testdata catalog).

    Determinism: both input rankings are total-ordered (score then id),
    ranks are integers, and the fusion is a fixed-order two-term double
    expression — bit-identical across engines, so even the fused
    ranking is value-checked in SQL.

    Plan shape at 100 TB: the heavy lifting is the two top-k searches
    (each already scale-shaped: one corpus scan + TakeOrdered; bucketed
    ANN as the vector path swap-in). The fusion itself ranks two k-row
    result sets — driver-scale regardless of corpus size; the
    single-partition rank windows here are over k rows, not data."""
    kw = text.q_search_bm25(spark, sf_dir).select("doc_id", "score")
    vec = similarity.q_embedding_cosine_topk(spark, sf_dir).select(
        F.col("vec_id").alias("doc_id"), "cos_sim")
    from pyspark.sql.window import Window
    wb = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    wv = Window.orderBy(F.desc("cos_sim"), F.asc("doc_id"))
    rb = kw.select("doc_id", F.row_number().over(wb).alias("rank_kw"))
    rv = vec.select("doc_id", F.row_number().over(wv).alias("rank_vec"))
    rrf = (F.coalesce(F.lit(1.0) / (F.lit(RRF_K) + F.col("rank_kw")), F.lit(0.0))
           + F.coalesce(F.lit(1.0) / (F.lit(RRF_K) + F.col("rank_vec")), F.lit(0.0)))
    return (rb.join(rv, "doc_id", "full_outer")
            .select("doc_id", "rank_kw", "rank_vec", rrf.alias("rrf"))
            .orderBy(F.desc("rrf"), F.asc("doc_id")).limit(RRF_TOPK))


def _oracle_hybrid_search_rrf() -> str:
    return f"""
WITH kw AS ({text.ORACLE_SEARCH_BM25}),
vec AS ({similarity.ORACLE_EMBEDDING_COSINE_TOPK}),
rb AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS rank_kw FROM kw),
rv AS (SELECT vec_id AS doc_id, CAST(row_number() OVER (ORDER BY cos_sim DESC, vec_id ASC) AS INT) AS rank_vec FROM vec)
SELECT COALESCE(rb.doc_id, rv.doc_id) AS doc_id, rank_kw, rank_vec,
       COALESCE(CAST(1 AS DOUBLE) / ({RRF_K} + rank_kw), 0)
         + COALESCE(CAST(1 AS DOUBLE) / ({RRF_K} + rank_vec), 0) AS rrf
FROM rb FULL OUTER JOIN rv ON rb.doc_id = rv.doc_id
ORDER BY rrf DESC, doc_id ASC
LIMIT {RRF_TOPK}
"""


QUERIES = {
    "pii_scrub": q_pii_scrub,
    "chunk_dedup": q_chunk_dedup,
    "domain_mix": q_domain_mix,
    "corpus_funnel": q_corpus_funnel,
    "ivf_recenter": q_ivf_recenter,
    "pq_recenter": q_pq_recenter,
    "hybrid_search_rrf": q_hybrid_search_rrf,
}

ORACLES = {
    "pii_scrub": ORACLE_PII_SCRUB,
    "chunk_dedup": ORACLE_CHUNK_DEDUP,
    "domain_mix": ORACLE_DOMAIN_MIX,
    "corpus_funnel": _oracle_corpus_funnel(),
    "ivf_recenter": ORACLE_IVF_RECENTER,
    "pq_recenter": ORACLE_PQ_RECENTER,
    "hybrid_search_rrf": _oracle_hybrid_search_rrf(),
}
