"""Deduplication operators (SURVEY.md §2.3): exact, n-gram Jaccard,
MinHash+LSH banding, SimHash.

Scale design:

- **Exact dedup** is a hash-groupBy — one shuffle on the content hash,
  map-side partial agg. At 100 TB the hash (not the text) shuffles:
  group on ``md5(text)``, keep min doc_id.
- **Near-dup (exact Jaccard)** uses an inverted shingle index:
  doc×shingle exploded, self-joined on shingle — candidate pairs are
  only docs sharing ≥1 shingle, then Jaccard is computed from exact
  intersection counts. Shuffle is on the shingle hash; a hot shingle
  (boilerplate) is the skew risk — AQE skew-join handles moderate
  skew, and `max_shingle_freq` drops degenerate shingles entirely
  (standard practice: a shingle shared by >X docs is boilerplate and
  carries no dedup signal, only O(X²) join cost).
- **MinHash+LSH** is the sub-quadratic scale path: constant-size
  signatures (k hashes), banded into b buckets; only same-bucket pairs
  are verified. All hashing is the portable md5-based scheme
  (functions/hashing.py) so the pipeline is reproducible anywhere.
- **SimHash** gives a constant-width bit fingerprint per doc;
  near-dup = small Hamming distance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphdatabase_spark.cache import shared_persist
from graphdatabase_spark.functions.hashing import (
    MINHASH_PRIME,
    md5_int64,
    md5_int64_sql_duckdb,
    minhash_perm,
)
from graphdatabase_spark.functions.text import shingles_col, shingles_sql, tokens_col, tokens_sql
from graphdatabase_spark.sources.tables import load_table

NEAR_DUP_THRESHOLD = 0.5
SHINGLE_K = 3

# MinHash parameters: 32 hashes in 8 bands of 4 ⇒ candidate-pair
# probability at Jaccard s is 1-(1-s^4)^8 (~0.99 at s=0.7, ~0.57 at s=0.4).
MINHASH_K = 32
LSH_BANDS = 8
LSH_ROWS = MINHASH_K // LSH_BANDS
# Deterministic permutation coefficients: a odd-ish < 2^20, b < P,
# generated from a fixed linear recurrence (documented, reproducible).
MINHASH_AB = [((17 + 13 * i) * 2 + 1, (101 + 997 * i) % MINHASH_PRIME) for i in range(MINHASH_K)]


def doc_shingles(spark: SparkSession, sf_dir: str, k: int = SHINGLE_K) -> DataFrame:
    """(doc_id, shingle) — distinct k-token shingles per document."""
    docs = load_table(spark, sf_dir, "documents", spread=True).select("doc_id", "text")
    return docs.select(
        "doc_id", F.explode(shingles_col(tokens_col("text"), k)).alias("shingle"))


def shingle_hashes(shingles: DataFrame) -> DataFrame:
    """(doc_id, h) — the 60-bit md5 int of each shingle. Every join and
    set operation downstream runs on the 8-byte int, never the shingle
    string: at 100 TB that's the difference between shuffling ~25-byte
    keys and 8-byte keys, and both engines derive the identical int so
    oracle parity survives the substitution."""
    return shingles.select("doc_id", md5_int64(F.col("shingle")).alias("h"))


def cached_shingle_hashes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The (doc_id, h) inverted-index input, persisted ONCE per session
    via the shared-cache registry.

    Every near-dup/similarity operator references this relation 2-3
    times (pair join sides + per-doc counts); without persistence Spark
    re-runs the full tokenize→shingle→md5 pipeline per reference — the
    dominant cost. Persisting the compact post-hash form (16 bytes/row,
    the strings are already gone) is exactly what a production pipeline
    does with its shingle index at 100 TB: materialize once, feed every
    downstream consumer. ``cache.release_caches()`` frees it.

    Hash-partitioned by ``h`` — the inverted index's own key. The pair
    self-joins and the benchmark/query semi-joins all probe on ``h``,
    so they run Exchange-free off the cache (measured ~1.5x on the
    exact-Jaccard pair join at sf0.1); the per-doc count aggregations
    re-shuffle on doc_id either way. This is the standard posting-list
    layout for a term index at scale."""
    n_part = spark.sparkContext.defaultParallelism
    return shared_persist(
        spark, ("shingle_hashes", sf_dir),
        lambda: shingle_hashes(doc_shingles(spark, sf_dir)).repartition(n_part, "h"))


def _shingles_cte() -> str:
    return (f"sh AS (SELECT doc_id, unnest({shingles_sql(tokens_sql('text'), SHINGLE_K)}) AS shingle "
            f"FROM documents)")


def _hashes_cte() -> str:
    return (f"{_shingles_cte()}, "
            f"sh_h AS (SELECT doc_id, {md5_int64_sql_duckdb('shingle')} AS h FROM sh)")


# --- dedup_exact -------------------------------------------------------------

def exact_dedup_groups(docs: DataFrame) -> DataFrame:
    """THE exact-dedup survivor rule — one place only: group by
    md5(text), survivor = min doc_id. ``(content_md5, keep_doc_id,
    n_copies)``. Every exact-dedup consumer (q_dedup_exact,
    corpus.exact_dedup_keep → corpus_prep / corpus_funnel) derives
    from this relation so the hash choice and tie-break can never
    fork between them."""
    return (docs.select("doc_id", F.md5(F.col("text")).alias("content_md5"))
            .groupBy("content_md5")
            .agg(F.min("doc_id").alias("keep_doc_id"),
                 F.count(F.lit(1)).alias("n_copies")))


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return exact_dedup_groups(docs)


ORACLE_DEDUP_EXACT = """
SELECT md5(text) AS content_md5, MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_copies
FROM documents GROUP BY md5(text)
"""


# --- dedup_near (exact shingle-Jaccard via inverted index) -------------------

def near_dup_pairs(hashes: DataFrame, threshold: float = NEAR_DUP_THRESHOLD,
                   max_shingle_freq: int | None = None) -> DataFrame:
    """(doc1, doc2, jaccard) for all pairs with Jaccard ≥ threshold,
    from a ``(doc_id, h)`` shingle-hash relation (pass it persisted —
    it is referenced three times).

    ``max_shingle_freq`` drops shingles shared by more than that many
    docs before pairing (boilerplate guard; changes semantics from
    exact to filtered-exact — leave None for oracle-checked runs).
    """
    sh = hashes
    if max_shingle_freq is not None:
        freq = sh.groupBy("h").agg(F.count(F.lit(1)).alias("f"))
        sh = sh.join(freq.filter(F.col("f") <= max_shingle_freq), "h", "left_semi")
    counts = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.h") == F.col("b.h")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc1"), F.col("b.doc_id").alias("doc2"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    c1 = counts.select(F.col("doc_id").alias("doc1"), F.col("n").alias("n1"))
    c2 = counts.select(F.col("doc_id").alias("doc2"), F.col("n").alias("n2"))
    return (
        inter.join(c1, "doc1").join(c2, "doc2")
        .select(
            "doc1", "doc2",
            (F.col("inter").cast("double") / (F.col("n1") + F.col("n2") - F.col("inter"))).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def q_dedup_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    return near_dup_pairs(cached_shingle_hashes(spark, sf_dir))


# Boilerplate guard active at driver scale: shingles in more docs than
# this are dropped before pairing (625+ shingles affected at sf0.01 —
# the guard is exercised, not just present). At 100 TB this is the
# defense against the hot shingle that makes the inverted-index
# self-join quadratic.
MAX_SHINGLE_FREQ = 3


def q_dedup_near_guarded(spark: SparkSession, sf_dir: str) -> DataFrame:
    return near_dup_pairs(cached_shingle_hashes(spark, sf_dir),
                          max_shingle_freq=MAX_SHINGLE_FREQ)


ORACLE_DEDUP_NEAR = f"""
WITH {_hashes_cte()},
cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh_h GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS doc1, b.doc_id AS doc2, COUNT(*) AS inter
  FROM sh_h a JOIN sh_h b ON a.h = b.h AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc1, doc2, CAST(inter AS DOUBLE) / (c1.n + c2.n - inter) AS jaccard
FROM pairs JOIN cnt c1 ON c1.doc_id = doc1 JOIN cnt c2 ON c2.doc_id = doc2
WHERE CAST(inter AS DOUBLE) / (c1.n + c2.n - inter) >= {NEAR_DUP_THRESHOLD}
"""


# Guarded variant: identical pipeline over the frequency-filtered
# shingle set — counts (Jaccard denominators) are computed AFTER the
# filter, exactly like the Spark path.
ORACLE_DEDUP_NEAR_GUARDED = f"""
WITH {_hashes_cte()},
kept AS (
  SELECT s.doc_id, s.h FROM sh_h s
  JOIN (SELECT h, COUNT(*) AS f FROM sh_h GROUP BY h) fr ON fr.h = s.h
  WHERE fr.f <= {MAX_SHINGLE_FREQ}
),
cnt AS (SELECT doc_id, COUNT(*) AS n FROM kept GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS doc1, b.doc_id AS doc2, COUNT(*) AS inter
  FROM kept a JOIN kept b ON a.h = b.h AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc1, doc2, CAST(inter AS DOUBLE) / (c1.n + c2.n - inter) AS jaccard
FROM pairs JOIN cnt c1 ON c1.doc_id = doc1 JOIN cnt c2 ON c2.doc_id = doc2
WHERE CAST(inter AS DOUBLE) / (c1.n + c2.n - inter) >= {NEAR_DUP_THRESHOLD}
"""


# --- dedup_minhash_lsh (the sub-quadratic scale path) ------------------------

def minhash_signatures(hashes: DataFrame, k: int = MINHASH_K) -> DataFrame:
    """(doc_id, sig ARRAY<BIGINT>) — k MinHash values per doc, from a
    ``(doc_id, h)`` 60-bit shingle-hash relation: the top 44 bits feed
    k universal-hash permutations (44-bit so ``a*h+b`` stays inside
    int64 under ANSI overflow checks). One shuffle (groupBy doc_id);
    permutations are computed map-side."""
    h = hashes.select("doc_id", F.shiftright("h", 16).alias("h"))
    mins = h.groupBy("doc_id").agg(*[
        F.min(minhash_perm(F.col("h"), a, b)).alias(f"m{i}")
        for i, (a, b) in enumerate(MINHASH_AB[:k])
    ])
    return mins.select("doc_id", F.array(*[f"m{i}" for i in range(k)]).alias("sig"))


def lsh_candidate_pairs(sigs: DataFrame, bands: int = LSH_BANDS, rows: int = LSH_ROWS) -> DataFrame:
    """(doc1, doc2) candidates agreeing on at least one full band."""
    banded = sigs.select(
        "doc_id",
        F.posexplode(F.array(*[
            F.concat_ws("_", *[F.col("sig")[b * rows + r] for r in range(rows)])
            for b in range(bands)
        ])).alias("band", "key"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.key") == F.col("b.key"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc1"), F.col("b.doc_id").alias("doc2"))
        .distinct()
    )


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH candidates verified with exact Jaccard ≥ threshold.

    Verification joins each candidate pair against per-doc *hash-set
    arrays* (collect_set of the 60-bit shingle hash) and computes exact
    Jaccard with array_intersect — cost O(candidates), never the full
    O(docs²) pair expansion the exact operator pays. That's the whole
    point of LSH at 100 TB: the quadratic stage only ever sees
    same-bucket survivors. The per-doc sets are built ONLY for docs
    that appear in some candidate pair (semi-join on the candidate id
    set before collect_set) — at scale candidates are typically ≪ 1%
    of the corpus, so the verify stage materializes ~nothing for the
    unpaired majority instead of an O(corpus) array relation.

    LSH recall is probabilistic only versus the TRUE near-dup set (a
    true pair can miss every band) — the pipeline itself is fully
    deterministic (md5-derived 44-bit hashes, fixed universal-hash
    coefficients, fixed band layout), so the exact candidate set and
    output replicate in SQL: ORACLE_DEDUP_MINHASH_LSH unrolls the same
    32 permutations and 8 band keys in DuckDB and hash-matches. The
    recall ≥ 0.9 / precision = 1.0 unit tests against the exact
    operator remain the statistical-quality gate.
    """
    hs = cached_shingle_hashes(spark, sf_dir)
    # Signatures feed both sides of the band self-join; persist so the
    # 32 min-aggregations run once (session-shared, released via
    # cache.release_caches()).
    sigs = shared_persist(spark, ("minhash_sigs", sf_dir),
                          lambda: minhash_signatures(hs))
    # Candidates feed three consumers (the id semi-join via both pair
    # columns + the final pair join); persist the small pair set so the
    # band self-join runs once.
    cands = shared_persist(spark, ("minhash_cands", sf_dir),
                           lambda: lsh_candidate_pairs(sigs))
    cand_ids = (cands.select(F.col("doc1").alias("doc_id"))
                .union(cands.select(F.col("doc2").alias("doc_id")))
                .distinct())
    sets = (hs.join(cand_ids, "doc_id", "left_semi")
            .groupBy("doc_id").agg(F.collect_set("h").alias("hs")))
    s1 = sets.select(F.col("doc_id").alias("doc1"), F.col("hs").alias("hs1"))
    s2 = sets.select(F.col("doc_id").alias("doc2"), F.col("hs").alias("hs2"))
    return (
        cands.join(s1, "doc1").join(s2, "doc2")
        .select(
            "doc1", "doc2",
            (F.size(F.array_intersect("hs1", "hs2")).cast("double")
             / F.size(F.array_union("hs1", "hs2"))).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= NEAR_DUP_THRESHOLD)
    )


def _minhash_lsh_oracle_sql(k: int = MINHASH_K, bands: int = LSH_BANDS,
                            rows: int = LSH_ROWS,
                            threshold: float = NEAR_DUP_THRESHOLD) -> str:
    """DuckDB replica of the full MinHash+LSH pipeline, generated from
    the SAME constants the Spark path uses (MINHASH_AB, band layout,
    44-bit shift, threshold) so the two can never drift apart. The
    exact-Jaccard verification reuses the inverted-index count form
    (|A∩B| / (n1 + n2 − |A∩B|)) — identical doubles to Spark's
    array_intersect/array_union on the same sets."""
    mins = ",\n         ".join(
        f"MIN(({a} * h + {b % MINHASH_PRIME}) % {MINHASH_PRIME}) AS m{i}"
        for i, (a, b) in enumerate(MINHASH_AB[:k]))
    band_rows = "\n  UNION ALL\n".join(
        f"  SELECT doc_id, {b} AS band, concat_ws('_', "
        + ", ".join(f"m{b * rows + r}" for r in range(rows))
        + ") AS key FROM sig"
        for b in range(bands))
    return f"""
WITH {_hashes_cte()},
h44 AS (SELECT doc_id, h >> 16 AS h FROM sh_h),
sig AS (SELECT doc_id,
         {mins}
        FROM h44 GROUP BY doc_id),
bands AS (
{band_rows}
),
cand AS (SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2
         FROM bands a JOIN bands b
           ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh_h GROUP BY doc_id),
inter AS (SELECT a.doc_id AS doc1, b.doc_id AS doc2, COUNT(*) AS i
          FROM sh_h a JOIN sh_h b ON a.h = b.h AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
SELECT c.doc1, c.doc2,
       CAST(COALESCE(i.i, 0) AS DOUBLE) / (c1.n + c2.n - COALESCE(i.i, 0)) AS jaccard
FROM cand c
JOIN cnt c1 ON c1.doc_id = c.doc1
JOIN cnt c2 ON c2.doc_id = c.doc2
LEFT JOIN inter i ON i.doc1 = c.doc1 AND i.doc2 = c.doc2
WHERE CAST(COALESCE(i.i, 0) AS DOUBLE) / (c1.n + c2.n - COALESCE(i.i, 0)) >= {threshold}
"""


ORACLE_DEDUP_MINHASH_LSH = _minhash_lsh_oracle_sql()


# --- dedup_simhash -----------------------------------------------------------

SIMHASH_BITS = 60


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit SimHash per doc over distinct shingle hashes: bit b is 1
    iff more shingles have bit b set than not.

    Single hash-aggregate: 60 conditional sums (one per bit) in ONE
    groupBy — no 60× row explode, one map-side-combined shuffle of
    (doc_id, 60 longs), then the bits fold into the fingerprint
    expression-side."""
    sh = cached_shingle_hashes(spark, sf_dir)
    votes = sh.groupBy("doc_id").agg(*[
        F.sum(F.shiftright("h", b) % 2 * 2 - 1).alias(f"v{b}")
        for b in range(SIMHASH_BITS)
    ])
    fingerprint = sum(
        (F.when(F.col(f"v{b}") > 0, F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long"))
         for b in range(SIMHASH_BITS)),
        start=F.lit(0).cast("long"),
    )
    return votes.select("doc_id", fingerprint.alias("simhash"))


ORACLE_DEDUP_SIMHASH = f"""
WITH {_shingles_cte()},
h AS (SELECT doc_id, {md5_int64_sql_duckdb('shingle')} AS h FROM sh),
votes AS (
  SELECT doc_id, b, SUM(((h >> b) % 2) * 2 - 1) AS v
  FROM h, unnest(range(0, {SIMHASH_BITS})) AS t(b)
  GROUP BY doc_id, b
)
SELECT doc_id, CAST(SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << CAST(b AS INT)) ELSE 0 END) AS BIGINT) AS simhash
FROM votes GROUP BY doc_id
"""


QUERIES = {
    "dedup_exact": q_dedup_exact,
    "dedup_near": q_dedup_near,
    "dedup_near_guarded": q_dedup_near_guarded,
    "dedup_minhash_lsh": q_dedup_minhash_lsh,
    "dedup_simhash": q_dedup_simhash,
}

ORACLES = {
    "dedup_exact": ORACLE_DEDUP_EXACT,
    "dedup_near": ORACLE_DEDUP_NEAR,
    "dedup_near_guarded": ORACLE_DEDUP_NEAR_GUARDED,
    # Deterministic pipeline (md5 hashes + fixed coefficients): the
    # full LSH candidate generation + exact verify replicates in SQL.
    "dedup_minhash_lsh": ORACLE_DEDUP_MINHASH_LSH,
    "dedup_simhash": ORACLE_DEDUP_SIMHASH,
}
