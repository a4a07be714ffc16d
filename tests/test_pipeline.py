"""Pipeline-governance operators (functions/pipeline.py): oracle
parity + the semantic pins the oracles can't express — real PII
regexes on crafted rows, chunk-dedup detection/exclusion behavior,
mix determinism under repartitioning, funnel monotonicity, and the
Lloyd-step invariants."""

import pytest
from pyspark.sql import functions as F

from graphdatabase_spark.functions import pipeline, similarity

from tests.parity import assert_parity


@pytest.mark.parametrize("name", sorted(pipeline.ORACLES))
def test_pipeline_parity(spark, sf_dir, name):
    assert_parity(pipeline.QUERIES[name](spark, sf_dir),
                  pipeline.ORACLES[name], sf_dir)


def test_pii_patterns_on_real_pii(spark):
    """The synthetic corpus has no digits, so the true PII regexes are
    pinned here on crafted rows: counts per pattern and redaction of
    every hit."""
    rows = [
        (1, "mail me at jane.doe+spam@example.co.uk or bob@x.io today"),
        (2, "call 555-123-4567 or 555.987.6543; ssn 123-45-6789"),
        (3, "servers 10.0.0.1 and 192.168.1.255 are up"),
        (4, "no pii here, just the value of things"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in pipeline.scrub_frame(df).collect()}
    assert (got[1]["n_email"], got[1]["n_phone"]) == (2, 0)
    assert (got[2]["n_phone"], got[2]["n_ssn"]) == (2, 1)
    assert got[3]["n_ip"] == 2
    assert (got[4]["n_email"], got[4]["n_marker"]) == (0, 1)
    # every hit is redacted: no pattern matches the clean text
    clean = df.select(
        "doc_id",
        *[F.regexp_count(
            # rebuild the redacted text the same way scrub_frame does
            __import__("functools").reduce(
                lambda c, p: F.regexp_replace(c, p, pipeline.REDACT),
                pipeline.PII_PATTERNS.values(), F.col("text")),
            F.lit(p)).alias(n)
          for n, p in pipeline.PII_PATTERNS.items()])
    for r in clean.collect():
        assert all(r[n] == 0 for n in pipeline.PII_PATTERNS), r.asDict()


def test_chunk_dedup_detects_shared_chunks(spark):
    """Two docs sharing one exact 8-token run are both flagged; a doc
    with < CHUNK_TOKS tokens contributes no chunks and is absent."""
    shared = "alpha beta gamma delta epsilon zeta eta theta"  # exactly 8 tokens
    rows = [
        (1, shared + " tail one two three four five six seven"),
        (2, shared + " other words entirely different here now ok"),
        (3, "completely unrelated text with eight tokens here yes sir"),
        (4, "short doc"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    ch = pipeline.chunk_hashes(df)
    occ = ch.groupBy("h").agg(F.count(F.lit(1)).alias("occ"))
    per_doc = (ch.join(occ, "h").groupBy("doc_id")
               .agg(F.sum((F.col("occ") >= 2).cast("int")).alias("n_dup")))
    got = {r["doc_id"]: r["n_dup"] for r in per_doc.collect()}
    assert got[1] >= 1 and got[2] >= 1  # the shared leading chunk
    assert got[3] == 0
    assert 4 not in got  # < 8 tokens -> no chunks


def test_chunk_dedup_random_corpora_vs_python_replica(spark):
    """Seeded random corpora (varied doc lengths incl. < CHUNK_TOKS,
    exact multiples of CHUNK_TOKS, and planted repeats both within and
    across docs) against a plain-Python replica of the chunking +
    duplicate-count semantics — catches tokenize/slice drift the fixed
    testdata can't."""
    import random

    rng = random.Random(20260814)
    vocab = [f"w{i}" for i in range(30)]
    for trial in range(5):
        docs, texts = [], {}
        for doc_id in range(12):
            n = rng.choice([3, 7, 8, 9, 16, 24, 40])
            toks = [rng.choice(vocab) for _ in range(n)]
            if doc_id % 4 == 0 and n >= 16:
                toks[8:16] = toks[0:8]  # planted within-doc repeat
            if doc_id % 5 == 1 and n >= 8 and 0 in texts:
                toks[0:8] = texts[0][0:8]  # planted cross-doc repeat
            texts[doc_id] = toks
            docs.append((doc_id, " ".join(toks)))
        # python replica
        from collections import Counter
        chunks = {d: [" ".join(t[i * pipeline.CHUNK_TOKS:(i + 1) * pipeline.CHUNK_TOKS])
                      for i in range(len(t) // pipeline.CHUNK_TOKS)]
                  for d, t in texts.items()}
        occ = Counter(c for cs in chunks.values() for c in cs)
        want = {d: (len(cs), sum(1 for c in cs if occ[c] >= 2))
                for d, cs in chunks.items() if cs}
        df = spark.createDataFrame(docs, ["doc_id", "text"])
        ch = pipeline.chunk_hashes(df)
        o = ch.groupBy("h").agg(F.count(F.lit(1)).alias("occ"))
        got = {r["doc_id"]: (r["n"], r["nd"]) for r in
               ch.join(o, "h").groupBy("doc_id")
               .agg(F.count(F.lit(1)).alias("n"),
                    F.sum((F.col("occ") >= 2).cast("int")).alias("nd")).collect()}
        assert got == want, f"trial {trial}"


def test_domain_mix_deterministic_and_partition_stable(spark, sf_dir):
    a = {tuple(r) for r in pipeline.q_domain_mix(spark, sf_dir).collect()}
    b = {tuple(r) for r in pipeline.q_domain_mix(spark, sf_dir).collect()}
    assert a == b
    for r in pipeline.q_domain_mix(spark, sf_dir).collect():
        assert 0 <= r["n_kept"] <= r["n_docs"]
        assert r["keep_pct"] in pipeline.MIX_PCTS


def test_corpus_funnel_is_monotone(spark, sf_dir):
    (row,) = pipeline.q_corpus_funnel(spark, sf_dir).collect()
    seq = [row["n_total"], row["n_lang"], row["n_len"],
           row["n_quality"], row["n_dedup"]]
    assert seq == sorted(seq, reverse=True)
    assert seq[0] > 0 and seq[-1] >= 0


def test_ivf_recenter_matches_python_replica(spark, sf_dir):
    """The Lloyd step's (cell, dim) means recomputed from the shared
    cell assignment in plain Python must match exactly (the arithmetic
    is all-integer + one exact floor division)."""
    import math

    cells = similarity.cached_ivf_cells(spark, sf_dir).collect()
    got = {(r["cell"], r["dim"]): (r["n_vecs"], r["c_q"])
           for r in pipeline.q_ivf_recenter(spark, sf_dir).collect()}
    n_vecs_total = len(cells)
    assert len(got) == similarity.IVF_CELLS * similarity.EMB_DIM
    want_sum: dict = {}
    for r in cells:
        for d, cq in enumerate(r["v"]):
            k = (r["cell"], d)
            n, s = want_sum.get(k, (0, 0))
            want_sum[k] = (n + 1, s + cq)
    assert sum(n for (c, d), (n, s) in want_sum.items() if d == 0) == n_vecs_total
    for k, (n, s) in want_sum.items():
        assert got[k] == (n, math.floor(s / n)), k


def test_hybrid_search_rrf_fuses_both_rankings(spark, sf_dir):
    """The fused list must contain both lists' #1 docs, rrf must be
    non-increasing, and a doc in both lists must outrank one with only
    a comparable single-list rank."""
    from graphdatabase_spark.functions import similarity, text

    fused = pipeline.q_hybrid_search_rrf(spark, sf_dir).collect()
    rrfs = [r["rrf"] for r in fused]
    assert rrfs == sorted(rrfs, reverse=True)
    ids = {r["doc_id"] for r in fused}
    top_kw = text.q_search_bm25(spark, sf_dir).collect()[0]["doc_id"]
    top_vec = similarity.q_embedding_cosine_topk(spark, sf_dir).collect()[0]["vec_id"]
    assert top_kw in ids and top_vec in ids
    for r in fused:
        if r["rank_kw"] is not None and r["rank_vec"] is not None:
            both = r["rrf"]
            singles = [x["rrf"] for x in fused
                       if (x["rank_kw"] is None) != (x["rank_vec"] is None)
                       and min(v for v in (x["rank_kw"], x["rank_vec"]) if v is not None)
                           >= min(r["rank_kw"], r["rank_vec"])]
            assert all(both > s for s in singles)
