"""Build a deterministic K× scale-up of a testdata SF directory.

Usage::

    python tools/make_scale.py [SRC_DIR] [OUT_DIR] [K]
    # defaults: /root/testdata/sf0.1  <repo>/.scale/sf1  10

Purpose (round-4 verdict item 3): the 100×-scale arguments for the
headline kernels are plan reasoning at sf0.1 — one committed sf1 sweep
turns them into measured scaling curves. The driver's testdata stops at
sf0.1, so this tool replicates it K× with key remapping, preserving the
workload's *shape* under scale-up rather than degenerating it:

- **Fact tables** (customer/orders/lineitem/supplier/part): each
  replica offsets every key column by ``replica * (max_key + 1)`` —
  cardinalities scale K× while FK fan-outs per parent stay constant
  (K× more customers, same orders-per-customer), which is how TPC-H
  itself scales. Non-key columns are copied.
- **Dimension tables** (region/nation): copied as-is — fixed
  cardinality at every TPC-H SF, and the derived-graph vid offsets
  (derived_graph.py) require nation keys to stay in their slot.
- **events**: event_id/user_id offset per replica — K× more users with
  the same per-user history length (a bigger deployment, not
  pathologically deeper sessions). Timestamps/values copied.
- **documents**: doc_id offset; for replica i>0 the token sequence is
  deterministically permuted (sort by xxhash64(token, position, i)), so
  replicas share vocabulary but almost no k≥2 shingles — near-dup
  structure stays per-replica and total MinHash/chunk-dedup work scales
  linearly instead of every doc gaining K-1 artificial near-duplicates
  (which would quadratically blow up candidate pairs and measure a
  different workload). ``n_chars`` keeps the source value (length is
  whitespace-normalization-close, and no headline kernel reads it).
- **embeddings**: vec_id offset; replica i's vectors are dimension-
  ROTATED by i positions — a permutation preserves every intra-replica
  distance and cosine (each replica is workload-identical to the
  source) while cross-replica vectors decorrelate, so near-dup/ANN
  structure scales linearly. (A small additive perturbation was tried
  first and rejected: it left every vector with K-1 near-duplicate
  replicas, and semdedup measured 35× at 10× data — an artificial
  quadratic workload, not a scaling curve.)

Everything is expression-level (one scan crossed with ``range(K)``, no
Python row paths) — generating sf10 from sf0.1 is the same one job.
NOT an oracle input: correctness stays pinned at driver SFs; this data
exists to measure scaling exponents only.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from graphdatabase_spark import get_spark  # noqa: E402

# key columns offset per replica, per table
KEYED = {
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPIED = ("region", "nation")
# FK columns share the offset base of the table whose PK they reference
OFFSET_BASE = {
    "o_custkey": ("customer", "c_custkey"),
    "l_orderkey": ("orders", "o_orderkey"),
    "l_partkey": ("part", "p_partkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
}


_INT_MAX = {"int": 2**31 - 1, "bigint": 2**63 - 1, "smallint": 2**15 - 1}


def _replicate(df: DataFrame, keys: list[str], bases: dict[str, int],
               k: int) -> DataFrame:
    rep = df.crossJoin(F.broadcast(
        df.sparkSession.range(k).select(F.col("id").alias("__r"))))
    for c in keys:
        dtype = dict(df.dtypes)[c]
        # Guard the cast-back: non-ANSI Spark WRAPS on overflow, which
        # would silently mint colliding/negative keys at large K (or
        # when re-scaling an already-scaled directory).
        bound = _INT_MAX.get(dtype)
        if bound is not None and bases[c] * k > bound:
            raise ValueError(
                f"{c}: replica offset {bases[c]} * K={k} overflows {dtype}; "
                f"lower K or widen the source column to bigint first")
        rep = rep.withColumn(c, (F.col(c) + F.col("__r") * bases[c])
                             .cast(dtype))
    return rep


def _permute_tokens(text_col: str, replica: F.Column) -> F.Column:
    """Deterministic per-replica word permutation; replica 0 unchanged."""
    shuffled = F.concat_ws(" ", F.expr(
        "transform(array_sort(transform(split({t}, '\\\\s+'), (x, i) -> "
        "struct(xxhash64(x, i, __r) as h, x as t))), s -> s.t)"
        .format(t=text_col)))
    return F.when(replica == 0, F.col(text_col)).otherwise(shuffled)


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(repo, ".scale", "sf1")
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    spark = get_spark("make-scale")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out, exist_ok=True)

    # per-table max-key bases (each replica's keys live in their own slot)
    bases_by_table: dict[str, dict[str, int]] = {}
    maxes: dict[tuple[str, str], int] = {}
    for t, keys in KEYED.items():
        df = spark.read.parquet(os.path.join(src, f"{t}.parquet"))
        for c in keys:
            ref = OFFSET_BASE.get(c)
            if ref and ref not in maxes:
                rdf = spark.read.parquet(os.path.join(src, f"{ref[0]}.parquet"))
                maxes[ref] = rdf.agg(F.max(ref[1])).collect()[0][0] + 1
            if not ref:
                maxes[(t, c)] = df.agg(F.max(c)).collect()[0][0] + 1
        bases_by_table[t] = {c: maxes[OFFSET_BASE.get(c, (t, c))] for c in keys}

    for t in COPIED:
        spark.read.parquet(os.path.join(src, f"{t}.parquet")) \
            .write.mode("overwrite").parquet(os.path.join(out, f"{t}.parquet"))
        print(f"# {t}: copied", file=sys.stderr)

    for t, keys in KEYED.items():
        df = spark.read.parquet(os.path.join(src, f"{t}.parquet"))
        rep = _replicate(df, keys, bases_by_table[t], k)
        if t == "documents":
            rep = rep.withColumn("text", _permute_tokens("text", F.col("__r")))
        if t == "embeddings":
            rep = rep.withColumn("embedding", F.expr(
                "concat(slice(embedding, cast(__r % size(embedding) as int) + 1, "
                "size(embedding) - cast(__r % size(embedding) as int)), "
                "slice(embedding, 1, cast(__r % size(embedding) as int)))"))
        cols = [c for c in rep.columns if c != "__r"]
        rep.select(*cols).write.mode("overwrite") \
            .parquet(os.path.join(out, f"{t}.parquet"))
        print(f"# {t}: x{k}", file=sys.stderr)
    print(f"# wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
