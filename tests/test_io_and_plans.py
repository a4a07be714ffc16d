"""Source/sink round trips (CSV, JSON, parquet) and physical-plan
quality gates: predicate pushdown, column pruning, broadcast joins,
whole-stage codegen. The plan tests exist so a refactor that silently
de-optimizes a flagship query (filter no longer reaching the scan, a
broadcast falling back to shuffle) fails CI, not a production run."""

from pyspark.sql import functions as F

from graphdatabase_spark import plans
from graphdatabase_spark.operators import relational
from graphdatabase_spark.sources import io as gio
from graphdatabase_spark.sources.tables import load_table


def _roundtrip(df, write, read, spark, path, schema):
    write(df, path)
    back = read(spark, path, schema)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_csv_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a,b", 1.5, None), (2, "x\ny", -2.0, "q")],
        "id int, s string, v double, n string")
    # multiLine is opt-in (it makes CSV non-splittable — one task per
    # file at 100 TB); needed here for the embedded-newline record.
    write = lambda d, p: gio.write_csv(d, p)  # noqa: E731
    read = lambda sp, p, sc: gio.read_csv(sp, p, sc, multiLine="true")  # noqa: E731
    _roundtrip(df, write, read, spark,
               str(tmp_path / "csv"), "id int, s string, v double, n string")


def test_json_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, ["x", "y"], {"k": 2}), (2, [], None)],
        "id int, arr array<string>, m struct<k:int>")
    _roundtrip(df, gio.write_json, gio.read_json, spark,
               str(tmp_path / "json"), "id int, arr array<string>, m struct<k:int>")


def test_orc_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, ["x", "y"], {"k": 2}, 1.5), (2, [], None, -0.5)],
        "id int, arr array<string>, m struct<k:int>, v double")
    _roundtrip(df, gio.write_orc, gio.read_orc, spark,
               str(tmp_path / "orc"),
               "id int, arr array<string>, m struct<k:int>, v double")


def test_parquet_partitioned_sink(spark, tmp_path, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    gio.write_parquet(docs, str(tmp_path / "p"), partition_by=["lang"],
                      max_records_per_file=100)
    back = spark.read.parquet(str(tmp_path / "p"))
    assert back.count() == docs.count()
    # partition pruning: filtering one lang must read only that partition
    one = back.filter(F.col("lang") == "en")
    plan = one.queryExecution if hasattr(one, "queryExecution") else None
    pruned = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(lang" in pruned or "lang#" in pruned


def test_pushdown_and_pruning_in_scan(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    q = li.filter(F.col("l_quantity") > 45).select("l_orderkey", "l_quantity")
    pushed = plans.pushed_filters(q)
    assert "IsNotNull(l_quantity)" in pushed
    assert any(p.startswith("GreaterThan(l_quantity") for p in pushed)
    # column pruning: the scan must read only the two referenced columns
    read_schema = plans.read_schemas(q)[0]
    assert "l_orderkey" in read_schema and "l_quantity" in read_schema
    assert "l_comment" not in read_schema and "l_extendedprice" not in read_schema


def test_star_join_broadcasts_dims(spark, sf_dir):
    """The flagship star join must broadcast its dimension tables, not
    shuffle the fact table against them."""
    df = relational.QUERIES["revenue_by_nation"](spark, sf_dir)
    df.collect()  # AQE: codegen ids only exist in the executed final plan
    assert plans.uses_broadcast_join(df)
    assert "isFinalPlan=true" in plans.formatted_plan(df)
    assert plans.codegen_span_count(df) >= 1  # whole-stage codegen spans exist


def test_agg_is_partial_before_shuffle(spark, sf_dir):
    """Hash aggregates must have a map-side partial phase (two
    HashAggregate nodes around the exchange)."""
    df = relational.QUERIES["pricing_summary"](spark, sf_dir)
    assert plans.has_partial_aggregate(df)


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    """Co-located join: both sides bucketed on the join key with the
    same bucket count ⇒ the join plans with NO Exchange on either side
    — the write-time shuffle replaces every query-time shuffle. This is
    the layout decision that matters most at 100 TB for repeated
    fact-fact joins."""
    from graphdatabase_spark.sources import bucketing
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"), "o_orderpriority")
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("k"), "l_quantity")
    bucketing.write_bucketed(orders, "t_orders_bkt", str(tmp_path / "ob"), "k", 8)
    bucketing.write_bucketed(li, "t_li_bkt", str(tmp_path / "lb"), "k", 8)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force a non-broadcast join so the exchange question is real
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = bucketing.bucketed(spark, "t_orders_bkt").join(
            bucketing.bucketed(spark, "t_li_bkt"), "k")
        assert j.count() > 0
        plan = plans.formatted_plan(j)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join must not shuffle"
        # contrast: the same join over plain parquet DOES shuffle
        plain = orders.join(li, "k")
        assert "Exchange" in plans.formatted_plan(plain)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_orders_bkt")
        spark.sql("DROP TABLE IF EXISTS t_li_bkt")


def test_bm25_plan_is_scan_only(spark, sf_dir):
    """search_bm25's contract: per-term tf as array expressions — the
    plan must contain NO Generate (explode) and NO per-term shuffle;
    the only join is the 1-row stats broadcast."""
    from graphdatabase_spark.functions import text
    df = text.QUERIES["search_bm25"](spark, sf_dir)
    plan = plans.formatted_plan(df)
    assert "Generate" not in plan, "BM25 must not explode tokens"
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    schema = " ".join(plans.read_schemas(df))
    assert "text" in schema and "lang" not in schema, "scan must prune to doc_id,text"


def test_disjunctive_join_stays_hash_join(spark, sf_dir):
    """Q19 shape: Catalyst must extract the common equi-key from the
    OR-of-ANDs — a BroadcastNestedLoopJoin here means the predicate
    defeated join planning (quadratic at scale)."""
    df = relational.QUERIES["disjunctive_revenue"](spark, sf_dir)
    plan = plans.formatted_plan(df)
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert any(p.startswith("Or(") for p in plans.pushed_filters(df)), \
        "the disjunction must push into at least one scan"


def test_sequence_pack_has_no_global_sort(spark, sf_dir):
    """Packing orders only WITHIN a shard: the plan must hash-partition
    by shard, never range-partition (a global sort would serialize the
    100 TB corpus through one ordering)."""
    from graphdatabase_spark.functions import corpus
    df = corpus.QUERIES["sequence_pack"](spark, sf_dir)
    plan = plans.formatted_plan(df)
    assert "hashpartitioning(shard" in plan
    assert "rangepartitioning" not in plan


def test_release_caches_leaves_no_persistent_rdds(spark, sf_dir):
    """Queries that persist shared intermediates (shingle index,
    MinHash signatures, triangle-count temporaries) must free ALL of it
    on registry.release() — a long-lived session's storage memory goes
    back to where it started."""
    from graphdatabase_spark import registry
    from graphdatabase_spark.operators import graph_queries
    from graphdatabase_spark.functions import dedup

    def persistent_ids():
        return set(spark.sparkContext._jsc.getPersistentRDDs().keySet())

    registry.release()  # start from a clean slate
    before = persistent_ids()
    dedup.QUERIES["dedup_near"](spark, sf_dir).collect()
    graph_queries.QUERIES["triangle_count"](spark, sf_dir).collect()
    assert persistent_ids() - before, "expected shared caches while in use"
    released = registry.release()
    assert released >= 2
    assert persistent_ids() - before == set(), "caches leaked past release()"
    # queries still work after release (caches rebuild transparently)
    assert dedup.QUERIES["dedup_near"](spark, sf_dir).count() >= 0
    registry.release()


def test_salted_join_equals_plain_join(spark, sf_dir):
    """Salting changes distribution, never the result set."""
    from graphdatabase_spark.operators.sqlapi import salted_join
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"), "o_orderpriority")
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("k"), "l_linenumber")
    got = sorted(map(tuple, salted_join(li, orders, "k").collect()))
    want = sorted(map(tuple, li.join(orders, "k").collect()))
    assert got == want
