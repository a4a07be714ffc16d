"""As-of / range join: oracle parity + hand-computed semantics on
literal frames (tie-at-same-instant, no-match-null, bucket boundaries)."""

import datetime as dt

import pytest

from graphdatabase_spark.operators import temporal

from tests.parity import assert_parity

T0 = dt.datetime(2024, 1, 1)


def _ts(sec):
    return T0 + dt.timedelta(seconds=sec)


@pytest.mark.parametrize("name", sorted(temporal.ORACLES))
def test_temporal_parity(spark, sf_dir, name):
    assert_parity(temporal.QUERIES[name](spark, sf_dir), temporal.ORACLES[name], sf_dir)


def test_events_quantiles_approx_within_rank_tolerance(spark, sf_dir):
    """The rows-only approximate variant must track the exact operator:
    percentile_approx guarantees a rank error ≤ n/accuracy, so each
    approximate quantile must lie within the exact [q−ε, q+ε] value
    band (ε = 0.01 rank ≫ the sketch's guarantee at these group
    sizes), and group counts must match exactly."""
    from pyspark.sql import functions as F

    eps = 0.01
    exact = {r["event_type"]: r for r in (
        temporal.events_batch(spark, sf_dir)
        .groupBy("event_type")
        .agg(*[F.expr(f"percentile(value, array({q - eps}, {q + eps}))").alias(f"b{int(q*100)}")
               for q in (0.5, 0.9)],
             F.expr(f"percentile(value, array({0.99 - eps}, 1.0))").alias("b99"),
             F.count(F.lit(1)).alias("n_events"))).collect()}
    approx = temporal.q_events_quantiles_approx(spark, sf_dir).collect()
    assert {r["event_type"] for r in approx} == set(exact)
    for r in approx:
        e = exact[r["event_type"]]
        assert r["n_events"] == e["n_events"]
        for col, band in (("p50", "b50"), ("p90", "b90"), ("p99", "b99")):
            lo, hi = e[band]
            assert lo <= r[col] <= hi, (r["event_type"], col, r[col], (lo, hi))


def test_asof_semantics(spark):
    left = spark.createDataFrame(
        [(1, _ts(10)), (1, _ts(20)), (1, _ts(5)), (2, _ts(10))],
        "k int, ts timestamp")
    right = spark.createDataFrame(
        [(1, _ts(10), 100.0), (1, _ts(15), 200.0), (3, _ts(1), 999.0)],
        "k int, ts timestamp, v double")
    out = {(r["k"], r["ts"]): r["v_asof"] for r in
           temporal.asof_join(left, right, "k", "ts", ["v"]).collect()}
    assert out[(1, _ts(10))] == 100.0   # same-instant right row matches (inclusive)
    assert out[(1, _ts(20))] == 200.0   # latest preceding
    assert out[(1, _ts(5))] is None     # nothing at-or-before
    assert out[(2, _ts(10))] is None    # key with no right rows


def test_range_join_bucket_boundaries(spark):
    """Pairs straddling a bucket boundary must still be found (the ±1
    bucket fan-out), and pairs just outside the width must not."""
    width = 10
    left = spark.createDataFrame([(1, 1, _ts(19))], "event_id int, k int, ts timestamp")
    right = spark.createDataFrame(
        [(10, 1, _ts(21)), (11, 1, _ts(29)), (12, 1, _ts(30)), (13, 2, _ts(19))],
        "rid int, k int, ts timestamp")
    out = temporal.range_join(left, right, "k", "ts", width, ["rid"]).collect()
    got = sorted(r["r_rid"] for r in out)
    # 21 and 29 are within ±10s of 19 (29 crosses the bucket boundary);
    # 30 is outside (|30-19| = 11); key 2 never joins
    assert got == [10, 11]


def test_asof_salted_equals_plain_on_hot_key(spark):
    """The salted operator must be byte-equivalent to the plain one on
    a single pathologically hot key with multi-bucket gaps (incl. a
    bucket with left rows but no right rows, fed by a seed from
    several buckets back)."""
    import datetime

    from pyspark.sql import functions as F

    base = datetime.datetime(2024, 1, 1)
    left = spark.range(5000).select(
        F.col("id").alias("event_id"), F.lit(7).alias("user_id"),
        (F.lit(base) + F.make_interval(secs=F.col("id") * 37)).alias("ts"))
    # sparse right side: long stretches of buckets with no right rows
    right = spark.range(0, 5000, 400).select(
        F.lit(7).alias("user_id"),
        (F.lit(base) + F.make_interval(secs=F.col("id") * 37 + 1)).alias("ts"),
        (F.col("id") * 2.0).alias("value"))
    a = sorted(map(tuple, temporal.asof_join(
        left, right, "user_id", "ts", ["value"]).collect()))
    b = sorted(map(tuple, temporal.asof_join_salted(
        left, right, "user_id", "ts", ["value"], bucket_sec=600).collect()))
    assert a == b


def test_asof_salted_edge_semantics(spark):
    """Boundary semantics survive salting: same-instant inclusive
    match, a right row exactly at a bucket start supersedes the seed,
    and keys with no right rows stay NULL."""
    rows_l = [(1, 1, _ts(10)), (2, 1, _ts(20)), (3, 1, _ts(25)), (4, 2, _ts(10))]
    rows_r = [(1, _ts(10), 100.0), (1, _ts(20), 200.0)]
    left = spark.createDataFrame(rows_l, "event_id int, k int, ts timestamp")
    right = spark.createDataFrame(rows_r, "k int, ts timestamp, v double")
    # bucket_sec=20 puts ts=20 exactly at a bucket boundary
    out = {(r["event_id"]): r["v_asof"] for r in
           temporal.asof_join_salted(left, right, "k", "ts", ["v"],
                                     bucket_sec=20).collect()}
    assert out[1] == 100.0   # same-instant inclusive
    assert out[2] == 200.0   # right row AT the bucket start wins over the seed
    assert out[3] == 200.0
    assert out[4] is None    # key with no right rows


def test_asof_salted_rejects_nonpositive_bucket(spark):
    """bucket_sec <= 0 must raise up front — floor(us / 0) would
    otherwise NULL every bucket and silently collapse the salting."""
    left = spark.createDataFrame([(1, 1, _ts(10))],
                                 "event_id int, k int, ts timestamp")
    right = spark.createDataFrame([(1, _ts(5), 1.0)],
                                  "k int, ts timestamp, v double")
    for bad in (0, -600):
        with pytest.raises(ValueError, match="bucket_sec"):
            temporal.asof_join_salted(left, right, "k", "ts", ["v"],
                                      bucket_sec=bad)


def test_asof_salted_random_sweep_vs_plain(spark):
    """Seeded random cases — random keys, clustered and sparse right
    rows, timestamps straddling bucket boundaries — must match the
    plain operator exactly for several bucket widths."""
    import datetime
    import random

    base = datetime.datetime(2024, 1, 1)
    for seed in (3, 11, 99):
        rng = random.Random(seed)
        lrows = [(i, rng.randint(1, 4),
                  base + datetime.timedelta(seconds=rng.randint(0, 5000)))
                 for i in range(200)]
        rrows = list({(rng.randint(1, 4),
                       base + datetime.timedelta(seconds=rng.randint(0, 5000))): None
                      for _ in range(40)})
        rrows = [(k, ts, float(i)) for i, (k, ts) in enumerate(sorted(rrows))]
        left = spark.createDataFrame(lrows, "event_id int, k int, ts timestamp")
        right = spark.createDataFrame(rrows, "k int, ts timestamp, v double")
        want = sorted(map(tuple, temporal.asof_join(
            left, right, "k", "ts", ["v"]).collect()))
        for bucket_sec in (7, 600, 10**6):
            got = sorted(map(tuple, temporal.asof_join_salted(
                left, right, "k", "ts", ["v"], bucket_sec=bucket_sec).collect()))
            assert got == want, f"seed {seed} bucket {bucket_sec}"
