"""Physical-plan inspection helpers.

The scale story of this engine rests on plan properties — filters
reaching the parquet scan, dimension joins broadcasting, aggregates
running a map-side partial before their exchange, whole-stage codegen
spanning the hot expressions. These helpers expose those properties as
code so tests (tests/test_io_and_plans.py) and users can gate on them
instead of eyeballing ``.explain`` output.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """``EXPLAIN FORMATTED`` text of the current (possibly AQE-final)
    physical plan. Call after an action to see ``isFinalPlan=true``
    with codegen ids."""
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def pushed_filters(df: DataFrame) -> list[str]:
    """Filter expressions the scan actually pushed down, e.g.
    ``["IsNotNull(l_quantity)", "GreaterThan(l_quantity,45.0)"]``.
    Empty list = nothing pushed (a red flag for selective queries)."""
    out: list[str] = []
    for line in formatted_plan(df).splitlines():
        m = re.search(r"PushedFilters: \[(.*)\]", line)
        if m and m.group(1):
            out.extend(s.strip() for s in m.group(1).split(",") if s.strip())
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of each scan — the columns actually read. A scan
    whose ReadSchema lists columns the query never uses means column
    pruning failed."""
    return [line.split("ReadSchema:", 1)[1].strip()
            for line in formatted_plan(df).splitlines() if "ReadSchema:" in line]


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def has_partial_aggregate(df: DataFrame) -> bool:
    """True when a hash aggregate runs map-side (two HashAggregate
    nodes around an exchange) — the shape that keeps a 100 TB groupBy
    from shuffling raw rows."""
    plan = formatted_plan(df)
    return plan.count("HashAggregate") >= 2 and "Exchange" in plan


def codegen_span_count(df: DataFrame) -> int:
    """Number of whole-stage-codegen spans in the executed plan (0
    before an action under AQE). More/wider spans = more of the query
    runs as generated JVM code."""
    return len(set(re.findall(r"codegen id : (\d+)", formatted_plan(df))))
