"""graphdatabase_spark — a PySpark-native analytics engine.

A ground-up rebuild of the query surface of the reference system
(Sabr-eX/GraphDatabase: a C client–server named-graph store with
add/modify-graph, BFS-level-order and DFS-leaf traversals, plus file
search and word count — see SURVEY.md), re-expressed Spark-first:

- graphs are edge/vertex DataFrames stored as Parquet partitioned by
  graph name (not adjacency-matrix text files);
- traversals are Pregel-style level-synchronous superstep loops over
  DataFrame joins (the reference's own BSP structure: one pthread
  barrier per BFS level, ``secondary_server.c:601-618``);
- concurrency control is immutable files + atomic partition overwrite
  (replacing the reference's named-semaphore RW lock,
  ``primary_server.c:110-146``);
- the surface is extended with relational, text-analytics, dedup,
  similarity-search, multimodal and streaming operators designed for
  100 TB scale (SURVEY.md §2.3).

Everything is public PySpark DataFrame/SQL API; no custom Catalyst
rules, no JVM code.
"""

__version__ = "0.1.0"

from graphdatabase_spark.engine import GraphEngine  # noqa: F401
from graphdatabase_spark.session import get_spark  # noqa: F401
