"""Dump the formatted physical plans of the headline queries to PLANS.md.

The scale contract (SURVEY.md §4.2) is only real if the plans show it:
filters and projections reaching the parquet scan (PushedFilters /
ReadSchema), broadcast joins on dimension sides, map-side partial
aggregation, no Exchange on bucketed joins, whole-stage codegen over
the expression-heavy operators. This tool regenerates the committed
PLANS.md so plan reviews happen on artifacts, not memories.

Usage: python tools/plan_audit.py  (writes <repo>/PLANS.md)
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

# Headline queries: the most expensive per BENCH_FULL.json plus one per
# plan family worth auditing (pushdown, star join, window, LSH band
# join, as-of, streaming-batch agg, corpus scan).
AUDIT = [
    ("pricing_summary", "scan pushdown + map-side partial agg"),
    ("revenue_by_nation", "star join: broadcast dims, single fact shuffle"),
    ("top_orders_per_customer", "window top-k: one shuffle on the partition key"),
    ("file_search", "predicate pushdown to parquet (PushedFilters)"),
    ("dedup_minhash_lsh", "LSH band equi-join on persisted signatures"),
    ("similarity_topk", "broadcast query shingles vs inverted index + TakeOrdered"),
    ("embedding_cosine_topk", "broadcast query vector, no table shuffle, TakeOrdered"),
    ("asof_join_events", "union + single window carry-forward (one shuffle)"),
    ("events_tumbling_counts", "windowed hash agg, map-side combined"),
    ("contamination_check", "broadcast benchmark set vs shared shingle index"),
    ("quality_repetition", "explode + two-level agg, codegen throughout"),
    ("triangle_count", "degree-ordered orientation, adjacency arrays, AQE join pick"),
    ("connected_components", "large/small-star final assembly: vertex left-join "
     "against the converged star edges (per-round kernel = two groupBy-min "
     "shuffles + two joins; round count pinned by the path-graph test)"),
    ("events_quantiles_approx", "ApproximatePercentile partial+final agg: "
     "mergeable sketches shuffle, never per-group sorted values"),
    ("pii_scrub", "pure regexp projection: single scan, ReadSchema pruned to "
     "(doc_id, text), no Exchange anywhere"),
    ("chunk_dedup", "chunk-hash inverted index: hash-keyed aggs + hash join, "
     "no text in any shuffle"),
    ("corpus_funnel", "per-row flags + one conditional-sum agg; keep-list "
     "join broadcast by AQE"),
    ("ivf_recenter", "posexplode fan-out stays narrow; one (cell,dim)-keyed "
     "map-side-combined agg over the shared cell cache"),
    ("asof_join_events_salted", "seed pass over the per-bucket aggregate + "
     "carry-forward window keyed by (key, bucket), not key alone"),
    ("hybrid_search_rrf", "fusion ranks two k-row TakeOrdered results; the "
     "corpus-scale work stays inside the two search subplans"),
    ("graph_stats", "catalog stats: two map-side-combined aggs per substrate "
     "crossed as 1-row broadcasts (scc itself is a driver superstep loop — "
     "its final plan is a union of checkpoints, so audit its feeder here)"),
    ("store_stream_ingest", "append-chain read after the streamed load: one "
     "partition-pruned parquet scan PER CHAIN COMMIT unioned (no shuffle "
     "until the final agg) — the merge-on-read economics of append commits"),
    ("store_merge_edges", "post-MERGE state: the COW rewrite collapsed the "
     "touched graphs to ONE commit, so the read is a single pruned scan"),
    ("store_snapshot_diff", "CDC read: ONE full-outer sort-merge join keyed "
     "(graph, src, dst) between two pinned snapshots; change-sized output "
     "(unchanged rows filtered before anything wide)"),
    ("store_sql_dml", "SQL-driven bucketed store read-back: the DELETE's COW "
     "rewrite collapsed everything to ONE commit, so the full-catalog "
     "read is a single scan with the current-graphs restriction pushed "
     "to row-group stats (single-GRAPH reads add a gb partition filter "
     "- pinned by the plan test in tests/test_bucketed_store.py)"),
    ("min_cost_supplier", "TPC-H Q2 shape: correlated scalar-MIN as a "
     "per-part broadcast-joined aggregate, dims broadcast, one fact shuffle"),
    ("product_profit", "TPC-H Q9 shape: star join fact-side single shuffle, "
     "all dims broadcast, map-side partial agg on (nation, year)"),
    ("important_parts", "TPC-H Q11 shape: HAVING vs a global scalar — the "
     "1-row global aggregate broadcast-crossed, never a second fact scan "
     "per group"),
    ("parts_supplier_counts", "TPC-H Q16 shape: NOT-IN as broadcast "
     "anti-join + distinct count, no cartesian anywhere"),
    ("excess_stock_suppliers", "TPC-H Q20 shape: nested-IN chain as "
     "left-semi joins, innermost aggregate first"),
    ("returned_item_revenue", "TPC-H Q10 shape: agg-below-join then top-k "
     "(TakeOrdered), customer dim joined AFTER the fact aggregate"),
    ("shipmode_priority", "TPC-H Q12 shape: conditional counts in ONE "
     "map-side-combined agg, shipmode filter pushed to scan"),
    ("vertex_jaccard", "per-edge neighborhood Jaccard: reuses the triangle "
     "corner kernel (degree-ordered adjacency), no wedge materialization"),
    ("motif_find", "pattern matching: two (graph, vid)-keyed self-joins of "
     "the edge table + one anti-join for the negation; NO cartesian "
     "anywhere, AQE picks broadcast vs shuffle per join"),
    ("motif_weighted", "property-graph motif: the same self-join shape over "
     "the props-carrying edge read (kind/w inside named-edge structs), "
     "post-filters pushed below the joins by Catalyst, vertex-prop join "
     "keyed (graph, vid)"),
    ("bfs_expr", "expression-targeted BFS final assembly: target-predicate "
     "join + per-graph MIN agg + join-back (the kernel itself is a driver "
     "superstep loop; its per-level plan is the checkpointed frontier join)"),
    ("shortest_paths_landmarks", "landmark distances: k-replicated reversed "
     "edges via broadcast (graph, landmark) join feeding ONE grouped "
     "kernel; final plan is the checkpoint union + key unpack"),
    ("pregel_max_prop", "generic vertex-program API: per-superstep triplet "
     "join (edges persisted pre-partitioned on (graph, src)) + "
     "(graph, vid) message agg + state join, states checkpointed per "
     "round — the final plan is the last round's checkpointed state"),
    ("embedding_pq_topk", "PQ ANN: cached codes table scanned once with a "
     "broadcast 128-entry ADC LUT folded per row (no corpus shuffle), "
     "TakeOrdered candidate cut, exact re-rank joins only the top-50"),
    ("events_gap_fill", "gapfill: ONE map-side-combined hourly agg over "
     "events lands in an InMemoryRelation; bounds and the type domain are "
     "re-aggregations of that cache (the three Scan-parquet prints below "
     "are the cached relation's DEFINITION repeated per InMemoryTableScan "
     "reference — events is physically scanned once, at materialization); "
     "then grid-sized work — 1-row bounds broadcast, sequence() explode, "
     "LOCF window partitioned by type over types x hours rows"),
    ("store_triangle_all", "whole-store triangles: packed disjoint-range "
     "union feeding the compact-forward kernel once — degree agg + "
     "adjacency collect (both map-side combined) + two adjacency joins, "
     "counts rolled up by u div stride; no wedge materialization"),
    ("pq_recenter", "PQ codebook Lloyd step: session-shared PQ index "
     "scanned once, two narrow posexplode fan-outs, ONE (m,code,dim)-keyed "
     "map-side-combined agg — output rows independent of N"),
    ("store_kcore_all", "whole-store k-core: final plan is the converged "
     "degree table (checkpointed) — per-round work was frontier-sized "
     "loss joins against the cached packed edge set, decode via broadcast "
     "gidx join"),
    ("store_label_propagation_all", "whole-store LPA: last superstep's "
     "checkpointed label table + broadcast gidx decode; per-round plan "
     "was one message join + (vid,label) count shuffle + argmax window"),
    ("store_clustering_all", "whole-store clustering coefficients: the "
     "corner-explode triangle kernel over the packed union — degree agg + "
     "adjacency joins map-side combined, one corner explode (triangle-"
     "sized), per-vertex agg, broadcast decode"),
    ("embedding_ivf_trained_topk", "trained-quantizer IVF probe: the "
     "cached TRAINED cells (Lloyd step + re-assignment, built once) "
     "joined against the broadcast nprobe query cells — same "
     "Exchange-free probe shape as the seed-quantizer path"),
    ("store_props_mor", "merge-on-read vertex props: per-chain-commit "
     "pruned scans, the DELTA rows get a (graph, vid) latest-wins "
     "window (delta-sized, not store-sized) then ONE full-outer join "
     "against the base rows — chains without deltas skip all of it"),
    ("store_merge_edges_mor", "merge-on-read edges (chain-ORDER-aware, "
     "r13): per-commit pruned scans position-tagged, delta rows' "
     "(graph,src,dst) latest-wins window (delta-sized), base survival "
     "via ONE left join against the delta keys (rows after the latest "
     "delta survive), surviving delta rows unioned in with w=0 delete "
     "markers filtered — the same gated shape the traversal kernels "
     "read through; no-delta chains take the plain pre-MoR union"),
    ("embedding_pq_trained_topk", "trained-codebook PQ ANN: the cached "
     "TRAINED codes (Lloyd step per subspace + re-encode, built once) "
     "scanned once with the trained-LUT 128-entry broadcast fold per "
     "row — identical Exchange-free ADC probe shape as the seed path; "
     "training subplan is two narrow fan-outs + one (m,code,dim)-keyed "
     "map-side-combined agg, output independent of N"),
    ("store_sql_maintenance", "SQL maintenance read-back incl. VERSION "
     "AS OF: the historical view is a pruned scan of the seq-4 "
     "manifest's commits, the current view post-OPTIMIZE is ONE "
     "compacted scan; the audit join keys (graph,src,dst) with AQE "
     "picking the strategy — time travel costs a second pruned scan, "
     "never a log replay"),
    ("embedding_ivf_stored_topk", "stored-codebook ANN serving: the training "
     "subplan is REPLACED by one broadcast-sized parquet scan of the "
     "committed ivf_codebook store table (train-once/serve-many); the "
     "probe downstream is byte-identical to the trained path"),
    ("store_table_changes", "SQL CDC rollup: table_changes binds the "
     "two-snapshot full-outer diff (change-sized output) and the "
     "statement aggregates it map-side-combined; no second fact scan"),
    ("embedding_ann_lsh", "multi-probe LSH ANN (r15): the ≤37-row probe "
     "set (query row exploded over literal XOR masks) broadcast against "
     "the bucket-partitioned cached table — one hash join on bucket, "
     "no corpus shuffle, no self-join, TakeOrdered top-k"),
    ("embedding_ivfpq_topk", "composed IVFADC serving (r15): both "
     "codebooks are broadcast-sized committed store-table scans; "
     "candidates = cell-partitioned cached codes joined against the "
     "broadcast nprobe query cells, scored by ONE broadcast-LUT array "
     "fold per row (coarse dot + residual ADC), TakeOrdered "
     "top-(8·√N) cut, exact re-rank joins only the cut"),
]


def main() -> None:
    from graphdatabase_spark import get_spark, registry

    spark = get_spark("plan-audit",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()

    out = [
        "# PLANS — formatted physical plans of the headline queries",
        "",
        f"Generated by `python tools/plan_audit.py` at sf_dir={SF_DIR}.",
        "Plans are pre-execution (AQE placeholders visible: final join",
        "strategies/partition counts resolve at runtime from stats).",
        "What to check per plan is noted above each section.",
        "",
    ]
    for name, why in AUDIT:
        df = qs[name](spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        out += [f"## {name}", "", f"*Audit focus: {why}.*", "", "```",
                buf.getvalue().rstrip(), "```", ""]
    registry.release()
    path = os.path.join(REPO, "PLANS.md")
    with open(path, "w") as f:
        f.write("\n".join(out) + "\n")
    print(f"wrote {path} ({len(AUDIT)} plans)")


if __name__ == "__main__":
    main()
