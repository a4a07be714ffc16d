"""Graph pattern (motif) matching over stored edge sets, compiled to
pure DataFrame self-joins — the GraphFrames ``find()`` surface
(public API: motif strings like ``"(a)-[e]->(b); (b)-[]->(c)"``)
re-expressed over this engine's one-table-of-graphs layout. The
reference has no pattern matching at all; a graph database without it
can't answer "which wedges never close" — the question behind link
prediction, recommendation candidates, and integrity checks.

Grammar (a faithful subset of GraphFrames'):

- terms separated by ``;``: ``(a)-[e]->(b)`` — named or anonymous
  (empty parens/brackets) vertices and edges;
- ``!(a)-[]->(b)`` negates a term: no edge a→b may exist. Negated
  terms must use only already-bound vertex names and an anonymous
  edge (the GraphFrames rule — a negation binds nothing).

Result: one row per binding (homomorphism — repeated vertex names are
allowed to bind the same vid unless the pattern says otherwise,
exactly GraphFrames' semantics), with a ``graph`` column plus one
column per NAMED vertex (long vid) and per NAMED edge (struct
``(src, dst)``). Matches never cross graphs: every join keys on the
graph column too, so ONE call answers the motif for every stored
graph at once (the set-oriented form of the store's other kernels).

Scale shape: k pattern edges compile to k-1 equi-joins of the edge
table against itself, each keyed (graph, vid) — Catalyst/AQE pick
broadcast vs shuffle per join from runtime stats, and disconnected
patterns (which would force a cartesian product) are REJECTED up
front rather than silently exploding.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TERM_RE = re.compile(r"^\s*(!?)\s*\((\w*)\)\s*-\s*\[(\w*)\]\s*->\s*"
                      r"\((\w*)\)\s*$")


def _parse(pattern: str) -> list[tuple[bool, str, str, str]]:
    """Motif string → [(negated, src_name, edge_name, dst_name)];
    anonymous vertices get fresh internal names (never output),
    anonymous edges get empty names."""
    terms = []
    anon = 0
    for raw in pattern.split(";"):
        if not raw.strip():
            continue
        m = _TERM_RE.match(raw)
        if not m:
            raise ValueError(f"unsupported motif term {raw.strip()!r} "
                             f"(expected '(a)-[e]->(b)' or a '!'-negation)")
        neg, a, e, b = (m.group(1) == "!", m.group(2), m.group(3),
                        m.group(4))
        if neg and e:
            raise ValueError(f"negated term {raw.strip()!r} must use an "
                             f"anonymous edge []")
        if e.startswith("__anon"):
            raise ValueError(f"edge name {e!r} collides with the "
                             f"internal anonymous-vertex namespace")
        names = []
        for v in (a, b):
            if v.startswith("__anon"):
                raise ValueError(f"vertex name {v!r} collides with the "
                                 f"internal anonymous-vertex namespace")
            if not v:
                if neg:
                    raise ValueError(f"negated term {raw.strip()!r} must "
                                     f"name both vertices (it can only "
                                     f"constrain already-bound ones)")
                anon += 1
                v = f"__anon{anon}"
            names.append(v)
        terms.append((neg, names[0], e, names[1]))
    if not terms:
        raise ValueError("empty motif pattern")
    # name hygiene up front (the module's loud-ValueError contract):
    # a vertex/edge name that collides with the reserved columns or
    # with a name of the other kind would otherwise build duplicate/
    # ambiguous output columns and die in an opaque AnalysisException
    vnames = {v for _, a, _, b in terms for v in (a, b)
              if not v.startswith("__anon")}
    enames = {e for _, _, e, _ in terms if e}
    reserved = {"graph", "src", "dst"} & (vnames | enames)
    if reserved:
        raise ValueError(f"motif names {sorted(reserved)} collide with "
                         f"the reserved output columns (graph, src, dst)")
    both = vnames & enames
    if both:
        raise ValueError(f"motif names {sorted(both)} are used as both "
                         f"a vertex and an edge name")
    return terms


def named_vertices(pattern: str) -> list[str]:
    """The NAMED-vertex output columns ``find`` returns for
    ``pattern``, in output order (sorted). This IS the contract
    ``engine.find(vertex_structs=True)`` keys its per-vertex struct
    joins on — by name, never by inferring from column dtypes (a
    future non-vid long column must not silently join as a vertex)."""
    terms = _parse(pattern)
    return sorted({v for neg, a, _, b in terms if not neg
                   for v in (a, b) if not v.startswith("__anon")})


def find(edges: DataFrame, pattern: str) -> DataFrame:
    """Match ``pattern`` against ``edges`` (``graph``, ``src``,
    ``dst`` — one row per directed edge, every stored graph at once).
    See module docstring for grammar and output schema."""
    terms = _parse(pattern)
    positive = [t for t in terms if not t[0]]
    negative = [t for t in terms if t[0]]
    if not positive:
        raise ValueError("motif needs at least one positive term")

    # extra edge columns (weights, attributes) ride along inside named
    # edge structs, GraphFrames-style — so callers post-filter bindings
    # with plain expressions (result.filter("e.w > 2")). A multigraph
    # row set (same key, different attributes) binds once per distinct
    # attribute row, exactly like GraphFrames' per-edge-row semantics.
    extra = [c for c in edges.columns if c not in ("graph", "src", "dst")]
    e = edges.select("graph", F.col("src").cast("long"),
                     F.col("dst").cast("long"), *extra).distinct()

    bound: set[str] = set()
    edge_names: list[str] = []
    out = None
    pending = list(positive)
    while pending:
        # pick the next term sharing a vertex with what's bound — a
        # term sharing none would be a cross join (disconnected
        # pattern), rejected below rather than silently cartesian
        idx = None
        for i, (_, a, _, b) in enumerate(pending):
            if out is None or a in bound or b in bound:
                idx = i
                break
        if idx is None:
            raise ValueError(
                f"disconnected motif pattern: terms over "
                f"{sorted(set(v for _, a, _, b in pending for v in (a, b)))} "
                f"share no vertex with the already-joined part — a "
                f"cartesian product at graph scale; split the query")
        _, a, en, b = pending.pop(idx)
        src = e
        if a == b:  # self-loop pattern '(a)-[]->(a)'
            src = e.filter(F.col("src") == F.col("dst"))
            cols = [F.col("graph"), F.col("src").alias(a)]
        else:
            cols = [F.col("graph"), F.col("src").alias(a),
                    F.col("dst").alias(b)]
        if en:
            if en in edge_names:
                raise ValueError(f"edge name {en!r} used twice")
            edge_names.append(en)
            cols.append(F.struct("src", "dst", *extra).alias(en))
        elif extra:
            # anonymous edge on a multigraph: bindings are per EDGE KEY
            # (attributes unobservable), so collapse attribute rows
            src = src.select("graph", "src", "dst").distinct()
        term_df = src.select(*cols)
        if out is None:
            out = term_df
        else:
            on = ["graph"] + [v for v in (a, b) if v in bound]
            out = out.join(term_df, on)
        bound.update((a, b))

    for _, a, _, b in negative:
        missing = [v for v in (a, b) if v not in bound]
        if missing:
            raise ValueError(f"negated term references unbound vertex "
                             f"names {missing}")
        if a == b:  # '!(a)-[]->(a)': no self-loop at a
            neg_df = (e.filter(F.col("src") == F.col("dst"))
                      .select("graph", F.col("src").alias(a)))
            out = out.join(neg_df, ["graph", a], "left_anti")
        else:
            out = out.join(
                e.select("graph", F.col("src").alias(a),
                         F.col("dst").alias(b)),
                ["graph", a, b], "left_anti")

    named_vs = sorted(v for v in bound if not v.startswith("__anon"))
    return out.select("graph", *named_vs, *edge_names)
