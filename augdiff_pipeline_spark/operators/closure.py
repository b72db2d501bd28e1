"""Dependency-closure index: batch build + incremental maintenance.

Semantics (locked by fixture tests, no code copied):
- Edge extraction mirrors /root/reference/common/src/main/scala/ComputeIndexLocal.scala:20-47:
  node rows contribute a self-edge (a=b=packed node); way rows one edge
  per nd (a=packed node, b=packed way); relation rows one edge per member
  (a=packed member, b=packed relation).  ``a`` is the referenced entity,
  ``b`` its (transitive, after closure) container.
- The stored index is the transitive closure of the containment relation
  minus self-loops (ComputeIndex.scala:86-89 / ComputeIndexLocal.scala:81-88).
- Incremental update (ComputeIndexLocal.scala:49-89 + the 2-hop Postgres
  fetch PostgresBackend.scala:60-83): restrict to the components touched
  by a change batch via two chained semi-joins on the index, close over
  the union, and emit new edges via a left-anti join.

Spark-first realization: the reference's GraphX Pregel (batch) and
driver do/while over hash maps (incremental) both become an iterative
DataFrame self-join fixpoint with *doubling* composition
(R_{2k} = R_k ∪ R_k∘R_k), so a nesting depth of d converges in
ceil(log2(d)) shuffle rounds instead of d Pregel supersteps.
localCheckpoint() per round truncates lineage.  At 10^12-row scale every
step is a shuffle-partitioned join on the packed long key — no driver
state at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.packing import pair_to_long

MAX_NESTING_ROUNDS = 6  # 2^6 = 64 levels of relation nesting — beyond real OSM


def edges_from_rows(rows: DataFrame, include_node_self_edges: bool = True) -> DataFrame:
    """DataFrame[a: long, b: long] containment edges from entity rows."""
    b_col = pair_to_long(F.col("id"), F.col("type"))

    way_edges = (
        rows.filter(F.col("type") == "way")
        .select(F.explode("nds").alias("nd"), b_col.alias("b"))
        .select(pair_to_long(F.col("nd.ref"), F.lit("node")).alias("a"), "b")
    )
    rel_edges = (
        rows.filter(F.col("type") == "relation")
        .select(F.explode("members").alias("m"), b_col.alias("b"))
        .select(pair_to_long(F.col("m.ref"), F.col("m.type")).alias("a"), "b")
    )
    edges = way_edges.unionByName(rel_edges)
    if include_node_self_edges:
        node_self = (
            rows.filter(F.col("type") == "node")
            .select(b_col.alias("a"), b_col.alias("b"))
        )
        edges = edges.unionByName(node_self)
    return edges


def transitive_closure(edges: DataFrame, max_rounds: int = MAX_NESTING_ROUNDS) -> DataFrame:
    """Closure of (a,b) containment edges, self-loops removed.

    Doubling fixpoint: each round composes the current closure with
    itself ((a,b) ∧ (b,c) → (a,c)) and unions; terminates early when the
    edge count stops growing.  Each round = one shuffle join on ``b``/``a``
    + one distinct; AQE handles skewed containers (a mega-relation's key
    fans out on the build side).
    """
    cur = edges.select("a", "b").distinct().localCheckpoint(eager=True)
    n = cur.count()
    for _ in range(max_rounds):
        composed = (
            cur.alias("l")
            .join(cur.alias("r"), F.col("l.b") == F.col("r.a"))
            .select(F.col("l.a").alias("a"), F.col("r.b").alias("b"))
        )
        nxt = cur.unionByName(composed).distinct().localCheckpoint(eager=True)
        n2 = nxt.count()
        if n2 == n:
            cur = nxt
            break
        cur, n = nxt, n2
    return cur.filter(F.col("a") != F.col("b"))


def two_hop_edges(index: DataFrame, touched_b: DataFrame) -> DataFrame:
    """All index edges of every container component touching the update.

    Reproduces the reference's Postgres subquery
    ``SELECT a,b FROM index WHERE b IN (SELECT DISTINCT b FROM index
    WHERE a IN (touched))`` as two chained semi-joins.  ``touched_b`` is
    a single-column DF named ``a`` of packed changed-entity ids — small
    (one minutely batch), so both probe sides broadcast.
    """
    touched = F.broadcast(touched_b.select(F.col("a")).distinct())
    containers = (
        index.join(touched, on="a", how="left_semi").select("b").distinct()
    )
    return index.join(F.broadcast(containers), on="b", how="left_semi").select("a", "b")


# A minutely batch's touched components are tiny by construction (the
# 2-hop restriction bounds them to the containers of changed entities) —
# the reference closes them in driver memory (ComputeIndexLocal.scala's
# do/while over hash maps).  Below this many edges we do the same: one
# Arrow collect, a python closure (microseconds), one createDataFrame —
# replacing ~8 Spark jobs (fixpoint rounds x checkpoint+count) with 2.
# Components larger than this (or full rebuilds) take the distributed
# doubling fixpoint.  200k edges ~ 3 MB — far beyond any real batch's
# touched set, far below driver limits.
SMALL_COMPONENT_EDGES = 200_000


def _close_edges_py(edges: set[tuple[int, int]]) -> set[tuple[int, int]]:
    """Transitive closure of a small edge set, driver-side.

    Iterative successor-set propagation (semi-naive: a node's closure is
    the union of its successors' closures), looping until fixpoint —
    equivalent to the distributed doubling fixpoint on the same input.
    """
    succ: dict[int, set[int]] = {}
    for a, b in edges:
        succ.setdefault(a, set()).add(b)
    changed = True
    while changed:
        changed = False
        for a, deps in succ.items():
            add = set()
            for b in deps:
                if b in succ:
                    add |= succ[b] - deps
            if add:
                deps |= add
                changed = True
    return {(a, b) for a, deps in succ.items() for b in deps}


def incremental_closure(
    index: DataFrame, change_rows: DataFrame,
    small_component_edges: int = SMALL_COMPONENT_EDGES,
    return_keys: bool = False,
) -> tuple:
    """(new_edges, all_edges[, fetch_keys]) for one change batch.

    all_edges = closure of (batch edges ∪ 2-hop existing edges) — the
    edge set the fetch step needs; new_edges = all_edges \\ existing,
    appended to the index table by the caller.  Self-loops (node
    self-edges) are part of all_edges' *endpoint set* but never stored,
    mirroring the reference.

    Size-routed: the touched edge set is collected and closed driver-
    side when small (the overwhelmingly common minutely case — the
    reference's ComputeIndexLocal.scala:49-89 is exactly this shape);
    the distributed doubling fixpoint handles oversized components.
    Both paths produce identical edge sets (fixture-tested).

    ``return_keys=True`` makes the return a 4-tuple
    (new_edges, all_edges, fetch_keys, new_edge_rows): ``fetch_keys`` is
    the packed fetch-key set (update keys ∪ all_edges endpoints —
    exactly ``needed_pairs``) as a sorted Python list, and
    ``new_edge_rows`` the new-edge pair list — both None when the
    distributed path ran.  The keys ride the SAME Arrow collect as the
    routing probe (batch rows are tagged src=2 in the candidate union),
    so the caller's state fetch needs zero extra probe jobs, and the
    driver-held new edges let the caller append the index delta without
    a Spark write job — on a host where every tiny job costs ~1-2.5 s
    these are measured per-batch latency cuts (round-5 soak profile);
    at scale they remove driver round-trips per minutely batch.
    """
    row_edges = edges_from_rows(change_rows, include_node_self_edges=True)
    touched = row_edges.select(F.col("b").alias("a"))
    existing = two_hop_edges(index, touched)

    # ONE Arrow fetch of the tagged candidate set, capped at the routing
    # bound (src=1 marks index-sourced edges: an edge present in BOTH
    # the batch and the index must count as existing, not new; src=2
    # rows carry the batch rows' own packed keys for the fetch set and
    # are excluded from the edge sets)
    spark = change_rows.sparkSession
    update_keys = change_rows.select(pair_to_long(F.col("id"), F.col("type")).alias("a"))
    cand = (
        row_edges.withColumn("src", F.lit(0))
        .unionByName(existing.withColumn("src", F.lit(1)))
        .unionByName(
            update_keys.select("a", F.col("a").alias("b")).withColumn("src", F.lit(2))
        )
        .limit(small_component_edges + 1)
    )
    tbl = cand.toArrow()
    if tbl.num_rows <= small_component_edges:
        rows_ab = list(zip(tbl["a"].to_pylist(), tbl["b"].to_pylist()))
        srcs = tbl["src"].to_pylist()
        pairs = [p for p, s in zip(rows_ab, srcs) if s != 2]
        update_key_set = {a for (a, _), s in zip(rows_ab, srcs) if s == 2}
        edge_set = set(pairs)
        existing_set = {p for p, s in zip(rows_ab, srcs) if s == 1}
        closed_set = {(a, b) for a, b in _close_edges_py(edge_set) if a != b}
        # self-loops (only batch node self-edges — the stored index never
        # holds them) stay in all_edges' endpoint set, mirroring the
        # distributed branch
        new_set = sorted(closed_set - existing_set)
        all_set = sorted(closed_set | {(a, b) for a, b in edge_set if a == b})
        new_edges = spark.createDataFrame(new_set or [], "a long, b long")
        all_edges = spark.createDataFrame(all_set or [], "a long, b long")
        if return_keys:
            keys = sorted(
                update_key_set
                | {a for a, _ in all_set}
                | {b for _, b in all_set}
            )
            return new_edges, all_edges, keys, new_set
        return new_edges, all_edges

    # Oversize route: checkpoint the probe inputs before the fixpoint —
    # without this the two-hop semi-join plan re-executes once per
    # consumer (the fixpoint seed AND the new-edges anti-join), tripling
    # the probe's work.  The extra jobs land only on this rare branch;
    # the common small-batch path above stays at one candidate scan.
    row_edges = row_edges.localCheckpoint(eager=True)
    existing = existing.localCheckpoint(eager=True)
    closed = transitive_closure(row_edges.unionByName(existing))
    new_edges = closed.join(existing.select("a", "b"), on=["a", "b"], how="left_anti")
    # endpoints of self-loop edges still matter for the fetch set:
    all_edges = closed.unionByName(
        row_edges.filter(F.col("a") == F.col("b")).select("a", "b")
    ).distinct()
    if return_keys:
        return new_edges, all_edges, None, None  # too big for driver-side
    return new_edges, all_edges


def needed_pairs(change_rows: DataFrame, all_edges: DataFrame) -> DataFrame:
    """DataFrame[k: long] of packed (id,type) keys whose rows must be
    fetched from state to render the batch (AugmentedDiff.scala:60-83
    semantics: update triples ∪ both endpoints of every edge)."""
    from_update = change_rows.select(pair_to_long(F.col("id"), F.col("type")).alias("k"))
    from_edges = all_edges.select(F.col("a").alias("k")).unionByName(
        all_edges.select(F.col("b").alias("k"))
    )
    return from_update.unionByName(from_edges).distinct()
