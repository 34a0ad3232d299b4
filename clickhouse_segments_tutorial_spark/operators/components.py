"""Connected components over near-dup pairs -> dedup groups.

Pair operators (dedup.jaccard_pairs / minhash_lsh_pairs / simhash_pairs,
similarity.cosine_pairs*) emit EDGES; a training-data pipeline needs the
GROUPS: "these 4 documents are all the same article — keep one". That is
connected components over the pair graph, with the canonical representative
of each component (the minimum id) as the dedup keeper.

Algorithm: alternating large-star / small-star (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC 2014) — the shuffle-native CC
algorithm:

- large-star: every node connects its LARGER neighbors to the smallest
  node in its closed neighborhood;
- small-star: every node connects its smaller-or-equal neighbors to that
  minimum.

Each round is two groupBy-min shuffles over the edge list; the edge set
converges to stars whose centers are the component minima in O(log^2 n)
rounds (2-3 in practice for near-dup graphs, which are clique-ish). This
beats label propagation (O(graph diameter) rounds — a 1000-doc duplicate
chain would take 1000 shuffles) and never materializes anything bigger
than the edge list itself.

Scale notes:
- per-iteration lineage is truncated (localCheckpoint) — without it the
  plan doubles every round and Catalyst analysis dominates by iteration
  ~10. On a cluster, point this at reliable checkpointing instead.
- the convergence check is a count of changed edges (one action per
  round), not a driver collect of the edge list.
- skew: a giant duplicate class becomes one star — the groupBy(min) on
  its center is one hot key handled by partial aggregation map-side
  (min is algebraic), so the hot reducer receives one row per map task.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F

# Edge-count threshold for the scale-adaptive LOCAL path (the
# operators/bpe.py BPE_LOCAL_DICT_MAX design): when the deduplicated
# edge list is a bounded small relation, every star round's 4 shuffles
# + checkpoint + convergence action are pure orchestration overhead —
# measured 5-7 s for a 241-edge graph at sf0.1, vs milliseconds of
# driver-side union-find. Near-dup pair graphs are usually tiny
# relative to the corpus (only docs WITH a near-dup appear), but they
# are not bounded by construction, so past the gate the star loop runs
# unchanged.
COMPONENTS_LOCAL_EDGES_MAX = 262_144


def _large_star(edges: DataFrame) -> DataFrame:
    """One large-star round over a symmetric edge list (u, v)."""
    sym = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = sym.groupBy("u").agg(F.least(F.min("v"), F.col("u")).alias("m"))
    return (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """One small-star round: edges arrive pointing large -> small (u > v)."""
    pointed = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    )
    mins = pointed.groupBy("u").agg(F.min("v").alias("m"))
    neighbors = pointed.join(mins, "u").select(
        F.col("v").alias("u"), F.col("m").alias("v")
    )
    selfs = mins.select("u", F.col("m").alias("v"))
    return neighbors.union(selfs).filter(F.col("u") != F.col("v")).distinct()


def _components_local(rows: list) -> dict:
    """Driver-side union-find over a collected (u, v) edge list with
    min-id roots — value-identical to the star loop's fixed point:
    every node maps to the minimum node reachable through the
    undirected graph. Path-compressed find; union keeps the smaller
    root (so the representative IS the component minimum).

    String ids are compared on their UTF-8 BYTES, matching Spark's
    binary collation exactly (the bpe.py/unigram.py .encode() rule —
    one ordering definition for the local and distributed paths, even
    though Python's codepoint order and UTF-8 byte order happen to
    agree for valid codepoints)."""
    parent: dict = {}

    def _key(x):
        return x.encode("utf-8") if isinstance(x, str) else x

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for row in rows:
        u, v = row["u"], row["v"]
        ru, rv = find(u), find(v)
        if ru != rv:
            # attach the LARGER root under the smaller one, so every
            # root is its component's minimum id
            if _key(rv) < _key(ru):
                ru, rv = rv, ru
            parent[rv] = ru
    return {x: find(x) for x in parent}


def connected_components(
    edges: DataFrame,
    *,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 50,
    local_edges_max: int | None = None,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``; component =
    the minimum node id reachable through the undirected pair graph.

    Component roots are included as (root, root) rows, so the output has
    exactly one row per distinct node in the edge list. ``max_iterations``
    is a runaway backstop, not a tuning knob — the star rounds converge
    in O(log^2 n); hitting the cap raises."""
    spark = edges.sparkSession
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    if local_edges_max is None:
        raw_max = os.environ.get("SPARK_GRAFT_CC_LOCAL_EDGES_MAX", "")
        try:
            local_edges_max = int(raw_max)
        except ValueError:
            # a non-numeric env value must not crash every
            # connected_components call — fall back to the constant
            local_edges_max = COMPONENTS_LOCAL_EDGES_MAX
    # skip the gate's count action entirely when the local path is
    # disabled (local_edges_max <= 0 means "always distributed")
    if local_edges_max > 0 and e.count() <= local_edges_max:
        comp = _components_local(e.collect())  # bounded by the gate
        node_t = e.schema["u"].dataType.simpleString()
        return spark.createDataFrame(
            sorted(comp.items()) + sorted({(r, r) for r in comp.values()}),
            f"node {node_t}, component {node_t}",
        )
    for _ in range(max_iterations):
        stepped = _small_star(_large_star(e)).localCheckpoint()
        # converged when the directed edge set is a fixed point: every
        # node points straight at its component minimum. Both anti-join
        # probes ride ONE action (a union of limit-1 sides) — two
        # separate .count() calls paid a full job-scheduling round-trip
        # each, pure orchestration overhead in an iterative loop; no
        # driver-side edge materialization either way.
        changed = (
            stepped.exceptAll(e).limit(1)
            .unionAll(e.exceptAll(stepped).limit(1))
            .count()
        )
        e = stepped
        if changed == 0:
            members = e.select(F.col("u").alias("node"), F.col("v").alias("component"))
            roots = e.select(
                F.col("v").alias("node"), F.col("v").alias("component")
            ).distinct()
            return members.union(roots)
    raise RuntimeError(f"connected_components did not converge in {max_iterations} rounds")


def dedup_groups(
    docs: DataFrame,
    pairs: DataFrame,
    *,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Every document's dedup group and keeper decision.

    Returns (doc_id, rep_id, keep): rep_id is the smallest doc id in the
    document's near-dup component (itself for singletons), keep is true
    exactly for the representative — ``filter("keep")`` is the deduped
    corpus. The components frame is tiny relative to the corpus (only
    docs that HAVE a near-dup appear), so the join back is broadcast-able;
    Spark's AQE will pick that up from its size, no hint needed."""
    comp = connected_components(pairs, src=src, dst=dst)
    return (
        docs.select(id_col)
        .join(comp.withColumnRenamed("node", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce("component", F.col(id_col)).alias("rep_id"),
        )
        .withColumn("keep", F.col(id_col) == F.col("rep_id"))
    )
