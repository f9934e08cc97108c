"""Connected components over the xref/equivalence graph — alternating
large-star / small-star (Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC 2014), expressed in pure DataFrame ops.

The reference keeps xrefs as pairwise edges only (struct_utils.py:800-818);
the north rule requires equivalence CLASSES, i.e. CC with a canonical
representative (min curie) per class.

Scale design: each round is two shuffles (groupBy node); the algorithm
converges in O(log^2 n) rounds on any graph and O(log n) in practice.
Hub-skew (a node with ~30% of edges — NCBITaxon-style) is absorbed by
(a) AQE skew-join splitting and (b) the large-star step itself, which
re-attaches a hub's neighbors directly to the minimum — the classic
pointer-halving that makes the star graphs shallow. localCheckpoint per
round cuts lineage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Collect bound for the driver-side union-find fast path (same
#: reasoning — and same default — as hierarchy.BROADCAST_CLOSURE_MAX_
#: EDGES): ontology xref/equivalence graphs are bounded artifacts that
#: do not scale with the corpus, and the fuzzy-dedup candidate graph is
#: the (small) LSH-survivor set, not the corpus. 3e6 int64 edge pairs
#: collect at ~50 MB via Arrow. Above the bound the alternating-star
#: rounds below run unchanged.
CC_BROADCAST_MAX_EDGES = 3_000_000


def _cc_broadcast_bound() -> int:
    import os

    return int(
        os.environ.get(
            "PYOBO_SPARK_CC_BROADCAST_MAX_EDGES", CC_BROADCAST_MAX_EDGES
        )
    )


#: Diagnostics from the most recent connected_components() call in this
#: process: {"rounds": star-rounds run (incl. the final no-change round
#: that proves convergence), "edges_per_round": symmetric-edge count
#: after each round}. The fingerprint count is computed anyway for the
#: convergence test, so recording it costs nothing; used by the
#: convergence-evidence test (rounds ~ O(log diameter)) and SCALING.md.
LAST_CC_STATS: dict = {}


def _partitioned_dedup(df: DataFrame) -> DataFrame:
    """(src, dst) dedup CO-LOCATED by src: one explicit hash(src)
    exchange; the dedup aggregation, the per-node min aggregation and
    the star join downstream all reuse that partitioning
    (HashPartitioning(src) satisfies ClusteredDistribution(src, dst) —
    subset clustering), so each star round runs on a SINGLE exchange
    instead of the plain-distinct form's hash(src, dst) exchange
    followed by a re-shuffle to hash(src) for the groupBy and join
    (guide §2.4 "two operations keyed the same way can share one
    exchange"; measured ~1.5x on the 10x corpus)."""
    return df.repartition("src").dropDuplicates(["src", "dst"])


def _canonical_undirected(edges: DataFrame) -> DataFrame:
    """Make edges undirected & canonical: keep both directions, drop
    self-loops and dupes. Symmetrized by a map-side explode (one scan
    of the edge source, not one per direction)."""
    both = edges.select(
        F.explode(
            F.array(
                F.struct(F.col("src").alias("src"), F.col("dst").alias("dst")),
                F.struct(F.col("dst").alias("src"), F.col("src").alias("dst")),
            )
        ).alias("_e")
    ).select("_e.src", "_e.dst")
    return _partitioned_dedup(both.where(F.col("src") != F.col("dst")))


def _large_star(e: DataFrame) -> DataFrame:
    """For each node u, connect every strictly-larger neighbor v (v>u by
    string order) to m = min(neighbors(u) ∪ {u})."""
    nbrs = e  # already symmetric: rows (u=src, v=dst)
    m = nbrs.groupBy("src").agg(
        F.least(F.min("dst"), F.first("src")).alias("m")
    )
    big = nbrs.where(F.col("dst") > F.col("src")).alias("n").join(
        m.alias("m"), on="src"
    )
    # no distinct here: the caller symmetrizes and dedups in ONE shuffle
    return big.select(F.col("n.dst").alias("src"), F.col("m.m").alias("dst")).where(
        F.col("src") != F.col("dst")
    )


def _small_star(e: DataFrame) -> DataFrame:
    """For each node u, connect every ≤-neighbor v (v<=u) to
    m = min(small-neighbors(u) ∪ {u})."""
    small = e.where(F.col("dst") <= F.col("src"))
    m = small.groupBy("src").agg(
        F.least(F.min("dst"), F.first("src")).alias("m")
    )
    joined = small.join(m, on="src")
    out = joined.select(F.col("dst").alias("src"), F.col("m").alias("dst")).unionByName(
        m.select(F.col("src"), F.col("m").alias("dst"))
    )
    # no distinct here: caller dedups after symmetrization
    return out.where(F.col("src") != F.col("dst"))


def _cc_broadcast(edges: DataFrame) -> DataFrame:
    """Driver-side union-find for bounded graphs: a CONSTANT number of
    jobs instead of O(log n) star rounds at 3 exchanges each (guide
    §1.2: fix the distributed algorithm first).

    Strings never cross the Python driver boundary (the lesson from
    hierarchy._ancestors_broadcast's string-keyed prototype): node ids
    become JVM surrogate ids assigned AFTER a global sort of the node
    column — monotonically_increasing_id over range-partitioned sorted
    nodes is order-preserving (partition index in the high bits, row
    offset in the low bits), so gid order == node order and the min-gid
    root of a component IS its min-node representative. The driver
    collects only int64 edge pairs (Arrow), runs vectorized min-label
    propagation with pointer-jumping compression (numpy — converges in
    O(log n) rounds), ships back an int64 (gid, root) table, and the
    id→string translation at both ends is a JVM broadcast hash join.

    The eager localCheckpoint pins the nondeterministic gid expression
    so every consumer (sn/dn translation sides, the result joins) sees
    ONE id assignment.
    """
    import numpy as np
    import pandas as pd

    spark = edges.sparkSession
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .orderBy("node")
        .withColumn("gid", F.monotonically_increasing_id())
        .localCheckpoint(eager=True)
    )
    sn = nodes.select(F.col("node").alias("_sn"), F.col("gid").alias("sgid"))
    dn = nodes.select(F.col("node").alias("_dn"), F.col("gid").alias("dgid"))
    ne = edges.where(F.col("src") != F.col("dst"))
    e_idx = (
        ne.join(F.broadcast(sn), ne.src == sn._sn)
        .join(F.broadcast(dn), ne.dst == dn._dn)
        .select("sgid", "dgid")
    )
    pdf = e_idx.toPandas()  # bounded ints: caller checked the edge count
    sg = pdf["sgid"].to_numpy(dtype=np.int64)
    dg = pdf["dgid"].to_numpy(dtype=np.int64)
    if len(sg):
        uniq = np.unique(np.concatenate([sg, dg]))  # sorted: dense ids
        u = np.searchsorted(uniq, sg)  # keep gid (== node) order
        v = np.searchsorted(uniq, dg)
        lab = np.arange(len(uniq), dtype=np.int64)
        while True:
            # each endpoint adopts the smaller current label; labels
            # only ever flow along edges, so they stay in-component and
            # decrease monotonically toward the component's min dense
            # id (== min gid == min node, by the order-preserving maps)
            m = np.minimum(lab[u], lab[v])
            np.minimum.at(lab, u, m)
            np.minimum.at(lab, v, m)
            while True:  # pointer-jumping compression
                ll = lab[lab]
                if np.array_equal(ll, lab):
                    break
                lab = ll
            if np.array_equal(lab[u], lab[v]):
                break  # every edge internally agreed -> converged
        map_pdf = pd.DataFrame({"gid": uniq, "root": uniq[lab]})
    else:  # only self-loops (or no edges at all)
        map_pdf = pd.DataFrame(
            {
                "gid": pd.Series(dtype="int64"),
                "root": pd.Series(dtype="int64"),
            }
        )
    map_df = spark.createDataFrame(map_pdf, schema="gid long, root long")
    # isolated nodes (self-loop-only) have no map row: they label
    # themselves via the coalesce
    labeled = nodes.join(F.broadcast(map_df), on="gid", how="left").select(
        F.col("node").alias("curie"),
        F.coalesce(F.col("root"), F.col("gid")).alias("_rg"),
    )
    rep = nodes.select(F.col("gid").alias("_rg"), F.col("node").alias("component"))
    return labeled.join(F.broadcast(rep), on="_rg").select("curie", "component")


def connected_components(
    edges: DataFrame,
    max_iter: int = 30,
    broadcast_edge_bound: int | None = None,
) -> DataFrame:
    """Return (curie, component) where component = min curie of the class.

    edges: DataFrame(src, dst) — direction irrelevant.

    Graphs whose RAW edge count (an over-estimate: direction dupes and
    self-loops included, so the check never under-counts) fits
    ``broadcast_edge_bound`` (default CC_BROADCAST_MAX_EDGES,
    env-overridable via PYOBO_SPARK_CC_BROADCAST_MAX_EDGES; pass 0 to
    force the distributed rounds) are solved by a driver-side
    union-find — see :func:`_cc_broadcast`. Larger graphs run the
    alternating large-star/small-star rounds unchanged.
    """
    bound = (
        _cc_broadcast_bound()
        if broadcast_edge_bound is None
        else broadcast_edge_bound
    )
    if bound > 0 and edges.count() <= bound:
        LAST_CC_STATS.clear()
        LAST_CC_STATS["rounds"] = 0
        LAST_CC_STATS["edges_per_round"] = []
        LAST_CC_STATS["mode"] = "broadcast"
        return _cc_broadcast(edges)
    spark = edges.sparkSession
    nodes = (
        edges.select(F.col("src").alias("curie"))
        .unionByName(edges.select(F.col("dst").alias("curie")))
        .distinct()
    )
    # lazy: the prev_fp fingerprint below is the first consumer and
    # materializes the checkpoint inside its own job (r7 A/B: one job
    # per round saved vs eager, ~5-8% per round at both scales in the
    # src-clustered round structure)
    e = _canonical_undirected(edges).localCheckpoint(eager=False)

    def _fingerprint(df: DataFrame) -> tuple[int, int]:
        """Cheap set fingerprint: (count, XOR of row hashes). One job
        instead of two exceptAll scans per round; XOR is overflow-free
        (ANSI-safe) and exact for sets (each round's edges are distinct);
        collision on a CHANGED set is ~2^-64 per round."""
        row = df.select(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(xxhash64(src, dst))").alias("h"),
        ).first()
        return (row["n"], row["h"])

    def _sym_dedup(df: DataFrame) -> DataFrame:
        """Symmetrize + dedup in a single src-clustered shuffle.

        r7: symmetrization is an EXPLODE of each row into its two
        directions, not a union of the subtree with its own reversal —
        the union form planned the star's aggregate+join subtree TWICE
        per half-round (one copy per union branch), doubling the
        per-round compute."""
        both = df.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("src").alias("src"), F.col("dst").alias("dst")
                    ),
                    F.struct(
                        F.col("dst").alias("src"), F.col("src").alias("dst")
                    ),
                )
            ).alias("_e")
        ).select("_e.src", "_e.dst")
        return _partitioned_dedup(both)

    LAST_CC_STATS.clear()
    LAST_CC_STATS["rounds"] = 0
    LAST_CC_STATS["edges_per_round"] = []
    LAST_CC_STATS["mode"] = "stars"
    prev_fp = _fingerprint(e)
    for _ in range(max_iter):
        # one explicit hash(src) repartition per round: the checkpoint
        # below forgets e's physical layout, and re-establishing it
        # here lets BOTH stars' groupBy+join run exchange-free on the
        # shared partitioning (3 exchanges/round total vs 6 for the
        # plain-distinct form)
        ep = e.repartition("src")
        e2 = _sym_dedup(_large_star(ep))
        # lazy (r7 — reverses the r6 eager finding, which was measured
        # on the old round structure): the fingerprint is the first
        # consumer and materializes the checkpoint in-job, saving the
        # dedicated materialization job each round (A/B: 7.7->7.1 s at
        # sf1.0, 9.5->9.2 s at 10x).
        e3 = _sym_dedup(_small_star(e2)).localCheckpoint(eager=False)
        fp = _fingerprint(e3)
        e = e3
        LAST_CC_STATS["rounds"] += 1
        LAST_CC_STATS["edges_per_round"].append(fp[0])
        if fp == prev_fp:
            break
        prev_fp = fp

    # after convergence the symmetric edge set is a union of stars:
    # component(u) = min(u, min(neighbors(u)))
    comp = e.groupBy("src").agg(F.min("dst").alias("nbr_min"))
    comp = comp.select(
        F.col("src").alias("curie"),
        F.least(F.col("src"), F.col("nbr_min")).alias("component"),
    )
    # isolated nodes (no edges after self-loop removal) map to themselves
    iso = nodes.join(comp.select("curie"), on="curie", how="left_anti").select(
        F.col("curie"), F.col("curie").alias("component")
    )
    return comp.unionByName(iso)
