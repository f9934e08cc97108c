"""Hierarchy (graph) operators — the reference's "recursive queries"
(SURVEY.md §2.6; reference: nx.DiGraph built at struct.py:1498-1519,
ancestors/descendants via nx traversal struct.py:1473-1496,
api/hierarchy.py:140-227).

Spark-first design: the hierarchy is an edge DataFrame (child, parent);
transitive closure is an iterative frontier self-join (BFS). Each
iteration localCheckpoints to cut lineage (otherwise the plan doubles per
hop and Catalyst analysis time blows up). Edge tables are re-used across
iterations, so on a cluster you'd persist the (hash-partitioned-by-child)
edges once and every join co-locates on that partitioning — one shuffle
total for the whole closure, not one per hop. Depth is O(DAG depth), ~5
for the fixture tree, ~15 for real ontologies (GO max depth ≈ 16).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def hierarchy_edges(
    parents: DataFrame,
    relations: DataFrame,
    prefix: str,
    include: tuple[tuple[str, str], ...] = (("BFO", "0000050"),),
    include_reversed: tuple[tuple[str, str], ...] = (),
) -> DataFrame:
    """get_hierarchy's edge set (api/hierarchy.py:43-125): is_a edges ∪
    selected relation predicates (child→parent direction) ∪ REVERSED
    predicates (e.g. has_part reversed to part-of direction, has_member
    reversed to member_of). Returns (child_curie, parent_curie,
    predicate_curie)."""
    isa = parents.select(
        F.concat(F.lit(prefix + ":"), F.col("child")).alias("child_curie"),
        F.concat(F.lit(prefix + ":"), F.col("parent")).alias("parent_curie"),
        F.lit("rdfs:subClassOf").alias("predicate_curie"),
    )
    out = isa
    for rp, ri in include:
        fwd = relations.where(
            (F.col("relation_prefix") == rp) & (F.col("relation_id") == ri)
        ).select(
            F.concat("prefix", F.lit(":"), "identifier").alias("child_curie"),
            F.concat("target_prefix", F.lit(":"), "target_id").alias(
                "parent_curie"
            ),
            F.lit(f"{rp}:{ri}").alias("predicate_curie"),
        )
        out = out.unionByName(fwd)
    for rp, ri in include_reversed:
        rev = relations.where(
            (F.col("relation_prefix") == rp) & (F.col("relation_id") == ri)
        ).select(
            F.concat("target_prefix", F.lit(":"), "target_id").alias(
                "child_curie"
            ),
            F.concat("prefix", F.lit(":"), "identifier").alias("parent_curie"),
            F.lit(f"{rp}:{ri}^-1").alias("predicate_curie"),
        )
        out = out.unionByName(rev)
    return out.distinct()


def ancestors(edges: DataFrame, max_iter: int = 50) -> DataFrame:
    """Full transitive closure upward: (identifier, ancestor) for every
    node with ≥1 edge. BFS over (child, parent) edges.

    Semantics match nx.descendants on the reference's child→parent graph
    (struct.py:1473-1476): the node itself is NOT included.
    """
    edges = edges.select("child", "parent").distinct()
    edges.persist()
    edges.count()  # materialize once; reused every iteration

    hop = edges.select(
        F.col("child").alias("_hop_child"), F.col("parent").alias("_hop_parent")
    )
    closure = edges.select(
        F.col("child").alias("identifier"), F.col("parent").alias("ancestor")
    )
    frontier = closure
    for _ in range(max_iter):
        # extend the frontier one hop: (id → anc) ⋈ (anc=child → parent)
        nxt = (
            frontier.join(
                hop, on=frontier.ancestor == hop._hop_child, how="inner"
            )
            .select(
                F.col("identifier"), F.col("_hop_parent").alias("ancestor")
            )
            .distinct()
            # anti-join to keep only genuinely new pairs → convergence test
            .join(closure, on=["identifier", "ancestor"], how="left_anti")
        )
        nxt = nxt.localCheckpoint(eager=True)  # cut lineage per hop
        if nxt.isEmpty():
            break
        closure = closure.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    edges.unpersist()
    return closure


def descendants(edges: DataFrame, max_iter: int = 50) -> DataFrame:
    """Downward closure: (identifier, descendant). Same BFS with edge
    direction reversed (struct.py:1478-1481)."""
    rev = edges.select(
        F.col("parent").alias("child"), F.col("child").alias("parent")
    )
    out = ancestors(rev, max_iter=max_iter)
    return out.select(
        F.col("identifier"), F.col("ancestor").alias("descendant")
    )


def children(edges: DataFrame, node: str) -> DataFrame:
    """1-hop predecessors (get_children, api/hierarchy.py:140-149)."""
    return edges.where(F.col("parent") == node).select(
        F.col("child").alias("identifier")
    )


def has_ancestor(edges: DataFrame, nodes: DataFrame, ancestor: str) -> DataFrame:
    """Membership in the upward closure (struct.py:1483-1496): semi-join
    nodes against closure rows ending at `ancestor`."""
    clos = ancestors(edges).where(F.col("ancestor") == ancestor)
    return nodes.join(clos.select("identifier"), on="identifier", how="left_semi")


def subhierarchy(edges: DataFrame, root: str) -> DataFrame:
    """Induced subgraph of descendants(root) ∪ {root}
    (api/hierarchy.py:216-227): closure → semi-join both edge endpoints."""
    desc = descendants(edges).where(F.col("identifier") == root)
    members = desc.select(F.col("descendant").alias("node")).unionByName(
        desc.sparkSession.createDataFrame(
            [(root,)], T.StructType([T.StructField("node", T.StringType())])
        )
    ).distinct()
    e = edges.join(
        members.withColumnRenamed("node", "child"), on="child", how="left_semi"
    ).join(
        members.withColumnRenamed("node", "parent"), on="parent", how="left_semi"
    )
    return e.select("child", "parent")
