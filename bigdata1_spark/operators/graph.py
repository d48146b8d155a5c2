"""Graph analytics over the order network — the missing family between
relational analytics and the dedup clustering that already exists
(``dedup.dedup_clusters`` is connected components; this module adds
degree stats, triangle counting, and PageRank).

The graph is DERIVED from the star schema, the way production graph
pipelines derive edges from fact tables:

* co-supplier graph (unipartite, undirected): suppliers are adjacent
  when they ship lines of the same order. TPC-H orders carry at most 7
  lines, so per-order pair generation is bounded by C(7,2) — generated
  array-locally from ``collect_set`` (the ``basket.join_self_pairs``
  idiom), never via a self-join shuffle.
* customer–supplier graph (bipartite) for PageRank: edge when a
  customer's order contains a supplier's line.

Scale notes: every step is a keyed shuffle on node/edge ids; triangle
counting uses degree-ordered edge orientation (each triangle counted
from its lowest-degree vertex — the standard arboricity bound that
keeps wedge generation sub-quadratic on skewed degree distributions);
PageRank truncates lineage per iteration with ``localCheckpoint`` and
sums contributions through decimal so partial-agg order cannot drift
ranks between runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata1_spark.sources.tables import load_table


def _co_supplier_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct undirected co-supplier edges (a < b), one row each.

    Pairs are emitted array-locally per order (bounded by the 7-line
    order cap), then deduplicated with one shuffle on the pair key.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    per_order = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_suppkey")).alias("ss")
    )
    pairs = per_order.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("ss"),
                    lambda x, i: F.transform(
                        F.slice(
                            F.col("ss"), i + 2, F.size(F.col("ss"))
                        ),
                        lambda y: F.struct(
                            x.alias("a"), y.alias("b")
                        ),
                    ),
                )
            )
        ).alias("e")
    )
    return pairs.select("e.a", "e.b").distinct()


def graph_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-supplier degree in the co-supplier graph.

    One bounded array-local pair generation, one distinct, one count —
    two keyed shuffles total. Exact integers end-to-end.
    Columns: node, degree.
    """
    e = _co_supplier_edges(spark, sf_dir)
    return (
        e.select(F.col("a").alias("node"))
        .union(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )


def triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle participation counts in the co-supplier graph.

    Degree-ordered orientation: each undirected edge points from its
    lower-(degree, id) endpoint, so every triangle is enumerated exactly
    once — from its lowest-degree vertex. Wedge generation (the e1⋈e2
    join) is then bounded by sum(min-degree per edge) — the arboricity
    bound — instead of sum(degree²): this is what keeps the join alive
    on power-law graphs at 100 TB. The closing-edge check is one more
    equi-join on the (u, w) pair key. The triangle count itself is
    orientation-invariant, so the oracle can use plain id-ordering.
    Columns: node, n_triangles (nodes in ≥1 triangle).
    """
    e = _co_supplier_edges(spark, sf_dir)
    deg = graph_degree(spark, sf_dir)
    # orient: keep (src, dst) with (deg, id) strictly increasing
    da = deg.select(
        F.col("node").alias("a"), F.col("degree").alias("deg_a")
    )
    db = deg.select(
        F.col("node").alias("b"), F.col("degree").alias("deg_b")
    )
    withdeg = e.join(da, "a").join(db, "b")
    lt = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    oriented = withdeg.select(
        F.when(lt, F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(lt, F.col("b")).otherwise(F.col("a")).alias("dst"),
    ).cache()
    wedges = (
        oriented.alias("e1")
        .join(
            oriented.alias("e2"),
            F.col("e1.dst") == F.col("e2.src"),
        )
        .select(
            F.col("e1.src").alias("u"),
            F.col("e1.dst").alias("v"),
            F.col("e2.dst").alias("w"),
        )
    )
    closing = oriented.select(
        F.col("src").alias("u"), F.col("dst").alias("w")
    )
    tris = wedges.join(closing, ["u", "w"])
    out = (
        tris.select(
            F.explode(F.array("u", "v", "w")).alias("node")
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return out


def pagerank(
    spark: SparkSession, sf_dir: str, iters: int = 3, damping: float = 0.85
) -> DataFrame:
    """Fixed-iteration PageRank on the customer–supplier bipartite
    graph (edges both directions, so no dangling nodes).

    Rows-only by design: ranks are genuinely iterative floating-point —
    not SQL-expressible without unrolling — so correctness is pinned by
    invariant tests instead (rank mass conservation ≈ N, determinism
    across runs, monotone damping bounds). Each iteration is ONE join +
    ONE aggregate keyed on node id; ``localCheckpoint`` truncates
    lineage so the plan stays O(1) per iteration instead of growing
    (same discipline as ``dedup.dedup_clusters``). Contributions are
    summed through decimal(27,15): decimal addition is associative, so
    ranks are bit-stable across shuffle orderings — required for any
    resumable 100 TB run. Columns: node_type, node_id, rank (1e-6
    floor-rounded).
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    # customer node = custkey, supplier node = -suppkey (disjoint ids)
    cs = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.col("o_custkey").alias("c"),
            (-F.col("l_suppkey")).alias("s"),
        )
        .distinct()
    )
    edges = (
        cs.select(F.col("c").alias("src"), F.col("s").alias("dst"))
        .union(cs.select(F.col("s").alias("src"), F.col("c").alias("dst")))
        .cache()
    )
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    nodes = outdeg.select(F.col("src").alias("node"), "outdeg")
    ranks = nodes.select(
        "node", "outdeg", F.lit(1.0).alias("rank")
    ).localCheckpoint()
    base = 1.0 - damping
    for _ in range(iters):
        contribs = (
            ranks.join(edges, F.col("node") == F.col("src"))
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("outdeg"))
                .cast("decimal(27,15)")
                .alias("contrib"),
            )
            .groupBy("node")
            .agg(F.sum("contrib").cast("double").alias("in_sum"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                "outdeg",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce("in_sum", F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    edges.unpersist(blocking=False)
    return ranks.select(
        F.when(F.col("node") > 0, F.lit("customer"))
        .otherwise(F.lit("supplier"))
        .alias("node_type"),
        F.abs("node").alias("node_id"),
        (F.floor(F.col("rank") * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).alias(
            "rank"
        ),
    )
