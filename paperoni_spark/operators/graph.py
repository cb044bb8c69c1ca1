"""Graph analytics over the near-duplicate candidate graph.

PageRank centrality on the MinHash-LSH candidate-pair graph: hubs are
template/boilerplate families (many near-dup neighbors reinforce each
other), so the score is a corpus-curation signal — downweight or cap
high-centrality docs the way connected components collapses exact
families.  Companion to dedup.connected_components (same edge set, a
different fixed point).

Portability contract: ALL iteration arithmetic is exact long integers —
mass lives in units of 1/PAGERANK_SCALE, per-edge contributions and the
teleport/dangling terms use integer floor division (Spark ``div`` ==
DuckDB ``//`` on non-negative longs), so five iterations stay
bit-identical across engines no matter the aggregation order.  Floor
losses leak a deterministic few units of mass per iteration; that is
part of the pinned semantics (total <= SCALE, test-bounded), the price
of an FP-free fixed point.  The DuckDB oracle replays the iterations as
chained CTEs in lockstep — change PAGERANK_* here and the oracle
follows (contract.oracle_doc_pagerank generates from these constants).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PAGERANK_SCALE = 10**12  # total mass, integer units
PAGERANK_DAMP_NUM = 85  # damping d = 85/100
PAGERANK_DAMP_DEN = 100
PAGERANK_ITERS = 5


def doc_pagerank(documents: DataFrame, n_iters: int = PAGERANK_ITERS) -> DataFrame:
    """Integer PageRank over the symmetric LSH candidate graph.

    Plan shape (the part that must survive 10^12 docs):

    * the edge list is derived ONCE (the full minhash/banding pipeline)
      and materialized — iterations never re-shingle the corpus;
    * each iteration is one edge-keyed join + one dst-keyed partial
      aggregation (the classic distributed PageRank step — contribution
      traffic is O(|E|), partial-agg combines map-side);
    * the dangling term is a one-row aggregate broadcast back into the
      iteration's plan (a cross join with a single-row frame — the same
      arithmetic the former per-iteration driver collect produced, but
      computed inside the iteration's one job instead of paying a
      separate collect round-trip per iteration);
    * each iteration's rank frame is materialized to truncate lineage
      (5 chained joins would otherwise re-derive the whole prefix per
      action — the CC loop precedent, materialize.py tradeoff notes).

    Returns (doc_id, pr_scaled): pr_scaled in units of 1/PAGERANK_SCALE.
    """
    from ..materialize import materialize
    from .dedup import lsh_candidate_doc_pairs

    pairs = lsh_candidate_doc_pairs(documents).select("doc_a", "doc_b")
    # pairs are unique with doc_a < doc_b, so the symmetric union is
    # duplicate-free and deg == neighbor count
    edges = materialize(
        pairs.select(
            F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
        ).unionByName(
            pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
        )
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    nodes = documents.select("doc_id")
    nd = materialize(
        nodes.join(deg, nodes.doc_id == deg.src, "left").select(
            "doc_id", F.coalesce("deg", F.lit(0)).alias("deg")
        )
    )
    n_docs = nd.count()
    teleport = (PAGERANK_SCALE * (PAGERANK_DAMP_DEN - PAGERANK_DAMP_NUM)) // (
        PAGERANK_DAMP_DEN * n_docs
    )

    # explicit long casts: a Python int literal small enough for 32 bits
    # becomes an IntegerType lit and `pr * 85` then overflows under ANSI
    pr = nd.select(
        "doc_id", "deg", F.lit(PAGERANK_SCALE // n_docs).cast("long").alias("pr")
    )
    damp = f"pr * {PAGERANK_DAMP_NUM}"
    for _ in range(n_iters):
        # one-row dangling aggregate, broadcast-cross-joined into the
        # iteration instead of collected: share = (dangling or 0) // n_docs
        # in the SAME exact long arithmetic (div == // on non-negative
        # longs), so every pr value is bit-identical to the collect form —
        # but each iteration is ONE job, not a collect job + a build job
        dang = pr.where(F.col("deg") == 0).agg(
            F.coalesce(
                F.sum(F.expr(f"({damp}) div {PAGERANK_DAMP_DEN}")), F.lit(0)
            )
            .cast("long")
            .alias("dangling")
        )
        share = F.expr(f"dangling div {n_docs}")
        contribs = (
            pr.where(F.col("deg") > 0)
            .join(edges, pr.doc_id == edges.src)
            .select(
                F.col("dst").alias("doc_id"),
                F.expr(f"({damp}) div ({PAGERANK_DAMP_DEN} * deg)").alias("c"),
            )
            .groupBy("doc_id")
            .agg(F.sum("c").alias("c"))
        )
        pr = materialize(
            nd.join(contribs, "doc_id", "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "doc_id",
                "deg",
                (
                    F.lit(teleport).cast("long")
                    + share.cast("long")
                    + F.coalesce(F.col("c"), F.lit(0)).cast("long")
                )
                .cast("long")
                .alias("pr"),
            ),
            eager=True,
        )
    return pr.select("doc_id", F.col("pr").alias("pr_scaled"))
