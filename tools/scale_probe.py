"""Bigger-corpus scaling probe for the low-efficiency bench legs.

Round 3's query_scaling read 0.378 (ngram_jaccard) and 0.523
(dedup_clusters) at 1→4 cores on sf0.1 (5k docs) and diagnosed the gap as
FIXED overhead (DF-cap partial-agg setup, the CC driver convergence loop)
that does not grow with data volume.  This probe tests that claim: it
builds a 5× corpus (25k docs, every token SUFFIXED with a per-copy tag —
a bijection on the shingle space, so each copy's pair structure and
DF-cap blocking are exactly isomorphic to the original while copies
share no shingles) and re-measures the same 1→4-core legs.  If the diagnosis is right the
efficiency rises toward 1 as the per-round fixed cost amortizes; if it is
wrong the number stays put and names a real serialization.

Round 4 extends the probe to the two legs added to bench.py that read
BELOW the sf0.1 compute floor (lsh_candidate_doc_pairs, ann_ivf_topk —
both sub-4 s at 1 core, where session/scheduler constants dominate and a
4-core wall can even exceed the 1-core one).  ann_ivf needs a 5×
embeddings table: per-copy vec_id offsets plus a small deterministic
per-copy shift on one dimension, keeping the k-means geometry
representative while copies stay distinct points.

Usage::

    python tools/scale_probe.py            # prints one JSON line
    SPARK_GRAFT_SCALE_COPIES=10 python tools/scale_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
COPIES = int(os.environ.get("SPARK_GRAFT_SCALE_COPIES", "5"))
BENCH_TMP = os.environ.get("SPARK_GRAFT_BENCH_TMP", "/tmp/paperoni_bench")
QUERIES = tuple(
    q
    for q in (
        "ngram_jaccard",
        "dedup_clusters",
        "lsh_candidate_doc_pairs",
        "ann_ivf_topk",
        # round 5: the PQ family shares IVF's fixed driver-side
        # training-loop latency (2 Lloyd iterations of collects) — same
        # amortization claim, probed the same way
        "ann_pq_topk",
        "ann_ivfpq_topk",
    )
    # big-copy runs (e.g. 40× embeddings) target the ANN legs only —
    # a 40× DOCUMENTS corpus would turn the text legs into half-hour
    # runs for a claim the 5× probe already settles
    if not os.environ.get("SPARK_GRAFT_SCALE_QUERIES")
    or q in os.environ["SPARK_GRAFT_SCALE_QUERIES"].split(",")
)


def build(cores: int):
    from paperoni_spark.pipeline import build_spark

    return build_spark(
        master=f"local[{cores}]",
        app_name=f"paperoni-scale-probe-{cores}",
        shuffle_partitions=cores,
        extra_conf={
            # pin split sizing so both legs see identical partitioning
            "spark.sql.files.openCostInBytes": "0",
            "spark.sql.files.maxPartitionBytes": str(1 << 20),
        },
    )


def ensure_big_corpus(spark) -> str:
    """COPIES disjoint tagged copies of the sf documents table, written as
    <dir>/documents.parquet so contract.load() treats it as an sf dir."""
    sf_dir = os.path.join(BENCH_TMP, f"docs{COPIES}x_{os.path.basename(SF_DIR)}")
    out = os.path.join(sf_dir, "documents.parquet")
    if os.path.exists(os.path.join(out, "_SUCCESS")) and os.path.exists(
        os.path.join(sf_dir, "embeddings.parquet", "_SUCCESS")
    ):
        return sf_dir
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    copies = [
        docs.select(
            (F.col("doc_id") + 10_000_000 * c).alias("doc_id"),
            # suffix EVERY token with the copy tag: "w1 w2 w3" → "w1cN
            # w2cN w3cN" is a bijection on tokens and hence on 3-gram
            # shingles — per-copy shingle DF and pair structure are
            # exactly the original's, and copies share no shingles
            F.regexp_replace(F.trim("text"), r"(\S+)", f"$1c{c}").alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        for c in range(COPIES)
    ]
    big = copies[0]
    for c in copies[1:]:
        big = big.union(c)
    big.repartition(64).write.mode("overwrite").parquet(out)

    emb_out = os.path.join(sf_dir, "embeddings.parquet")
    embs = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    def shifted(c: int):
        # bind the copy index via closure: a default-arg lambda would give
        # the HOF lambda three parameters, which transform() rejects
        return F.transform(
            "embedding",
            lambda x, i: (
                x + F.when(i == c % 64, F.lit(0.01 * c)).otherwise(F.lit(0.0))
            ).cast("float"),
        )

    ecopies = [
        embs.select(
            (F.col("vec_id") + 10_000_000 * c).alias("vec_id"),
            shifted(c).alias("embedding"),
            "label",
        )
        for c in range(COPIES)
    ]
    ebig = ecopies[0]
    for c in ecopies[1:]:
        ebig = ebig.union(c)
    ebig.repartition(16).write.mode("overwrite").parquet(emb_out)
    return sf_dir


def main() -> None:
    from paperoni_spark.contract import build_queries

    qfns = build_queries()
    spark = build(8)
    big_dir = ensure_big_corpus(spark)
    n_docs = spark.read.parquet(os.path.join(big_dir, "documents.parquet")).count()
    spark.stop()

    legs: dict[str, dict[int, float]] = {q: {} for q in QUERIES}

    def run_leg(cores: int) -> None:
        spark = build(cores)
        for name in QUERIES:
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                qfns[name](spark, big_dir).count()
                best = min(best, time.time() - t0)
            legs[name][cores] = min(best, legs[name].get(cores, float("inf")))
        spark.stop()

    # alternate to dodge noisy-neighbor windows, SYMMETRICALLY (two
    # sessions per leg — a single noisy 1-core session would inflate t1
    # and bias the efficiency upward); best per leg
    for cores in (4, 1, 4, 1):
        run_leg(cores)

    result = {"n_docs": n_docs, "copies": COPIES, "sf_dir": SF_DIR, "queries": {}}
    for name in QUERIES:
        t1, t4 = legs[name][1], legs[name][4]
        result["queries"][name] = {
            "sec_1": round(t1, 3),
            "sec_4": round(t4, 3),
            "efficiency": round((t1 / t4) / 4, 3),
        }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
