"""Training-sequence packing: the export step between a cleaned corpus
and an LLM training run.

``sequence_pack`` implements concat-then-chunk packing (the GPT lineage:
lay the documents out in a deterministic order, terminate each with one
EOD token, and cut the concatenated token stream into fixed ``seq_len``
windows).  The operator emits, per document, its global token offset and
the [start_seq, end_seq] range of training sequences it occupies — the
manifest a sharded tokenizer/writer consumes to materialize sequences
without ever holding the concatenated stream anywhere.

Scale shape: the global prefix sum is the whole problem.  A single
``Window.orderBy(doc_id)`` puts 10^12 rows through ONE task; instead the
sum is two-phase, the same trick as sampling.token_budget_sample's
budget cut but keyed on order-aligned doc_id blocks:

1. bucket = doc_id div ``bucket_size`` (monotone in doc_id, so bucket
   order + in-bucket order == global order);
2. per-bucket token totals -> running offsets with a window over the
   BUCKET SUMMARY only (corpus/bucket_size rows; at 10^12 docs pick
   bucket_size ~10^6 so the summary is ~10^6 rows — and if even that is
   too wide, the same reduction applies recursively to the summary);
3. in-bucket cumulative window partitioned by bucket — each task sees
   ``bucket_size`` compact (id, count) rows, never text.

The DuckDB oracle is the naive single-window plan; the two-phase cut is
row-identical to it by the order-alignment argument above.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..materialize import materialize
from .textstats import tokens_col

SEQ_LEN = 2048
PACK_BUCKET = 1024  # docs per offset bucket; ~10^6 at 10^12-doc scale
N_SHARDS = 16
SHARD_BUCKET_TOKENS = 1024  # n_tokens per rank bucket (two-phase rank)


def sequence_pack(
    documents: DataFrame,
    seq_len: int = SEQ_LEN,
    bucket_size: int = PACK_BUCKET,
) -> DataFrame:
    """Per-document packing manifest: ``(doc_id, n_tokens, start_token,
    start_seq, end_seq)`` where ``n_tokens`` INCLUDES the document's EOD
    terminator, ``start_token`` is the document's offset in the
    concatenated corpus stream (doc_id order), and the sequence ids are
    ``start_token div seq_len`` .. ``(start_token + n_tokens - 1) div
    seq_len`` — a document spanning a chunk boundary appears in every
    sequence it crosses, exactly like the streamed tokenizer would cut
    it."""
    base = materialize(
        documents.select(
            "doc_id",
            (F.size(tokens_col(F.col("text"))) + 1).cast("long").alias("n_tokens"),
            F.expr(f"doc_id div {bucket_size}").alias("bkt"),
        )
    )
    # phase 1: running offsets over the bucket summary (tiny table; the
    # single-partition window is over corpus/bucket_size rows by design)
    w_b = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        base.groupBy("bkt")
        .agg(F.sum("n_tokens").alias("bkt_tokens"))
        .select(
            "bkt", F.coalesce(F.sum("bkt_tokens").over(w_b), F.lit(0)).alias("offset")
        )
    )
    # phase 2: in-bucket prefix sum; bucket order + doc_id order == the
    # global doc_id order, so offset + in-bucket cum is the global cum
    w_in = (
        Window.partitionBy("bkt")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        base.join(offsets, "bkt")
        .withColumn(
            "start_token",
            F.col("offset") + F.coalesce(F.sum("n_tokens").over(w_in), F.lit(0)),
        )
        .select(
            "doc_id",
            "n_tokens",
            "start_token",
            F.expr(f"start_token div {seq_len}").alias("start_seq"),
            F.expr(f"(start_token + n_tokens - 1) div {seq_len}").alias("end_seq"),
        )
    )


def shard_assignments(
    documents: DataFrame,
    n_shards: int = N_SHARDS,
    bucket_tokens: int = SHARD_BUCKET_TOKENS,
) -> DataFrame:
    """Deterministic size-balanced shard assignment for corpus export:
    rank documents by (n_tokens DESC, doc_id ASC) and deal them
    round-robin — ``shard = (rank − 1) % n_shards`` — so every shard
    receives an interleaved sample of large and small documents (the
    classic longest-first dealing; per-shard token totals land within
    one max-document of each other, without any driver-side bin-packing
    state).

    The global rank is the same scale problem as sequence_pack's prefix
    sum with a DIFFERENT sort key, solved the same two-phase way but
    bucketed on the key itself: bucket = n_tokens div ``bucket_tokens``
    is MONOTONE in n_tokens, so bucket-DESC order + in-bucket
    (n_tokens DESC, doc_id ASC) order == the global order; per-bucket
    counts make the offsets (a tiny summary window), and each in-bucket
    window task sees one token-range slice.  The DuckDB oracle is the
    naive single-window plan, row-identical by the alignment argument."""
    from .textstats import tokens_col

    base = materialize(
        documents.select(
            "doc_id",
            F.size(tokens_col(F.col("text"))).cast("long").alias("n_tokens"),
        ).withColumn("bkt", F.expr(f"n_tokens div {bucket_tokens}"))
    )
    w_b = Window.orderBy(F.col("bkt").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = (
        base.groupBy("bkt")
        .agg(F.count("*").alias("bkt_docs"))
        .select(
            "bkt",
            F.coalesce(F.sum("bkt_docs").over(w_b), F.lit(0)).alias("offset"),
        )
    )
    w_in = Window.partitionBy("bkt").orderBy(
        F.col("n_tokens").desc(), F.col("doc_id").asc()
    )
    return (
        base.join(offsets, "bkt")
        .withColumn("rank", F.col("offset") + F.row_number().over(w_in))
        .select(
            "doc_id",
            "n_tokens",
            "rank",
            ((F.col("rank") - 1) % n_shards).cast("int").alias("shard"),
        )
    )
