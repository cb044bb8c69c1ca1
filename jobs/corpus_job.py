"""Production entry point: spark-submit training-corpus build job.

The full funnel over an interleaved-spans documents table: extraction →
plain-text flattening → language guess → quality filter → exact-dedup
survivor selection, writing the surviving corpus plus a per-stage funnel
accounting.  Cluster usage::

    zip -r engine.zip paperoni_spark
    spark-submit --py-files engine.zip jobs/corpus_job.py \
        --input  <iceberg-table-or-parquet-path> \
        --output <corpus parquet/iceberg out> \
        --funnel <per-stage accounting table path>

Local smoke (synthesizes the corpus when --input is 'synthetic:N', or
'synthetic:N:START' for a disjoint-id wave)::

    spark-submit --master 'local[8]' --py-files engine.zip \
        jobs/corpus_job.py --input synthetic:500 --output /tmp/corpus

Recurring-crawl incremental build (each wave dedups against the persisted
SimHash index, appends survivors to corpus AND index; retried waves are
accounted no-ops)::

    ... corpus_job.py --input synthetic:300       --output /tmp/c --dedup-index /tmp/ix
    ... corpus_job.py --input synthetic:200:300   --output /tmp/c --dedup-index /tmp/ix --append
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--funnel", default=None)
    parser.add_argument("--base-url", default="http://example.com/")
    parser.add_argument(
        "--near-dup",
        action="store_true",
        help="insert the SimHash near-dup cluster stage after exact dedup",
    )
    parser.add_argument(
        "--max-hamming",
        type=int,
        default=None,
        help="near-dup Hamming threshold; implies --near-dup",
    )
    parser.add_argument(
        "--dedup-index",
        default=None,
        help="persisted SimHash fingerprint index: the wave is deduped "
        "against it (vs-corpus near-dups rejected) and its survivors' "
        "fingerprints are appended after the sink write — the recurring-"
        "crawl incremental corpus build.  First run bootstraps the index.",
    )
    parser.add_argument(
        "--append",
        action="store_true",
        help="append to an existing corpus output instead of overwriting "
        "(the wave shape; combine with --dedup-index)",
    )
    args = parser.parse_args(argv)
    if args.max_hamming is not None:
        args.near_dup = True  # a threshold without the stage is a silent no-op

    from pyspark.sql import SparkSession

    from paperoni_spark.contract import DOCUMENTS_SPANS_SCHEMA
    from paperoni_spark.pipeline.compose import build_training_corpus
    from paperoni_spark.pipeline.session import apply_engine_confs

    spark = apply_engine_confs(
        SparkSession.builder.appName("paperoni-corpus-build").getOrCreate()
    )

    if args.input.startswith("synthetic:"):
        # synthetic:N or synthetic:N:START — START offsets the id range
        # so successive waves carry disjoint doc_ids (the delta/dedup
        # caller contract)
        parts = args.input.split(":")
        n = int(parts[1])
        start = int(parts[2]) if len(parts) > 2 else 0

        def gen(batches):
            import pandas as pd

            from paperoni_spark.spans.synthetic import synth_document

            for batch in batches:
                docs = [synth_document(int(i)) for i in batch["id"]]
                yield pd.DataFrame(
                    {
                        "doc_id": [d["doc_id"] for d in docs],
                        "spans": [d["spans"] for d in docs],
                    }
                )

        documents = spark.range(start, start + n).mapInPandas(
            gen, schema=DOCUMENTS_SPANS_SCHEMA
        )
    else:
        documents = spark.read.parquet(args.input)

    # persist=True: both sinks share one extraction pass
    corpus, funnel = build_training_corpus(
        documents,
        base_url=args.base_url,
        persist=True,
        near_dup=args.near_dup,
        max_hamming=args.max_hamming,
    )
    if args.dedup_index is not None:
        from paperoni_spark.pipeline.compose import dedup_wave_against_index

        # existence probe through the Hadoop FS (any mounted scheme),
        # same rationale as extract_job's resume probe
        jvm = spark._jvm
        ix_path = jvm.org.apache.hadoop.fs.Path(args.dedup_index)
        fs = ix_path.getFileSystem(spark._jsc.hadoopConfiguration())
        if fs.exists(ix_path):
            corpus, rejected, resubmitted = dedup_wave_against_index(
                spark, corpus, args.dedup_index, max_hamming=args.max_hamming
            )
            # persist the (tiny) reject-id set: the funnel count, the
            # corpus anti-join, and the index append all consume it —
            # without the cache each one re-runs the index probe
            rejected = rejected.persist()
            funnel = funnel.unionByName(
                spark.createDataFrame(
                    [
                        ("rejected:near_duplicate_vs_corpus", rejected.count()),
                        ("rejected:already_ingested", resubmitted.count()),
                    ],
                    "stage: string, n_docs: long",
                )
            )

    mode = "append" if args.append else "overwrite"
    corpus.write.mode(mode).parquet(args.output)
    if args.funnel is not None:
        funnel.write.mode(mode).parquet(args.funnel)
    if args.dedup_index is not None:
        # AFTER the sink write: a failed wave never poisons the index.
        # corpus descends from the persisted judged frame, so this does
        # not re-run the extraction kernel.  mode=append bootstraps a
        # missing index on the first run.
        from paperoni_spark.operators.dedup import append_to_simhash_index

        append_to_simhash_index(
            corpus.select("doc_id", "text"), args.dedup_index
        )
    # both sinks consumed — release the shared extraction cache.  The
    # persisted frame is internal to build_training_corpus, so drop it via
    # the catalog; this job owns the whole session, so the blanket clear is
    # exact (redundant before spark.stop() here, load-bearing if this main
    # is ever embedded in a longer-lived session)
    spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
