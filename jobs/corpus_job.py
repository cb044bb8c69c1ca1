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

Local smoke (synthesizes the corpus when --input is 'synthetic:N')::

    spark-submit --master 'local[8]' --py-files engine.zip \
        jobs/corpus_job.py --input synthetic:500 --output /tmp/corpus
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
        n = int(args.input.split(":", 1)[1])

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

        documents = spark.range(n).mapInPandas(gen, schema=DOCUMENTS_SPANS_SCHEMA)
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
    corpus.write.mode("overwrite").parquet(args.output)
    if args.funnel is not None:
        funnel.write.mode("overwrite").parquet(args.funnel)
    # both sinks consumed — release the shared extraction cache.  The
    # persisted frame is internal to build_training_corpus, so drop it via
    # the catalog; this job owns the whole session, so the blanket clear is
    # exact (redundant before spark.stop() here, load-bearing if this main
    # is ever embedded in a longer-lived session)
    spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
