"""Shared synthetic-corpus input for the spark-submit jobs.

Parses the ``synthetic:N`` / ``synthetic:N:START`` input spec and
synthesizes the interleaved-spans documents frame executor-side — one
implementation for extract_job and corpus_job instead of two hand-synced
copies.  START offsets the id range so successive smoke waves carry
disjoint doc_ids (the delta/dedup caller contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def synthetic_documents(spark: SparkSession, spec: str) -> DataFrame:
    from ..contract import DOCUMENTS_SPANS_SCHEMA

    parts = spec.split(":")
    n = int(parts[1])
    start = int(parts[2]) if len(parts) > 2 else 0

    def gen(batches):
        import pandas as pd

        from ..spans.synthetic import synth_document

        for batch in batches:
            docs = [synth_document(int(i)) for i in batch["id"]]
            yield pd.DataFrame(
                {
                    "doc_id": [d["doc_id"] for d in docs],
                    "spans": [d["spans"] for d in docs],
                }
            )

    return spark.range(start, start + n).mapInPandas(
        gen, schema=DOCUMENTS_SPANS_SCHEMA
    )
