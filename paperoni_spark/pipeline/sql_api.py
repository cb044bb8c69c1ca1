"""SQL surface for the extraction engine.

Registers a Python UDTF so SQL users can call the extractor directly::

    SELECT * FROM extract_articles(TABLE(SELECT doc_id, spans FROM documents))

Note: Python UDTFs are row-at-a-time — fine for ad-hoc SQL exploration, but
batch jobs should use :func:`paperoni_spark.operators.extract.run_extract`
(Arrow-vectorized ``mapInPandas``), which is the engine's production path.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf

_RETURN_TYPE = (
    "doc_id string, status string, title string, byline string, "
    "spans_emitted bigint, img_urls array<string>, "
    "extracted array<struct<kind:string,text:string,media_ref:string,order:int>>"
)


@udtf(returnType=_RETURN_TYPE)
class ExtractArticles:
    def eval(self, row):
        from paperoni_spark.spans.codec import extract_document

        spans = [s.asDict() for s in (row["spans"] or [])]
        result = extract_document(str(row["doc_id"]), spans)
        yield (
            result["doc_id"],
            result["status"],
            result["metadata"]["title"],
            result["metadata"]["byline"],
            result["spans_emitted"],
            result["img_urls"],
            [
                (s["kind"], s["text"], s["media_ref"], s["order"])
                for s in result["extracted"]
            ],
        )


def register_sql_api(spark: SparkSession) -> None:
    spark.udtf.register("extract_articles", ExtractArticles)
