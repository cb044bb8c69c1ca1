from .job import (
    extract_pipeline,
    lineage_metrics,
    resume_against,
    tiered_repartition,
    write_output,
)
from .session import build_spark

__all__ = [
    "build_spark",
    "extract_pipeline",
    "lineage_metrics",
    "resume_against",
    "tiered_repartition",
    "write_output",
]
