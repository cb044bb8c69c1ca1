"""Tiny Hadoop-FS helpers shared by the persisted-index writers.

Every persisted index in this repo (MinHash band, SimHash fingerprint,
embedding sign-LSH, IVF, the LSH bucket index, and the streamed wave
loops) follows ONE durability rule: a writer owns exactly one
``wave=<id>`` (or ``batch=<id>``) segment and replays it with
delete-before-overwrite, so an at-least-once retry is idempotent and
committed segments are never touched.  These helpers are the shared
mechanics; they go through the Hadoop FileSystem API so any scheme the
cluster mounts (file://, hdfs://, s3a://) behaves identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def hadoop_path(spark: SparkSession, path: str):
    return spark._jvm.org.apache.hadoop.fs.Path(path)


def path_exists(spark: SparkSession, path: str) -> bool:
    p = hadoop_path(spark, path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(p))


def delete_path(spark: SparkSession, path: str) -> None:
    """Recursively delete ``path`` if it exists (no-op otherwise)."""
    p = hadoop_path(spark, path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(p):
        fs.delete(p, True)


def refuse_foreign_layout(spark: SparkSession, path: str) -> None:
    """Raise if ``path`` exists and carries entries that are neither
    ``wave=<id>`` segments nor underscore/dot side files: writing a wave
    segment next to bare part files (a legacy flat index, an arbitrary
    data directory) creates the mixed layout Spark's partition discovery
    rejects at the NEXT probe — fail at the write, not after the index
    is polluted."""
    root = hadoop_path(spark, path)
    fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(root):
        foreign = [
            st.getPath().getName()
            for st in fs.listStatus(root)
            if not st.getPath().getName().startswith(("wave=", "_", "."))
        ]
        if foreign:
            raise ValueError(
                f"{path} is not a wave-segmented index (found {foreign[:3]}): "
                "writing wave=<id> next to flat files would break partition "
                "discovery at the next read.  Rebuild the index with its "
                "write_* function, or point at a fresh path."
            )


def assert_index_kind(spark: SparkSession, path: str, kind: str) -> None:
    """Refuse to touch an index root claimed by a DIFFERENT index kind.

    All round-5+ indexes share the ``wave=<id>`` layout, so the layout
    guard alone cannot stop e.g. ``write_pq_index`` pointed at a simhash
    index: the wave=0 delete-before-overwrite would silently destroy the
    other family's committed build segment and the damage only surfaces
    as missing columns at the next probe.  Each index root therefore
    carries an empty ``_index_kind_<kind>`` marker file (underscore
    prefix, NO "=": Spark's file index keeps underscore names containing
    "=" as partition-style paths and would read the marker as data);
    writers verify it BEFORE
    deleting anything.  A root without a marker (pre-round-6 index, or a
    fresh path) is adopted: the marker is created here."""
    root = hadoop_path(spark, path)
    fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
    marker = hadoop_path(spark, f"{path}/_index_kind_{kind}")
    if fs.exists(root):
        found = [
            name[len("_index_kind_"):]
            for st in fs.listStatus(root)
            if (name := st.getPath().getName()).startswith("_index_kind_")
        ]
        if found and kind not in found:
            raise ValueError(
                f"{path} is a {found[0]!r} index — refusing to write "
                f"{kind!r} segments into it (the wave=0 overwrite would "
                "destroy the other index's committed build).  Point at a "
                "fresh path or the matching index root."
            )
        if found:
            return
    fs.create(marker, True).close()


def assert_index_param(
    spark: SparkSession, path: str, name: str, value, create: bool = True
) -> None:
    """Pin an index GEOMETRY parameter to its root via an empty
    ``_param_<name>_<value>`` marker (same convention as the kind
    marker): an index probed or appended with a different value would
    silently desynchronize — e.g. a substring histogram built with
    8-token shingles probed at n=50 matches nothing and every
    cross-wave duplicate survives.  Writers adopt a marker-less root
    (``create=True``); read-only probes pass ``create=False`` and only
    refuse a mismatch."""
    prefix = f"_param_{name}_"
    root = hadoop_path(spark, path)
    fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(root):
        found = [
            nm[len(prefix):]
            for st in fs.listStatus(root)
            if (nm := st.getPath().getName()).startswith(prefix)
        ]
        if found and str(value) not in found:
            raise ValueError(
                f"{path} was built with {name}={found[0]} — refusing to "
                f"use it with {name}={value} (digests/geometry would "
                "silently mismatch).  Rebuild the index or pass the "
                "matching value."
            )
        if found:
            return
    elif not create:
        return
    if create:
        marker = hadoop_path(spark, f"{path}/{prefix}{value}")
        fs.create(marker, True).close()


def refuse_stale_appends(spark: SparkSession, path: str) -> None:
    """Refuse to REBUILD a quantizer-bearing index (IVF / PQ / IVFADC)
    over existing append segments: a rebuild retrains the quantizers and
    replaces wave=0 + the side tables, but wave≥1 code rows were encoded
    against the OLD quantizers — probes would decode them with the new
    ADC tables and return wrong rankings with no error.  A rebuild must
    start from a clean path (or the caller deletes the appends first)."""
    root = hadoop_path(spark, path)
    fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(root):
        stale = [
            nm
            for st in fs.listStatus(root)
            if (nm := st.getPath().getName()).startswith("wave=")
            and nm != "wave=0"
        ]
        if stale:
            raise ValueError(
                f"{path} carries appended segments ({stale[:3]}) encoded "
                "against the CURRENT quantizers — rebuilding would retrain "
                "them and silently mis-score every appended vector.  Delete "
                "the index to rebuild from scratch."
            )


def write_wave_segment(
    df: DataFrame,
    path: str,
    wave: int,
    partition_by: tuple[str, ...] = (),
    kind: str | None = None,
) -> None:
    """Write ``df`` as ``path/wave=<wave>`` with delete-before-overwrite:
    a crashed attempt's leftovers are removed first, so retrying the same
    wave id replays the segment instead of double-appending (the repo's
    index-append idempotency rule).  Caller contract: ``wave`` is stable
    across retries of the same wave and unique across waves.

    Refuses a target whose root carries non-wave entries (e.g. a legacy
    flat pre-round-5 index, or an arbitrary data directory): writing a
    wave segment next to bare part files creates the mixed layout
    Spark's partition discovery rejects at the NEXT probe — fail at the
    write, not after the index is polluted (the operator-side twin of
    corpus_job's foreign-layout refusal).  ``kind`` additionally pins the
    index FAMILY via :func:`assert_index_kind` — two different index
    kinds share this layout, so the layout check alone would let one
    family's build destroy another's."""
    spark = df.sparkSession
    refuse_foreign_layout(spark, path)
    if kind is not None:
        assert_index_kind(spark, path, kind)
    seg = f"{path}/wave={wave}"
    delete_path(spark, seg)
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(seg)
