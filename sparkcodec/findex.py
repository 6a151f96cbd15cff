"""Dataset-level file index: file-granular zone maps above chunk stats.

An encoded dataset on disk prunes at three levels already -- partition
directories, parquet row groups (typed ``min_/max_<col>`` predicates push
into the scan), and per-chunk stats/blooms.  All three still require the
query to LIST and OPEN every file.  At 100 TB an encoded table is
~10^5-10^6 container files; a needle or narrow-range query should not pay
one footer read per file.  This module adds the level Iceberg/Delta keep
in their manifests: one tiny sidecar row per FILE with aggregated
[min, max] bounds per stat column, so planning reads the sidecar (a few
MB) and hands Spark only the files whose bounds intersect the predicate.

Soundness mirrors :func:`sparkcodec.engine.filter_chunks_by_range`: a
NULL chunk bound means "no sound bound published", so any file holding
such a chunk records a NULL file bound and always survives pruning.

The reference keeps per-chunk statistics in the parquet footer
(src/metadata.js:72-117) but has no dataset level above one file; this is
the scale-side extension of the same idea.
"""

from __future__ import annotations

import os

__all__ = [
    "file_index_path",
    "build_file_index",
    "update_file_index",
    "read_file_index",
    "prune_files_by_ranges",
    "indexed_range_scan",
]


def file_index_path(enc_dir: str) -> str:
    # '_'-prefixed: invisible to spark.read.parquet(enc_dir), same
    # sidecar convention as gdict's _shared_dict_<col>
    return os.path.join(enc_dir, "_file_index")


def _data_files(enc_dir: str) -> list[str]:
    return sorted(
        os.path.join(enc_dir, f) for f in os.listdir(enc_dir)
        if f.endswith(".parquet") and not f.startswith(("_", ".")))


def _grouped_index(spark, paths: list[str]):
    """Per-file zone-map rows for the given container files: group the
    chunk rows by ``input_file_name()`` and fold each typed stat column's
    per-chunk bounds into per-file bounds -- min-of-mins / max-of-maxes,
    except that a file containing ANY chunk with a NULL bound (statistics
    unsound for that chunk) records NULL and therefore never prunes.  The
    scan reads ONLY the scalar stat/metadata columns (payload bytes never
    leave storage)."""
    from pyspark.sql import functions as F

    enc = spark.read.parquet(*paths)
    stat_cols = [c[len("min_"):] for c in enc.columns
                 if c.startswith("min_") and f"max_{c[len('min_'):]}" in enc.columns]
    if not stat_cols:
        raise ValueError(
            "encoded dataset has no typed min_/max_ columns; encode with "
            "stat_columns=(...) (or cluster_encode, which adds them for "
            "the cluster keys) before building a file index")
    aggs = [
        F.count(F.lit(1)).alias("n_chunks"),
        (F.sum("n_rows") if "n_rows" in enc.columns else F.lit(0))
        .cast("long").alias("n_rows"),
    ]
    for c in stat_cols:
        mn, mx = F.col(f"min_{c}"), F.col(f"max_{c}")
        has_null_mn = F.max(mn.isNull().cast("int")) == 1
        has_null_mx = F.max(mx.isNull().cast("int")) == 1
        aggs.append(F.when(has_null_mn, F.lit(None))
                    .otherwise(F.min(mn)).alias(f"min_{c}"))
        aggs.append(F.when(has_null_mx, F.lit(None))
                    .otherwise(F.max(mx)).alias(f"max_{c}"))
    return (enc
            .select(*(["n_rows"] if "n_rows" in enc.columns else []),
                    *(f"{p}_{c}" for c in stat_cols
                      for p in ("min", "max")))
            .withColumn("file", F.element_at(
                F.split(F.input_file_name(), "/"), -1))
            .groupBy("file").agg(*aggs))


def _pad_missing(spark, idx, expected_names: set[str]):
    """Union NULL-bound rows for expected files the aggregation never saw
    (part files holding ZERO chunk rows -- a committed writer may emit
    empty parts).  NULL bounds always survive pruning, which is sound and
    harmless, and the staleness check can then tell "empty but known at
    index time" from "appeared after the build"."""
    from pyspark.sql import functions as F

    missing = sorted(expected_names
                     - {r["file"] for r in idx.select("file").collect()})
    if not missing:
        return idx
    pad = spark.createDataFrame([(m,) for m in missing], "file STRING")
    for f in idx.schema.fields:
        if f.name != "file":
            pad = pad.withColumn(f.name, F.lit(None).cast(f.dataType))
    return idx.unionByName(pad.select(*idx.columns))


def _write_index(idx, enc_dir: str):
    """Publish the sidecar atomically-ish: write to ``_file_index.new``
    then swap directories, so a reader never sees a half-written index
    (a crash between remove and rename just forces a rebuild -- the
    index is always derivable from the data)."""
    import shutil

    final = file_index_path(enc_dir)
    tmp = final + ".new"
    idx.coalesce(1).write.mode("overwrite").parquet(tmp)
    if os.path.isdir(final):
        shutil.rmtree(final)
    os.rename(tmp, final)


def build_file_index(spark, enc_dir: str):
    """Build and persist the per-file zone map for the encoded dataset at
    ``enc_dir``; returns the index DataFrame.  One pure-JVM aggregation
    over the scalar stat columns; the sidecar is one parquet file under
    ``_file_index/``."""
    files = _data_files(enc_dir)
    if not files:
        raise FileNotFoundError(f"no parquet files under {enc_dir!r}")
    idx = _pad_missing(spark, _grouped_index(spark, files),
                       {os.path.basename(p) for p in files})
    _write_index(idx, enc_dir)
    return spark.read.parquet(file_index_path(enc_dir))


def update_file_index(spark, enc_dir: str):
    """Incremental sidecar maintenance for the append-mostly ingest
    shape: scan ONLY the container files that appeared since the last
    build/update, carry existing rows over unchanged, and drop rows for
    files that disappeared (compaction, retention deletes).  At 100 TB a
    daily append touches thousands of new files, not the million already
    indexed -- re-aggregating those would re-read every footer for
    nothing.  Falls back to :func:`build_file_index` when no sidecar
    exists; returns the refreshed index DataFrame."""
    from pyspark.sql import functions as F

    final = file_index_path(enc_dir)
    if not os.path.isdir(final):
        return build_file_index(spark, enc_dir)
    idx = spark.read.parquet(final)
    listing = {os.path.basename(p): p for p in _data_files(enc_dir)}
    indexed = {r["file"] for r in idx.select("file").collect()}
    new = sorted(set(listing) - indexed)
    removed = sorted(indexed - set(listing))
    if not new and not removed:
        return idx
    if removed:
        idx = idx.filter(~F.col("file").isin(removed))
    if new:
        fresh = _pad_missing(spark, _grouped_index(
            spark, [listing[n] for n in new]), set(new))
        if set(fresh.columns) != set(idx.columns):
            raise ValueError(
                f"new files carry stat columns {sorted(fresh.columns)} but "
                f"the index has {sorted(idx.columns)}; encode appends with "
                "the same stat_columns or rebuild with build_file_index")
        idx = idx.unionByName(fresh.select(*idx.columns))
    _write_index(idx, enc_dir)
    return spark.read.parquet(final)


def read_file_index(spark, enc_dir: str):
    path = file_index_path(enc_dir)
    if not os.path.isdir(path):
        raise FileNotFoundError(
            f"no file index at {path!r}; run build_file_index first")
    return spark.read.parquet(path)


def prune_files_by_ranges(spark, enc_dir: str, ranges: dict) -> list[str]:
    """File paths whose zone-map bounds intersect EVERY (lo, hi) in
    ``ranges`` (column -> (lo, hi), either bound may be None).

    The index is validated against the CURRENT directory listing first: a
    file set that drifted since ``build_file_index`` (new encode output,
    compaction, manual deletes) raises instead of silently planning over
    stale bounds.  Only the SURVIVING paths are collected driver-side --
    bounded by the query's selectivity, not the dataset size (and the
    sidecar itself is ~one row per file, a few MB at 10^6 files)."""
    from pyspark.sql import functions as F

    from .engine import _eq_literal

    idx = read_file_index(spark, enc_dir)
    listing = {os.path.basename(p): p for p in _data_files(enc_dir)}
    indexed = {r["file"] for r in idx.select("file").collect()}
    if indexed != set(listing):
        raise ValueError(
            f"file index at {file_index_path(enc_dir)!r} is stale: index "
            f"covers {len(indexed)} files, directory has {len(listing)} "
            f"(e.g. {sorted(indexed ^ set(listing))[:3]}); rebuild with "
            "build_file_index")
    keep = F.lit(True)
    for c, (lo, hi) in ranges.items():
        if f"min_{c}" not in idx.columns:
            raise ValueError(
                f"file index has no bounds for column {c!r}; it was built "
                f"from stat columns {sorted(n[4:] for n in idx.columns if n.startswith('min_'))}")
        mn, mx = F.col(f"min_{c}"), F.col(f"max_{c}")
        # NULL bound -> unsound -> file may match and must survive
        if lo is not None:
            keep = keep & (mx.isNull() | (mx >= F.lit(_eq_literal(lo))))
        if hi is not None:
            keep = keep & (mn.isNull() | (mn <= F.lit(_eq_literal(hi))))
    names = [r["file"] for r in idx.filter(keep).select("file").collect()]
    return [listing[n] for n in sorted(names)]


def indexed_range_scan(spark, enc_dir: str, column: str, lo=None, hi=None,
                       dtype: str = "double", schema=None):
    """Range scan with FILE-level pruning first: plan only the files whose
    zone-map bounds intersect [lo, hi], then run the usual chunk-level
    stats pruning + decode + exact filter over that subset
    (:func:`sparkcodec.engine.range_scan_rows`).  On a clustered layout a
    narrow range opens a handful of files out of the whole dataset --
    parquet footers of pruned files are never even read."""
    from .engine import infer_decoded_schema, range_scan_rows

    if schema is None:
        schema = infer_decoded_schema(spark.read.parquet(enc_dir))
    paths = prune_files_by_ranges(spark, enc_dir, {column: (lo, hi)})
    if not paths:
        return range_scan_rows(
            spark.read.parquet(enc_dir).limit(0), column, lo, hi, dtype,
            schema=schema)
    return range_scan_rows(
        spark.read.parquet(*paths), column, lo, hi, dtype, schema=schema)
