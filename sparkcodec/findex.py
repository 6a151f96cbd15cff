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


def build_file_index(spark, enc_dir: str):
    """Build and persist the per-file zone map for the encoded dataset at
    ``enc_dir``; returns the index DataFrame.

    One pure-JVM aggregation: group the chunk rows by
    ``input_file_name()`` and fold each typed stat column's per-chunk
    bounds into per-file bounds -- min-of-mins / max-of-maxes, except
    that a file containing ANY chunk with a NULL bound (statistics
    unsound for that chunk) records NULL and therefore never prunes.
    The scan reads ONLY the scalar stat/metadata columns (payload bytes
    never leave storage), and the sidecar is one parquet file under
    ``_file_index/``.
    """
    from pyspark.sql import functions as F

    enc = spark.read.parquet(enc_dir)
    stat_cols = [c[len("min_"):] for c in enc.columns
                 if c.startswith("min_") and f"max_{c[len('min_'):]}" in enc.columns]
    if not stat_cols:
        raise ValueError(
            f"encoded dataset {enc_dir!r} has no typed min_/max_ columns; "
            "encode with stat_columns=(...) (or cluster_encode, which adds "
            "them for the cluster keys) before building a file index")
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
    idx = (enc
           .select("n_rows", *(f"{p}_{c}" for c in stat_cols
                               for p in ("min", "max")))
           .withColumn("file", F.element_at(
               F.split(F.input_file_name(), "/"), -1))
           .groupBy("file").agg(*aggs))
    # pad part files holding ZERO chunk rows (a committed writer may emit
    # empty parts): they get NULL bounds -- always survive pruning, which
    # is sound and harmless -- so the staleness check can tell "empty but
    # known at build time" from "appeared after the build"
    listing = {os.path.basename(p) for p in _data_files(enc_dir)}
    missing = sorted(listing - {r["file"] for r in
                                idx.select("file").collect()})
    if missing:
        pad = spark.createDataFrame([(m,) for m in missing], "file STRING")
        for f in idx.schema.fields:
            if f.name != "file":
                pad = pad.withColumn(f.name, F.lit(None).cast(f.dataType))
        idx = idx.unionByName(pad.select(*idx.columns))
    (idx.coalesce(1).write.mode("overwrite")
        .parquet(file_index_path(enc_dir)))
    return spark.read.parquet(file_index_path(enc_dir))


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
