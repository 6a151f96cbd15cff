"""Encoded-dataset compaction: the small-file problem at 100 TB.

Fine-grained encodes (small ``chunk_rows``, many input splits, streaming
micro-batches appending one file per batch) leave an encoded dataset as
thousands of kilobyte-scale parquet files; every later scan then pays
one object-store round trip and one footer parse per file.  Compaction
rewrites the container files into ``target_file_bytes``-sized files
WITHOUT touching the encoded payloads: chunk rows are self-describing
(schema_json + meta_json + payload cells), so this is a pure-JVM Spark
job -- read -> range-repartition on the chunk ordering -> builtin
parquet write.  No chunk is decoded, nothing crosses the Python bridge,
and every pruning structure (typed stat columns, ``bloom_<col>`` bytes,
meta_json) rides along unchanged, so stats-range scans and bloom point
lookups work identically on the compacted dataset.

Lineage: a ``_compaction_manifest.json`` (underscore prefix -- ignored
by parquet readers) lands in the output dir recording input files,
bytes, and row/chunk counts, continuing the per-partition lineage story
of :mod:`sparkcodec.manifest`.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, functions as F

DEFAULT_TARGET_FILE_BYTES = 128 * 1024 * 1024


def _parquet_files(path: str) -> list[str]:
    out = []
    for root, _, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet") and not f.startswith(("_", ".")):
                out.append(os.path.join(root, f))
    return sorted(out)


def compact_encoded(spark, in_dir: str, out_dir: str, *,
                    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
                    container_compression: str = "zstd") -> DataFrame:
    """Rewrite the encoded dataset at ``in_dir`` into
    ``ceil(total_bytes / target_file_bytes)`` files at ``out_dir``.

    Ordering: rows range-partition and sort on (part_id, chunk_id) --
    the original encode order -- so chunk locality survives and a
    min/max predicate on the typed stat columns still prunes parquet
    row groups after compaction.  Returns a one-row manifest DataFrame
    (n_files_in, n_files_out, n_chunks, n_rows, n_tokens, bytes_out).

    Safe by construction: the output is a NEW directory written through
    Spark's committed parquet writer (a failed job leaves no partial
    visible output), and the input is never modified -- the caller
    swaps directories (or table pointers) once the manifest row is
    back, the same publish-then-swap shape as the task-side sinks'
    tmp+rename."""
    if target_file_bytes <= 0:
        raise ValueError("target_file_bytes must be positive")
    files_in = _parquet_files(in_dir)
    if not files_in:
        raise FileNotFoundError(f"no parquet files under {in_dir!r}")
    total_bytes = sum(os.path.getsize(f) for f in files_in)
    n_out = max(1, -(-total_bytes // target_file_bytes))

    enc = spark.read.parquet(in_dir)
    order_cols = [c for c in ("part_id", "chunk_id") if c in enc.columns]
    if not order_cols:
        order_cols = [enc.columns[0]]
    (enc.repartitionByRange(int(n_out), *order_cols)
        .sortWithinPartitions(*order_cols)
        .write.mode("overwrite")
        .option("compression", container_compression)
        .parquet(out_dir))

    out = spark.read.parquet(out_dir)
    aggs = [F.count(F.lit(1)).alias("n_chunks")]
    for c in ("n_rows", "n_tokens", "bytes_out"):
        aggs.append((F.sum(c) if c in out.columns else F.lit(0))
                    .cast("long").alias(c))
    row = out.agg(*aggs).collect()[0]
    files_out = _parquet_files(out_dir)
    manifest = {
        "n_files_in": len(files_in),
        "n_files_out": len(files_out),
        "n_chunks": int(row["n_chunks"]),
        "n_rows": int(row["n_rows"]),
        "n_tokens": int(row["n_tokens"]),
        "bytes_out": int(row["bytes_out"]),
        "container_bytes_in": int(total_bytes),
        "container_bytes_out": sum(os.path.getsize(f) for f in files_out),
        "target_file_bytes": int(target_file_bytes),
        "inputs": [os.path.basename(f) for f in files_in],
    }
    with open(os.path.join(out_dir, "_compaction_manifest.json"), "w") as f:
        json.dump(manifest, f)
    return spark.createDataFrame(
        [(len(files_in), len(files_out), manifest["n_chunks"],
          manifest["n_rows"], manifest["n_tokens"], manifest["bytes_out"])],
        "n_files_in INT, n_files_out INT, n_chunks LONG, n_rows LONG, "
        "n_tokens LONG, bytes_out LONG")
