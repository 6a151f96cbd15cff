"""Shared (corpus-level) dictionary encoding for low-cardinality columns.

The chunk format's dictionary codec (:mod:`sparkcodec.kernels.dictionary`,
reference src/dictionary.js:72-166) stores each chunk's distinct values in
that chunk's own payload — the parquet dictionary-page model.  At 100 TB a
dataset has millions of chunks, so a column whose value set is shared
across the corpus (source labels, languages, crawl hosts) repeats its
dictionary millions of times.  A SHARED dictionary stores the value set
ONCE as a tiny sidecar table and rewrites the column to dense int32 codes
before encoding; the per-chunk payload is then just a bit-packed/RLE code
stream and the per-chunk dictionary disappears.

Scale shape: the dictionary build is one ``distinct`` aggregate (map-side
combined, |values| rows) plus a rank over the DISTINCT set only — the
corpus itself sees a single broadcast-joined projection, no extra
shuffle and no Python.  Decode is the same broadcast join in reverse.
Code assignment is deterministic (codes follow value sort order), so two
runs over the same data produce identical codes — the property that makes
encoded datasets comparable across runs and lets the DuckDB oracle
recompute the exact codes with ``dense_rank``.

This is a relational transform AROUND the chunk format, not a format
change: encoded tables stay readable by every existing decode path, and
the sidecar rides the same parquet/Iceberg storage as the chunks
(:func:`write_dictionary` / :func:`read_dictionary`).
"""

from __future__ import annotations

__all__ = [
    "build_dictionary",
    "dict_encode_columns",
    "dict_decode_columns",
    "write_dictionary",
    "read_dictionary",
    "dictionary_path",
]

# A shared dictionary earns its keep when |values| << rows.  The build
# ranks the DISTINCT set through one window; beyond this bound that sort
# no longer qualifies as "tiny metadata" and the caller should keep the
# per-chunk dictionary codec instead (it needs no global value set).
MAX_DICT_VALUES = 10_000_000


def build_dictionary(df, column: str):
    """Distinct non-null values of ``column`` -> (value, code int32).

    Codes are 0-based dense ranks in value sort order: deterministic
    across runs and partitionings.  The window runs over the DISTINCT
    set only (bounded by ``MAX_DICT_VALUES``), never the corpus.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    distinct = df.select(F.col(column).alias("value")).na.drop().distinct()
    n = distinct.count()
    if n > MAX_DICT_VALUES:
        raise ValueError(
            f"column {column!r} has {n} distinct values, over the shared-"
            f"dictionary bound {MAX_DICT_VALUES}; use the per-chunk "
            "dictionary codec for high-cardinality columns")
    w = Window.orderBy("value")
    return distinct.select(
        "value", (F.dense_rank().over(w) - 1).cast("int").alias("code"))


def dict_encode_columns(df, columns):
    """Rewrite each column to its int32 shared-dictionary code.

    Returns ``(encoded_df, dicts)`` where ``dicts`` maps column name ->
    its (value, code) DataFrame.  NULL values stay NULL (no code burned).
    Each rewrite is one broadcast hash join against the tiny dictionary —
    the corpus is never shuffled.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.functions import broadcast

    dicts = {}
    out = df
    for col in columns:
        d = build_dictionary(out, col)
        dicts[col] = d
        renamed = d.select(F.col("value").alias(f"_gd_{col}"),
                           F.col("code").alias(f"_gdc_{col}"))
        out = (out.join(broadcast(renamed),
                        out[col].eqNullSafe(F.col(f"_gd_{col}")), "left")
               .drop(col, f"_gd_{col}")
               .withColumnRenamed(f"_gdc_{col}", col))
    # joins may reorder column position; restore the caller's layout
    return out.select(*df.columns), dicts


def dict_decode_columns(df, dicts):
    """Inverse of :func:`dict_encode_columns`: codes -> original values
    via the same broadcast join shape.  Raises if a code has no
    dictionary entry (corrupt sidecar) rather than silently nulling."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import broadcast

    out = df
    for col, d in dicts.items():
        renamed = d.select(F.col("code").alias(f"_gdc_{col}"),
                           F.col("value").alias(f"_gd_{col}"))
        out = (out.join(broadcast(renamed),
                        out[col].eqNullSafe(F.col(f"_gdc_{col}")), "left")
               .withColumn(
                   f"_gd_{col}",
                   F.when(F.col(col).isNotNull()
                          & F.col(f"_gd_{col}").isNull(),
                          F.raise_error(F.concat(
                              F.lit(f"no dictionary entry for {col} code "),
                              F.col(col).cast("string"))))
                   .otherwise(F.col(f"_gd_{col}")))
               .drop(col, f"_gdc_{col}")
               .withColumnRenamed(f"_gd_{col}", col))
    return out.select(*df.columns)


def dictionary_path(enc_dir: str, column: str) -> str:
    return f"{enc_dir}/_shared_dict_{column}"


def write_dictionary(d, enc_dir: str, column: str) -> str:
    """Persist a (value, code) dictionary as the encoded dataset's
    sidecar (same storage the chunks live in; one tiny file)."""
    path = dictionary_path(enc_dir, column)
    d.coalesce(1).write.mode("overwrite").parquet(path)
    return path


def read_dictionary(spark, enc_dir: str, column: str):
    return spark.read.parquet(dictionary_path(enc_dir, column))
