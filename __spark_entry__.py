"""Driver contract for the spark-graft builder (PySpark target).

The flagship path: derive the contract-shaped tokens table
(doc_id, tokens:array<int32>, n_tok, source) from `documents`, encode it
with the sparkcodec engine (codec auto-selection inside mapInArrow),
decode it back, and prove per-row token-array equality via DuckDB oracles
that recompute the same table in pure SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _roundtrip_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from sparkcodec.engine import decode_dataframe, encode_dataframe, range_repartition
    from sparkcodec.tokens import tokens_table

    toks = tokens_table(spark, sf_dir)
    enc = encode_dataframe(range_repartition(toks, 8))
    dec = decode_dataframe(enc)
    return dec.select(
        F.col("doc_id"),
        F.array_join(F.transform("tokens", lambda x: x.cast("string")), ",").alias("tokens_str"),
        F.col("n_tok"),
        F.col("source"),
    )


def _tokens_oracle() -> str:
    from sparkcodec.tokens import tokens_table_oracle_sql

    return f"""
        SELECT doc_id,
               array_to_string(tokens, ',') AS tokens_str,
               n_tok,
               source
        FROM ({tokens_table_oracle_sql()})
    """


def _roundtrip_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparkcodec.engine import decode_dataframe, encode_dataframe

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
        "l_returnflag", "l_linestatus",
    )
    return decode_dataframe(encode_dataframe(li))


def _roundtrip_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparkcodec.engine import decode_dataframe, encode_dataframe

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    return decode_dataframe(encode_dataframe(docs))


def _chunk_stats_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global min/max token id + token count recovered ONLY from the
    footer-style chunk metadata (no decode) -- proves stats correctness."""
    from pyspark.sql import functions as F

    from sparkcodec.engine import encode_dataframe, range_repartition
    from sparkcodec.tokens import tokens_table

    enc = encode_dataframe(range_repartition(tokens_table(spark, sf_dir), 8))
    meta = enc.select(
        F.get_json_object("meta_json", "$.tokens.values.min").cast("long").alias("mn"),
        F.get_json_object("meta_json", "$.tokens.values.max").cast("long").alias("mx"),
        F.get_json_object("meta_json", "$.tokens.values.n_values").cast("long").alias("cnt"),
    )
    return meta.agg(
        F.min("mn").alias("min_tok"),
        F.max("mx").alias("max_tok"),
        F.sum("cnt").alias("total_tok"),
    )


def _chunk_stats_oracle() -> str:
    from sparkcodec.tokens import tokens_table_oracle_sql

    return f"""
        SELECT min(t) AS min_tok, max(t) AS max_tok, count(*) AS total_tok
        FROM (SELECT unnest(tokens) AS t FROM ({tokens_table_oracle_sql()}))
    """


def _codec_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column codec choices across chunks (rows-only check; the codec
    tags are engine-internal and not SQL-expressible)."""
    from pyspark.sql import functions as F

    from sparkcodec.engine import encode_dataframe, range_repartition
    from sparkcodec.tokens import tokens_table

    enc = encode_dataframe(range_repartition(tokens_table(spark, sf_dir), 8))
    return (
        enc.select(
            F.get_json_object("meta_json", "$.tokens.codec").alias("tokens_codec"),
            F.get_json_object("meta_json", "$.source.codec").alias("source_codec"),
            F.get_json_object("meta_json", "$.doc_id.codec").alias("doc_id_codec"),
        )
        .groupBy("tokens_codec", "source_codec", "doc_id_codec")
        .agg(F.count(F.lit(1)).alias("n_chunks"))
    )


def _compression_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bytes in/out and token counts per source partition (rows-only)."""
    from pyspark.sql import functions as F

    from sparkcodec.engine import encode_dataframe, range_repartition
    from sparkcodec.tokens import tokens_table

    enc = encode_dataframe(range_repartition(tokens_table(spark, sf_dir), 8))
    return enc.agg(
        F.sum("bytes_in").alias("bytes_in"),
        F.sum("bytes_out").alias("bytes_out"),
        F.sum("n_tokens").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_chunks"),
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: encode+decode the sf0.001 tokens table; driver checks rows>0."""
    return _roundtrip_tokens(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "roundtrip_tokens": _roundtrip_tokens,
        "roundtrip_lineitem": _roundtrip_lineitem,
        "roundtrip_documents": _roundtrip_documents,
        "chunk_stats_tokens": _chunk_stats_tokens,
        "codec_histogram": _codec_histogram,
        "compression_summary": _compression_summary,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "roundtrip_tokens": _tokens_oracle(),
        "roundtrip_lineitem": (
            "SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, "
            "l_returnflag, l_linestatus FROM lineitem"
        ),
        "roundtrip_documents": (
            "SELECT doc_id, text, lang, source, n_chars FROM documents"
        ),
        "chunk_stats_tokens": _chunk_stats_oracle(),
        # codec_histogram / compression_summary: engine-internal, rows-only
    }
