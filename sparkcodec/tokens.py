"""Deterministic tokenized-sequence table builder.

The engine's contract input (BASELINE.json input_hint) is a table
``(doc_id:string, tokens:array<int32>, n_tok:int32, source:string)``.
The sandbox testdata has no such table, so we derive one deterministically
from the ``documents`` table with a tokenizer that is expressible both in
Spark SQL and DuckDB SQL (so the driver's oracle can reproduce it exactly):

    token(w) = (length(w)*961 + cp(w[0])*31 + cp(w[1])) % 50257

where cp is the codepoint of a character and cp of a missing character
is 0.  Purely arithmetic, no hashing builtin, so both engines agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TOKENIZE_SPARK = (
    "transform(filter(split(text, ' '), w -> w <> ''), "
    "w -> CAST((length(w)*961 + ascii(w)*31 + ascii(substr(w, 2, 1))) % 50257 AS INT))"
)

TOKENIZE_DUCKDB = (
    "list_transform(list_filter(string_split(text, ' '), w -> w <> ''), "
    "w -> CAST((length(w)*961 + ord(substr(w, 1, 1))*31 "
    "+ coalesce(ord(nullif(substr(w, 2, 1), '')), 0)) % 50257 AS INTEGER))"
)

DOC_ID_SPARK = "format_string('%s-%012d', source, doc_id)"
# printf mirrors Spark's format_string exactly: no truncation past 12
# digits and correct sign placement (lpad would first-digit-truncate ids
# >= 10^12 and render -1 as '0000000000-1')
DOC_ID_DUCKDB = "source || '-' || printf('%012d', doc_id)"


def tokens_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, tokens, n_tok, source) derived from documents.parquet.

    ``n_tok`` references the ``tokens`` alias through a subquery so the
    tokenizer expression is evaluated ONCE per row: inlining
    ``size(<tokenize>)`` directly made the physical plan carry two copies
    of the transform/filter/split chain (CollapseProject refuses to merge
    them back, correctly -- the expression is non-cheap), doubling the
    tokenize cost of every consumer.  Same rows, same schema."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.createOrReplaceTempView("sc_documents")
    return spark.sql(f"""
        SELECT doc_id, tokens, CAST(size(tokens) AS INT) AS n_tok, source
        FROM (SELECT {DOC_ID_SPARK}   AS doc_id,
                     {TOKENIZE_SPARK} AS tokens,
                     source
              FROM sc_documents)
    """)


def tokens_table_oracle_sql(table: str = "documents") -> str:
    """DuckDB SQL producing the identical table (tokens as a list column)."""
    return f"""
        SELECT {DOC_ID_DUCKDB}           AS doc_id,
               {TOKENIZE_DUCKDB}         AS tokens,
               CAST(length({TOKENIZE_DUCKDB}) AS INTEGER) AS n_tok,
               source
        FROM {table}
    """
