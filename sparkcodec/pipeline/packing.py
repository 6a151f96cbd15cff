"""Training-sequence packing and benchmark decontamination.

Two operators every large-scale LLM data pipeline runs downstream of
curation:

* :func:`pack_sequences` -- assign documents to fixed-token-budget
  training sequences (greedy contiguous fill in a deterministic order).
  Spark-first: one window aggregation PARTITIONED BY source (each source
  packs independently, so no global ordering bottleneck at 100 TB) with
  the bin id a closed-form function of the running token count.
* :func:`decontaminate` -- drop corpus documents sharing any word n-gram
  with a held-out evaluation set (the GPT-3-style n-gram overlap rule).
  Spark-first: the eval side's gram set is tiny, so the contamination
  test is a broadcast-able left-semi join on the gram; the corpus is
  never self-joined.

Both are exactly mirrored in DuckDB SQL (window sums / gram joins are
ANSI), so the driver grades them hash-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def pack_sequences(toks: DataFrame, seq_budget: int = 2048,
                   source_col: str = "source", id_col: str = "doc_id",
                   weight_col: str = "n_tok",
                   shard_col: str | None = None) -> DataFrame:
    """(doc_id, source, n_tok, tok_start, seq_id): greedy contiguous fill
    of per-source token streams into ``seq_budget``-token sequences.

    ``tok_start`` is the document's offset in its source's concatenated
    token stream; ``seq_id`` = floor(tok_start / seq_budget) -- the
    training sequence the document STARTS in (documents may straddle a
    boundary; the split is a reader-side slice, as in standard packed
    pretraining).  Deterministic: the fill order is (source, doc_id).

    Scale note: the window sorts WITHIN each partition key.  With a few
    giant sources (3 sources x 33 TB), partitioning by source alone makes
    each window a single task -- pass ``shard_col`` (any deterministic
    column, e.g. a doc-id-derived bucket) to pack independent
    (source, shard) streams in parallel; each shard then has its own
    sequence numbering, which packed-pretraining readers are indifferent
    to."""
    keys = [source_col] + ([shard_col] if shard_col else [])
    # ROWS frame pinned explicitly: Spark's default for an ordered window
    # is RANGE, which makes tied order keys peers (both rows would get the
    # same cumulative sum); the oracle SQL pins ROWS too
    w = (Window.partitionBy(*keys).orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = F.sum(weight_col).over(w)
    return toks.select(
        id_col, source_col, weight_col,
        (cum - F.col(weight_col)).cast("long").alias("tok_start"),
        F.floor((cum - F.col(weight_col)) / seq_budget).cast("long").alias("seq_id"),
    )


def pack_sequences_oracle_sql(seq_budget: int = 2048, table: str = "t",
                              source_col: str = "source",
                              id_col: str = "doc_id",
                              weight_col: str = "n_tok") -> str:
    return f"""
        SELECT {id_col}, {source_col}, {weight_col},
               CAST(sum({weight_col}) OVER w - {weight_col} AS BIGINT) AS tok_start,
               CAST(floor((sum({weight_col}) OVER w - {weight_col})
                    / {seq_budget}) AS BIGINT) AS seq_id
        FROM {table}
        WINDOW w AS (PARTITION BY {source_col} ORDER BY {id_col}
                     ROWS UNBOUNDED PRECEDING)
    """


def _word_grams(df: DataFrame, n: int, text_col: str, id_col: str) -> DataFrame:
    # words projected once (a sub-select, as dedup.ngram_jaccard_pairs
    # does) so the split+filter runs once per row, not three times
    words = df.select(
        F.col(id_col).alias("id"),
        F.expr(f"filter(split({text_col}, ' '), w -> w <> '')").alias("w"),
    )
    return words.select(
        "id",
        F.explode(F.expr(
            f"CASE WHEN size(w) >= {n} THEN "
            f"transform(sequence(0, size(w) - {n}), "
            f"i -> concat_ws(' ', slice(w, i + 1, {n}))) "
            f"ELSE CAST(array() AS array<string>) END"
        )).alias("gram"),
    ).distinct()


def decontaminate(docs: DataFrame, eval_docs: DataFrame, n: int = 8,
                  text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Corpus documents that share NO word ``n``-gram with the eval set
    (GPT-3-style decontamination).  The eval gram set is small relative to
    the corpus, so Spark resolves the contamination probe as a broadcast
    left-semi join on the gram -- the corpus is scanned once, never
    self-joined."""
    corpus_grams = _word_grams(docs, n, text_col, id_col)
    eval_grams = _word_grams(eval_docs, n, text_col, id_col).select("gram").distinct()
    contaminated = (corpus_grams
                    .join(F.broadcast(eval_grams), "gram", "left_semi")
                    .select("id").distinct())
    return (docs.join(contaminated.withColumnRenamed("id", id_col),
                      id_col, "left_anti")
            .select(id_col))


def decontaminate_oracle_sql(n: int = 8, table: str = "documents",
                             eval_pred: str = "doc_id % 50 = 0") -> str:
    """Oracle with the eval set defined as a predicate over the same
    table (the graded query uses ``doc_id % 50 = 0``)."""
    grams = f"""
          SELECT DISTINCT doc_id AS id, gram FROM (
            SELECT doc_id, unnest(list_transform(
              generate_series(1, greatest(len(words) - {n - 1}, 0)),
              i -> array_to_string(list_slice(words, i, i + {n - 1}), ' '))) AS gram
            FROM (SELECT doc_id,
                         list_filter(string_split(text, ' '), x -> x <> '') AS words
                  FROM {table}))
    """
    return f"""
        WITH grams AS ({grams}),
        eval_grams AS (
          SELECT DISTINCT gram FROM grams WHERE id IN
            (SELECT doc_id FROM {table} WHERE {eval_pred})
        ),
        contaminated AS (
          SELECT DISTINCT id FROM grams JOIN eval_grams USING (gram)
        )
        SELECT doc_id FROM {table}
        WHERE doc_id NOT IN (SELECT id FROM contaminated)
    """



def _quota_case(quotas: dict[str, int], default_quota: int,
                source_col: str) -> str:
    """CASE expression mapping source -> quota.  Source labels are
    data-derived strings: single quotes are doubled (valid in both Spark
    SQL and DuckDB string literals), backslashes rejected (Spark treats
    them as escapes inside literals, DuckDB does not -- no portable form)."""
    for s in quotas:
        if "\\" in s:
            raise ValueError(f"source label {s!r} contains a backslash; "
                             "not portably expressible in a SQL literal")
    return "CASE " + " ".join(
        f"WHEN {source_col} = '{s.replace(chr(39), chr(39) * 2)}' THEN {int(k)}"
        for s, k in sorted(quotas.items())
    ) + f" ELSE {int(default_quota)} END"


def source_quota_sample(docs: DataFrame, quotas: dict[str, int],
                        default_quota: int = 0,
                        id_col: str = "doc_id",
                        source_col: str = "source") -> DataFrame:
    """Training-mixture curation: keep at most ``quotas[source]`` documents
    per source (unlisted sources get ``default_quota``), deterministically
    -- the first k by document id within each source, so reruns and both
    engines select the identical set (no RNG, no engine-specific hash).
    One window over the source partition; at corpus scale each source's
    rank is computed inside its own shuffle partition group."""
    quota_expr = _quota_case(quotas, default_quota, source_col)
    w = Window.partitionBy(source_col).orderBy(id_col)
    return (docs.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= F.expr(quota_expr))
            .drop("_rk"))


def source_quota_sample_oracle_sql(quotas: dict[str, int],
                                   default_quota: int = 0,
                                   table: str = "documents",
                                   id_col: str = "doc_id",
                                   source_col: str = "source") -> str:
    quota_expr = _quota_case(quotas, default_quota, source_col)
    return f"""
        SELECT * EXCLUDE (_rk) FROM (
          SELECT t.*, row_number() OVER (
            PARTITION BY {source_col} ORDER BY {id_col}) AS _rk
          FROM {table} t
        ) WHERE _rk <= {quota_expr}
    """
