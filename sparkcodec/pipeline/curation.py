"""Corpus curation: the end-to-end composition a training-data pipeline
runs before tokenization -- exact dedup (keep smallest id per text), char
n-gram near-duplicate removal (greedy keep-smallest), language gate, and
quality gates -- as ONE declarative DataFrame program with an exactly
mirrored DuckDB oracle.

Shape at scale: one hash group-by (exact dedup), one inverted-index
self-join bounded by the stop-shingle guard (near-dups), then per-row
expressions -- no crossJoin, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import SHINGLE_K, char_ngram_jaccard_pairs
from .textstats import lang_id, quality_score

# Stop-shingle guard for the near-dup self-join: char 5-grams appearing in
# more than this many documents are dropped from both the intersection and
# the set sizes (capped Jaccard semantics, mirrored in the oracle).  Bounds
# the inverted-index join's per-key fan-out to NEAR_DF_CAP**2 regardless of
# corpus size -- without it one ubiquitous gram (" the ") makes the join
# quadratic in the corpus.
NEAR_DF_CAP = 256


def curate_corpus(docs: DataFrame, *, lang: str = "en", min_words: int = 5,
                  max_stop_ratio: float = 0.9,
                  near_threshold: float = 0.8,
                  near_df_cap: int | None = NEAR_DF_CAP) -> DataFrame:
    """Surviving documents with their curation features
    (doc_id, pred_lang, n_words, stop_ratio)."""
    # exact-dedup stage keyed by sha2-256(text): the shuffle carries 32-byte
    # digests, never full documents (see dedup.exact_dedup)
    uniq = (docs.select(F.sha2("text", 256).alias("_h"), "doc_id")
            .groupBy("_h").agg(F.min("doc_id").alias("doc_id")))
    base = docs.join(uniq.select("doc_id"), "doc_id", "left_semi")
    pairs = char_ngram_jaccard_pairs(base, SHINGLE_K, near_threshold,
                                     df_cap=near_df_cap)
    drop = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    survivors = base.join(drop, "doc_id", "left_anti")
    scored = quality_score(survivors).join(lang_id(survivors), "doc_id")
    return (
        scored.filter((F.col("pred_lang") == lang)
                      & (F.col("n_words") >= min_words)
                      & (F.col("stop_ratio") <= max_stop_ratio))
        .select("doc_id", "pred_lang", "n_words", "stop_ratio")
    )


def curate_corpus_oracle_sql(*, lang: str = "en", min_words: int = 5,
                             max_stop_ratio: float = 0.9,
                             near_threshold: float = 0.8,
                             near_df_cap: int | None = NEAR_DF_CAP,
                             table: str = "documents") -> str:
    from .dedup import char_ngram_jaccard_oracle_sql
    from .textstats import lang_id_oracle_sql, quality_score_oracle_sql

    pairs_sql = char_ngram_jaccard_oracle_sql(SHINGLE_K, near_threshold, "base",
                                              df_cap=near_df_cap)
    quality_sql = quality_score_oracle_sql("surv")
    lang_sql = lang_id_oracle_sql("surv")
    return f"""
        WITH uniq AS (
          SELECT min(doc_id) AS doc_id FROM {table} GROUP BY text
        ), base AS (
          SELECT d.* FROM {table} d JOIN uniq USING (doc_id)
        ), pairs AS ({pairs_sql}),
        surv AS (
          SELECT * FROM base
          WHERE doc_id NOT IN (SELECT DISTINCT id_b FROM pairs)
        ), q AS ({quality_sql}), l AS ({lang_sql})
        SELECT q.doc_id, l.pred_lang, q.n_words, q.stop_ratio
        FROM q JOIN l USING (doc_id)
        WHERE l.pred_lang = '{lang}' AND q.n_words >= {min_words}
          AND q.stop_ratio <= {max_stop_ratio}
    """
