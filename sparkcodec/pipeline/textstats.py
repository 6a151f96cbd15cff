"""Text-analysis operators: language id, quality scoring, token counting,
document fingerprinting.

Every operator exists in two forms: the Spark DataFrame expression and an
equivalent DuckDB SQL string, so the driver's oracle can verify values
exactly.  All heuristics are deliberately pure integer/string arithmetic
(no library calls, no floats until the final rounded division) so both
engines agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword marker sets (heuristic n-gram language id)
LANG_MARKERS = {
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein"],
    "en": ["the", "and", "is", "of", "to", "a", "in"],
    "es": ["el", "la", "los", "es", "y", "un", "de"],
    "fr": ["le", "la", "les", "est", "et", "un", "dans"],
    "zh": ["de", "shi", "bu", "le", "zai", "you", "wo"],
}

STOPWORDS = sorted({w for ws in LANG_MARKERS.values() for w in ws})

_WORDS = "filter(split(text, ' '), w -> w <> '')"


def _marker_array_sql(words: list[str], dialect: str) -> str:
    items = ", ".join(f"'{w}'" for w in words)
    return f"array({items})" if dialect == "spark" else f"[{items}]"


_LANGS = sorted(LANG_MARKERS)  # rank by name; ties resolve to the smallest


def lang_id(docs: DataFrame) -> DataFrame:
    """Heuristic language id: count distinct marker-word hits per language,
    argmax with deterministic (count desc, lang asc) tie-break.  The argmax
    is an integer-key greatest() -- key = score*8 + inverted_rank -- so the
    Spark and DuckDB forms compute the identical winner."""
    keys = [
        f"size(array_intersect({_WORDS}, {_marker_array_sql(LANG_MARKERS[lang], 'spark')}))"
        f" * 8 + {len(_LANGS) - 1 - i}"
        for i, lang in enumerate(_LANGS)
    ]
    langs_arr = ", ".join(f"'{x}'" for x in _LANGS)
    expr = (
        f"element_at(array({langs_arr}), "
        f"{len(_LANGS)} - greatest({', '.join(keys)}) % 8)"
    )
    return docs.select(F.col("doc_id"), F.expr(expr).alias("pred_lang"))


def lang_id_oracle_sql(table: str = "documents") -> str:
    words = "list_filter(string_split(text, ' '), w -> w <> '')"
    keys = [
        f"length(list_intersect({words}, {_marker_array_sql(LANG_MARKERS[lang], 'duckdb')}))"
        f" * 8 + {len(_LANGS) - 1 - i}"
        for i, lang in enumerate(_LANGS)
    ]
    langs_arr = ", ".join(f"'{x}'" for x in _LANGS)
    return f"""
        SELECT doc_id,
               ([{langs_arr}])[{len(_LANGS)} - greatest({', '.join(keys)}) % 8] AS pred_lang
        FROM {table}
    """


def quality_score(docs: DataFrame) -> DataFrame:
    """Quality heuristics: char length, word count, mean word length,
    stopword ratio, non-alnum ratio -- integer counts, one rounded score."""
    sw = _marker_array_sql(STOPWORDS, "spark")
    return docs.select(
        "doc_id",
        F.expr("length(text)").cast("long").alias("n_chars2"),
        F.expr(f"size({_WORDS})").cast("long").alias("n_words"),
        F.expr(f"size(filter({_WORDS}, w -> array_contains({sw}, w)))")
        .cast("long").alias("n_stop"),
        F.expr("length(regexp_replace(text, '[a-zA-Z0-9 ]', ''))")
        .cast("long").alias("n_punct"),
        F.expr(
            f"round(CAST(size(filter({_WORDS}, w -> array_contains({sw}, w))) AS DOUBLE)"
            f" / greatest(size({_WORDS}), 1), 6)"
        ).alias("stop_ratio"),
        F.expr(
            f"round(CAST(length(replace(text, ' ', '')) AS DOUBLE)"
            f" / greatest(size({_WORDS}), 1), 6)"
        ).alias("mean_word_len"),
    )


def quality_score_oracle_sql(table: str = "documents") -> str:
    sw = _marker_array_sql(STOPWORDS, "duckdb")
    words = "list_filter(string_split(text, ' '), w -> w <> '')"
    return f"""
        SELECT doc_id,
               CAST(length(text) AS BIGINT) AS n_chars2,
               CAST(length({words}) AS BIGINT) AS n_words,
               CAST(length(list_filter({words}, w -> list_contains({sw}, w))) AS BIGINT) AS n_stop,
               CAST(length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS BIGINT) AS n_punct,
               round(CAST(length(list_filter({words}, w -> list_contains({sw}, w))) AS DOUBLE)
                     / greatest(length({words}), 1), 6) AS stop_ratio,
               round(CAST(length(replace(text, ' ', '')) AS DOUBLE)
                     / greatest(length({words}), 1), 6) AS mean_word_len
        FROM {table}
    """


def token_count(docs: DataFrame) -> DataFrame:
    """Whitespace tokens + BPE-ish regex token count (letters runs, digit
    runs, single punctuation)."""
    pat = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\\\s]"
    return docs.select(
        "doc_id",
        F.expr(f"size({_WORDS})").cast("long").alias("ws_tokens"),
        F.expr(f"size(regexp_extract_all(text, '{pat}', 0))").cast("long")
        .alias("bpe_tokens"),
    )


def token_count_oracle_sql(table: str = "documents") -> str:
    return f"""
        SELECT doc_id,
               CAST(length(list_filter(string_split(text, ' '), w -> w <> '')) AS BIGINT) AS ws_tokens,
               CAST(length(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS BIGINT) AS bpe_tokens
        FROM {table}
    """


def fingerprint(docs: DataFrame) -> DataFrame:
    """Position-weighted rolling-hash document fingerprint (pure integer
    arithmetic, collision-resistant enough for dedup prefilters)."""
    expr = (
        "aggregate(transform(sequence(1, length(text)), "
        "i -> CAST(i AS BIGINT) * ascii(substr(text, i, 1))), "
        "CAST(0 AS BIGINT), (acc, x) -> (acc * 31 + x) % 1000000007)"
    )
    return docs.select(
        "doc_id",
        F.when(F.expr("length(text)") > 0, F.expr(expr)).otherwise(F.lit(0))
        .cast("long").alias("fp"),
    )


def fingerprint_oracle_sql(table: str = "documents") -> str:
    return f"""
        SELECT doc_id,
               CASE WHEN length(text) > 0 THEN
                 CAST(list_reduce(
                   list_transform(generate_series(1, length(text)),
                                  i -> CAST(i AS BIGINT) * ord(substr(text, i, 1))),
                   (acc, x) -> (acc * 31 + x) % 1000000007) AS BIGINT)
               ELSE 0 END AS fp
        FROM {table}
    """


# PII masks shared by the Spark and DuckDB implementations: the patterns
# are valid (and behave identically) in BOTH Java regex and RE2, so the
# two engines produce byte-identical scrubbed text.
PII_PATTERNS = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)


def scrub_pii(docs: DataFrame) -> DataFrame:
    """(doc_id, clean_text, len_delta): emails, phone numbers, and IPv4
    addresses replaced by typed mask tokens -- the redaction pass a
    training pipeline runs before tokenization; ``len_delta`` is the
    character-count change from masking (negative when PII was longer
    than its mask).  Pure codegen (regexp_replace chain); no Python in
    the hot path."""
    c = F.col("text")
    for pat, repl in PII_PATTERNS:
        # functional form: the pattern is passed as a literal, bypassing
        # SQL string parsing (which would eat the backslashes)
        c = F.regexp_replace(c, pat, repl)
    return docs.select(
        "doc_id",
        c.alias("clean_text"),
        (F.length(c) - F.length("text")).cast("long").alias("len_delta"),
    )


def scrub_pii_oracle_sql(table: str = "documents") -> str:
    expr = "text"
    for pat, repl in PII_PATTERNS:
        expr = f"regexp_replace({expr}, '{pat}', '{repl}', 'g')"
    return f"""
        SELECT doc_id,
               {expr} AS clean_text,
               CAST(length({expr}) - length(text) AS BIGINT) AS len_delta
        FROM {table}
    """


def gopher_repetition(docs: DataFrame) -> DataFrame:
    """Gopher-rule repetition signals (Rae et al. 2021, table A1):
    duplicate-line ratio, top word-2-gram mass, and the fraction of words
    with no alphabetic character.  One explode + per-doc aggregation for
    the 2-gram mass (shuffle keyed by doc -- no cross-document join);
    line stats are pure array expressions in codegen."""
    words = F.expr("filter(split(text, ' '), w -> w <> '')")
    lines = F.expr("filter(split(text, '\n'), l -> l <> '')")
    base = docs.select(
        "doc_id",
        words.alias("w"),
        F.when(F.size(lines) > 0,
               F.round(1 - F.size(F.array_distinct(lines)) / F.size(lines), 6))
        .otherwise(F.lit(0.0)).alias("dup_line_ratio"),
        F.when(F.size(words) > 0,
               F.round(F.size(F.expr(
                   "filter(filter(split(text, ' '), w -> w <> ''), "
                   "w -> w NOT RLIKE '[A-Za-z]')")) / F.size(words), 6))
        .otherwise(F.lit(0.0)).alias("frac_words_no_alpha"),
    )
    grams = base.select(
        "doc_id",
        F.explode(F.expr(
            "CASE WHEN size(w) >= 2 THEN transform(sequence(0, size(w) - 2), "
            "i -> concat_ws(' ', slice(w, i + 1, 2))) "
            "ELSE CAST(array() AS array<string>) END")).alias("gram"),
    )
    top = (grams.groupBy("doc_id", "gram").agg(F.count(F.lit(1)).alias("c"))
           .groupBy("doc_id")
           .agg(F.round(F.max("c") / F.sum("c"), 6).alias("top_2gram_ratio")))
    return (base.select("doc_id", "dup_line_ratio", "frac_words_no_alpha")
            .join(top, "doc_id", "left")
            .fillna({"top_2gram_ratio": 0.0})
            .select("doc_id", "dup_line_ratio", "top_2gram_ratio",
                    "frac_words_no_alpha"))


def gopher_repetition_oracle_sql(table: str = "documents") -> str:
    return f"""
        WITH base AS (
          SELECT doc_id,
                 list_filter(string_split(text, ' '), w -> w <> '') AS w,
                 list_filter(string_split(text, chr(10)), l -> l <> '') AS lines
          FROM {table}
        ), lstats AS (
          SELECT doc_id,
                 CASE WHEN len(lines) > 0 THEN
                   round(1 - CAST(len(list_distinct(lines)) AS DOUBLE) / len(lines), 6)
                 ELSE 0.0 END AS dup_line_ratio,
                 CASE WHEN len(w) > 0 THEN
                   round(CAST(len(list_filter(w, x -> NOT regexp_matches(x, '[A-Za-z]')))
                         AS DOUBLE) / len(w), 6)
                 ELSE 0.0 END AS frac_words_no_alpha
          FROM base
        ), grams AS (
          SELECT doc_id, unnest(list_transform(
            generate_series(1, greatest(len(w) - 1, 0)),
            i -> concat(w[i], ' ', w[i + 1]))) AS gram
          FROM base
        ), counts AS (
          SELECT doc_id, gram, count(*) AS c FROM grams GROUP BY 1, 2
        ), top AS (
          SELECT doc_id, round(CAST(max(c) AS DOUBLE) / sum(c), 6) AS top_2gram_ratio
          FROM counts GROUP BY doc_id
        )
        SELECT l.doc_id, l.dup_line_ratio,
               coalesce(t.top_2gram_ratio, 0.0) AS top_2gram_ratio,
               l.frac_words_no_alpha
        FROM lstats l LEFT JOIN top t ON l.doc_id = t.doc_id
    """


# ---------- corpus vocabulary statistics (tokens table) ----------

def vocab_topk(toks: DataFrame, k: int = 100) -> DataFrame:
    """Top-k most frequent token ids across the corpus (vocabulary
    histogram head -- the unigram stats a tokenizer-training or
    subword-coverage audit starts from).  One explode + one shuffle on the
    8-byte token id; ties broken by token id so the result set is
    deterministic."""
    return (toks.select(F.explode("tokens").alias("token"))
            .groupBy("token").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("token")).limit(k))


def vocab_topk_oracle_sql(k: int = 100, tokens_sql: str | None = None) -> str:
    from ..tokens import tokens_table_oracle_sql

    src = tokens_sql or tokens_table_oracle_sql()
    return f"""
        SELECT token, CAST(count(*) AS BIGINT) AS cnt
        FROM (SELECT unnest(tokens) AS token FROM ({src}))
        GROUP BY token
        ORDER BY cnt DESC, token
        LIMIT {k}
    """


def token_bigram_topk(toks: DataFrame, k: int = 100) -> DataFrame:
    """Top-k adjacent token-id pairs (bigram LM counts).  The sliding
    window is an index transform inside codegen -- no self-join, no UDF;
    the only shuffle keys are the two int32 ids."""
    # CASE guard, not greatest(): Spark's sequence(1, 0) yields the
    # DESCENDING [1, 0], which would fabricate a wrapped pair per 1-token
    # document
    pairs = toks.select(F.explode(F.expr(
        "CASE WHEN size(tokens) >= 2 THEN "
        "transform(sequence(1, size(tokens) - 1), "
        "i -> struct(tokens[i - 1] AS a, tokens[i] AS b)) "
        "ELSE array() END")).alias("p"))
    return (pairs.select("p.a", "p.b")
            .groupBy("a", "b").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b")).limit(k))


def token_bigram_topk_oracle_sql(k: int = 100,
                                 tokens_sql: str | None = None) -> str:
    from ..tokens import tokens_table_oracle_sql

    src = tokens_sql or tokens_table_oracle_sql()
    return f"""
        WITH __bigram_src AS ({src}), pairs AS (
          SELECT unnest(list_transform(
            generate_series(1, greatest(len(tokens) - 1, 0)),
            i -> struct_pack(a := tokens[i], b := tokens[i + 1]))) AS p
          FROM __bigram_src
        )
        SELECT p.a AS a, p.b AS b, CAST(count(*) AS BIGINT) AS cnt
        FROM pairs
        GROUP BY 1, 2
        ORDER BY cnt DESC, a, b
        LIMIT {k}
    """


def normalize_text(docs: DataFrame, form: str = "NFC",
                   text_col: str = "text") -> DataFrame:
    """Unicode canonical normalization of a text column -- the curation
    step that runs BEFORE dedup so composed ("é") and decomposed
    ("é") spellings of the same text hash identically.

    Spark has no built-in normalizer, so this is an Arrow-batched pandas
    UDF over ``Series.str.normalize`` (CPython's unicodedata, one C call
    per string -- the sanctioned Python fallback, never per-row SQL UDF).
    ``form``: NFC/NFD/NFKC/NFKD.  Output replaces ``text_col`` and adds
    ``was_normalized`` (value changed), useful as a curation audit column.
    """
    import unicodedata

    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"unknown normalization form {form!r}")

    @pandas_udf("string")
    def _norm(s):
        return s.map(lambda t: unicodedata.normalize(form, t)
                     if t is not None else None)

    out = docs.withColumn("__norm", _norm(F.col(text_col)))
    return (out
            .withColumn("was_normalized",
                        ~F.col("__norm").eqNullSafe(F.col(text_col)))
            .withColumn(text_col, F.col("__norm"))
            .drop("__norm"))


def normalize_text_oracle_sql(table: str = "documents") -> str:
    """DuckDB replay: nfc_normalize implements the same Unicode NFC
    tables (exactness cross-checked in tests on planted composed/
    decomposed/compatibility fixtures)."""
    return f"""
        SELECT doc_id,
               nfc_normalize(text) AS text,
               (nfc_normalize(text) IS DISTINCT FROM text) AS was_normalized
        FROM {table}
    """
