"""From-scratch BPE tokenizer: distributed training + distributed encode.

The scalable shape (how production tokenizer training actually runs):

1. **Word counting is the only distributed pass over the corpus** -- one
   hash group-by on whitespace words with map-side combine.  At 100 TB
   the corpus is petabyte-scale but the distinct-word table is millions
   of rows; it is capped at ``max_words`` (by count, deterministic
   tie-break) and collected.
2. **Merge learning runs driver-side** over the word-frequency table
   (Sennrich et al. 2016): repeatedly merge the most frequent adjacent
   symbol pair.  Cost is O(distinct words), independent of corpus size.
3. **Encoding is distributed**: the learned merge ranks broadcast to the
   executors and a batched pandas kernel applies them per word with the
   classic lowest-rank-first loop.

Not SQL-expressible (iterative), so the graded query is rows-only; the
pytest oracle checks learned merges and encodings against a pure-Python
reference implementation on planted corpora.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END = "</w>"  # end-of-word marker (Sennrich-style)


def word_counts(docs: DataFrame, text_col: str = "text",
                max_words: int = 100_000) -> list[tuple[str, int]]:
    """Distributed word-frequency table, capped at ``max_words`` by
    (count desc, word asc) -- the single corpus-wide pass of BPE training."""
    rows = (
        docs.select(F.explode(
            F.expr(f"filter(split({text_col}, ' '), w -> w <> '')")).alias("w"))
        .groupBy("w").agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), F.col("w"))
        .limit(max_words)
        .collect()
    )
    return [(r["w"], r["c"]) for r in rows]


def learn_merges(counts: list[tuple[str, int]], n_merges: int) -> list[tuple[str, str]]:
    """Driver-side merge learning over the word-frequency table: at each
    step merge the most frequent adjacent symbol pair (ties broken by the
    lexicographically smallest pair, so training is deterministic)."""
    vocab: dict[tuple[str, ...], int] = {
        (*word, END): c for word, c in counts if word
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, c in vocab.items():
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + c
        vocab = new_vocab
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges lowest-rank-first to one word (the classic BPE encode
    loop)."""
    syms = [*word, END]
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def train_bpe(docs: DataFrame, n_merges: int = 200, text_col: str = "text",
              max_words: int = 100_000) -> list[tuple[str, str]]:
    """One distributed word-count pass + driver-side merge learning."""
    return learn_merges(word_counts(docs, text_col, max_words), n_merges)


# Deterministic literal corpus for the value-checked graded query: merges
# learned from it (pure Python, no Spark/SQL involved) are embedded as
# literals in BOTH the Spark encode and the DuckDB oracle, so the
# DISTRIBUTED part -- the encode over the real documents table -- is
# hash-exact end to end.  Corpus-trained merges stay covered by pytest
# (the training pass itself is one word-count group-by, oracle-trivial).
PLANTED_CORPUS = (
    "the quick brown fox jumps over the lazy dog",
    "the quicker brown foxes jumped over lazy dogs",
    "low lower lowest slow slower slowest",
    "new newer newest wide wider widest",
    "token tokens tokenizer tokenization",
    "encode encoder encoding encoded decodes decoded",
    "spark sparks sparking parquet parquets",
    "the cat sat on the mat the cats sat on the mats",
    "a an and the this that these those",
    "run runs running runner ran",
    "write writes writing writer written",
    "read reads reading reader",
)


def planted_merges(n_merges: int = 100) -> list[tuple[str, str]]:
    """Merges learned from PLANTED_CORPUS with the same (count desc, word
    asc) capping rule word_counts uses -- pure Python, deterministic,
    identical on the Spark and oracle sides."""
    from collections import Counter

    cnt = Counter(w for line in PLANTED_CORPUS for w in line.split(" ") if w)
    counts = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    return learn_merges(counts, n_merges)


def bpe_encode_oracle_sql(merges: list[tuple[str, str]],
                          table: str = "documents",
                          id_col: str = "doc_id",
                          text_col: str = "text") -> str:
    """DuckDB recomputation of :func:`bpe_encode` with a FIXED merge list:
    a recursive CTE applies ``encode_word``'s exact loop (leftmost
    lowest-rank adjacent pair, one merge per step) to every distinct word,
    then reassembles documents positionally.  Pair keys use chr(1) as the
    (symbol, symbol) separator -- sound for any space-split corpus whose
    text does not contain the SOH control byte."""
    for a, b in merges:
        if "\x01" in a or "\x01" in b:
            raise ValueError(
                "merge symbols containing chr(1) cannot be keyed in the "
                "SQL oracle's pair map")
    big = 2**31 - 1

    def q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    keys = ", ".join(q(a + "\x01" + b) for a, b in merges)
    vals = ", ".join(str(i) for i in range(len(merges)))
    lookup = (f"coalesce(MAP([{keys}], [{vals}])"
              f"[syms[i] || chr(1) || syms[i+1]][1], {big})")
    return f"""
        WITH RECURSIVE
        words AS (
          SELECT DISTINCT w FROM (
            SELECT unnest(list_filter(string_split({text_col}, ' '),
                                      x -> x <> '')) AS w
            FROM {table})
        ),
        enc AS (
          SELECT w,
                 list_append(list_transform(generate_series(1, length(w)),
                                            i -> substring(w, i, 1)),
                             '{END}') AS syms
          FROM words
          UNION ALL
          SELECT w,
                 list_concat(list_concat(
                     list_slice(syms, 1, bi - 1),
                     [syms[bi] || syms[bi + 1]]),
                     list_slice(syms, bi + 2, len(syms))) AS syms
          FROM (
            SELECT w, syms,
                   list_position(rl, list_min(rl)) AS bi,
                   list_min(rl) AS br
            FROM (
              SELECT w, syms,
                     list_transform(generate_series(1, len(syms) - 1),
                                    i -> {lookup}) AS rl
              FROM enc))
          WHERE br < {big}
        ),
        final AS (
          SELECT w, syms FROM (
            SELECT w, syms,
                   list_min(list_transform(generate_series(1, len(syms) - 1),
                                           i -> {lookup})) AS br
            FROM enc)
          WHERE br IS NULL OR br = {big}
        ),
        wordpos AS (
          SELECT {id_col},
                 unnest(generate_series(1, len(ws))) AS pos,
                 unnest(ws) AS w
          FROM (SELECT {id_col},
                       list_filter(string_split({text_col}, ' '),
                                   x -> x <> '') AS ws
                FROM {table})
        ),
        assembled AS (
          SELECT {id_col}, flatten(list(syms ORDER BY pos)) AS bpe_tokens
          FROM wordpos JOIN final USING (w)
          GROUP BY {id_col}
        )
        SELECT d.{id_col},
               CAST(coalesce(len(a.bpe_tokens), 0) AS BIGINT) AS n_bpe,
               coalesce(array_to_string(
                   list_slice(coalesce(a.bpe_tokens, []), 1, 5), '|'),
                   '') AS head_tokens
        FROM {table} d LEFT JOIN assembled a USING ({id_col})
    """


def bpe_decode(df: DataFrame, tokens_col: str = "bpe_tokens",
               id_col: str = "doc_id", out_col: str = "text") -> DataFrame:
    """Inverse of :func:`bpe_encode`, PURE codegen -- no Python, no
    vocabulary, no join: BPE symbols are substrings of the original words
    with the end-of-word marker riding the last symbol, so detokenization
    is concatenate-then-mark-to-space.  Reconstructs the space-normalized
    source text exactly (``decode(encode(text)) ==`` the words of
    ``text`` joined by single spaces -- the same normalization the
    encoder's whitespace split applies).  At 100 TB this is one narrow
    map stage over the token arrays; assumes the corpus text does not
    itself contain the literal marker ``</w>``."""
    return df.select(
        id_col,
        F.expr(f"rtrim(replace(concat_ws('', {tokens_col}), '{END}', ' '))")
        .alias(out_col))


BROADCAST_VOCAB_MAX_WORDS = 1_000_000  # ~60-100 MB broadcast, far under Spark's 8 GB hard limit


def bpe_encode(docs: DataFrame, merges: list[tuple[str, str]],
               text_col: str = "text", id_col: str = "doc_id",
               broadcast_vocab: bool | None = None) -> DataFrame:
    """(id, bpe_tokens array<string>, n_bpe): distributed encode via a
    distinct-word table -- NO per-row Python over the corpus.

    The iterative merge loop (``encode_word``) runs exactly ONCE per
    DISTINCT word, as a batched kernel over the vocabulary table (millions
    of rows at corpus scale, vs billions of corpus words).  The corpus
    itself is only touched by codegen operators: positional explode ->
    ``word -> tokens`` join -> ordered reassembly with array_sort +
    flatten.  Zipf skew in word frequency lands entirely on the JOIN
    side, where a broadcast join is skew-immune.

    ``broadcast_vocab``: True forces a broadcast join, False a shuffle
    join (AQE picks the strategy), and the default None AUTO-DEGRADES
    (ADVICE r4): the encoded vocab is lazily checkpointed, counted once,
    and broadcast only if it holds <= ``BROADCAST_VOCAB_MAX_WORDS`` rows
    -- a web-crawl vocabulary of tens of millions of types would
    otherwise blow the 8 GB broadcast hard limit / driver memory, and
    nothing short of a count knows that before the join plans.  The
    count's materialization is reused by the join (checkpoint), so auto
    mode costs no extra corpus pass.

    ``id_col`` values are assumed unique (one output row per id: the
    reassembly groups by id)."""
    ranks = {p: i for i, p in enumerate(merges)}
    id_type = dict(docs.dtypes)[id_col]  # honor the actual id column type
    base = docs.select(
        F.col(id_col),
        F.expr(f"filter(split({text_col}, ' '), w -> w <> '')").alias("__ws"))
    vocab = base.select(F.explode("__ws").alias("w")).distinct()

    def enc_words(it):
        import pandas as pd

        for pdf in it:
            yield pd.DataFrame({
                "w": pdf["w"],
                "toks": [encode_word(w, ranks) for w in pdf["w"]],
            })

    word_toks = vocab.mapInPandas(enc_words, "w string, toks array<string>")
    if broadcast_vocab is None:
        word_toks = word_toks.localCheckpoint(eager=False)
        if word_toks.count() <= BROADCAST_VOCAB_MAX_WORDS:
            word_toks = F.broadcast(word_toks)
    elif broadcast_vocab:
        word_toks = F.broadcast(word_toks)
    pos = base.select(id_col, F.posexplode("__ws").alias("__pos", "w"))
    assembled = (
        pos.join(word_toks, "w")
        .groupBy(id_col)
        .agg(F.flatten(F.transform(
            F.array_sort(F.collect_list(F.struct("__pos", "toks"))),
            lambda s: s["toks"])).alias("bpe_tokens"))
    )
    return (
        docs.select(id_col)
        .join(assembled, id_col, "left")
        .select(
            F.col(id_col).cast(id_type),
            F.coalesce("bpe_tokens",
                       F.expr("CAST(array() AS array<string>)"))
            .alias("bpe_tokens"))
        .withColumn("n_bpe", F.size("bpe_tokens").cast("long"))
    )
