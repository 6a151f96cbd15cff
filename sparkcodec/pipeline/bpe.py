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


def bpe_encode(docs: DataFrame, merges: list[tuple[str, str]],
               text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, bpe_tokens array<string>, n_bpe): distributed encode with the
    learned merges broadcast to the executors; per-word results are
    memoized within each batch (Zipf input -> high hit rate)."""
    ranks = {p: i for i, p in enumerate(merges)}
    id_type = dict(docs.dtypes)[id_col]  # honor the actual id column type

    def enc(it):
        import pandas as pd

        cache: dict[str, list[str]] = {}
        for pdf in it:
            toks_col = []
            for text in pdf[text_col].fillna(""):
                toks: list[str] = []
                for w in text.split(" "):
                    if not w:
                        continue
                    got = cache.get(w)
                    if got is None:
                        got = cache[w] = encode_word(w, ranks)
                    toks.extend(got)
                toks_col.append(toks)
            yield pd.DataFrame({id_col: pdf[id_col].to_numpy(),
                                "bpe_tokens": toks_col,
                                "n_bpe": [len(t) for t in toks_col]})

    return docs.select(id_col, text_col).mapInPandas(
        enc, f"{id_col} {id_type}, bpe_tokens array<string>, n_bpe long")
