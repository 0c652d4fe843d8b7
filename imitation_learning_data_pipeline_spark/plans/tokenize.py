"""Distributed BPE tokenizer training and encoding.

A training-data engine that counts, packs, and budgets by tokens
(mixture_token_budget, pack_sequences, text_chunk_documents) needs the
tokenizer itself to be trainable ON the corpus — vocabulary fit to the
data, not a stand-in whitespace count. This module implements classic
byte-pair encoding (Sennrich et al. 2016, "Neural Machine Translation
of Rare Words with Subword Units") as Spark plans.

Scale design — the corpus is scanned ONCE, iterations touch only the
word-frequency table:

1. ``explode(clean_words) → groupBy(word).count()`` — the single
   corpus-sized shuffle, map-side combined, output bounded by the
   DISTINCT vocabulary (millions of rows at 100 TB, not trillions).
2. Each merge iteration runs entirely on that word table:
   - adjacent symbol pairs via a ``transform`` over array indices
     (JVM expression), exploded and summed with the word's count as
     weight — shuffle ≤ |vocab| · avg_symbols rows;
   - the argmax pair (count desc, then lexicographic pair — the
     determinism tiebreak) is ONE collected row (driver-side
     metadata decision, like every loop pivot in this repo);
   - the merge applies as a pure-JVM ``aggregate`` fold over the
     symbol array (left-to-right, non-overlapping — reference BPE
     semantics), no UDF anywhere in the training loop;
   - ``localCheckpoint`` per iteration truncates lineage (same
     discipline as plans/graph.py::pagerank and connected
     components — measured there: analyzer cost compounds without
     it).
3. Encoding also never touches the corpus per-token: the DISTINCT
   words are encoded once (Arrow-batched ``mapInPandas`` — the
   per-word merge loop is genuinely iterative, the honest Pandas-UDF
   case) and joined back; per-document token counts are a sum over
   word counts, not a re-tokenization.

Stopping: after ``n_merges`` merges or when the best pair's count
drops below ``min_pair_count`` (singleton pairs carry no compression
signal), whichever comes first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import clean_words
from .registry import register

#: end-of-word sentinel (cannot collide with clean_words tokens, which
#: are [a-z0-9]+ only)
EOW = "</w>"

_PAIRS = (
    "transform(slice(symbols, 1, size(symbols)-1), "
    "(s, i) -> struct(s AS left, element_at(symbols, i+2) AS right))"
)


def word_frequency_table(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n_occurrences) over the corpus — the ONE corpus-sized
    aggregation BPE training needs; everything after runs on this."""
    return (
        df.select(F.explode(clean_words(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n_occurrences"))
    )


def _char_symbols(word_col: str = "word"):
    # (?!$) splits between every char without a trailing empty token
    return F.concat(
        F.split(F.col(word_col), r"(?!$)"), F.array(F.lit(EOW))
    )


def _apply_merge(left: str, right: str):
    """Left-to-right non-overlapping replacement of the adjacent pair
    (left, right) with the fused symbol — the reference BPE merge — as
    a JVM aggregate fold over the ``symbols`` array."""
    fused = left + right
    return F.aggregate(
        F.col("symbols"),
        F.expr("cast(array() as array<string>)"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, F.lit(-1)) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - F.lit(1)),
                F.array(F.lit(fused)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 100,
    min_pair_count: int = 2,
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Learn up to ``n_merges`` BPE merges from the corpus.

    Returns ``(merges, words)``: ``merges`` is the ordered list
    ``[(left, right, pair_count), ...]`` (rank = list position) and
    ``words`` the final (word, n_occurrences, symbols) frame — the
    trained segmentation of every vocabulary word, reusable by
    :func:`bpe_encode_words` without replaying merges.
    """
    if n_merges < 1:
        raise ValueError("bpe_train: n_merges must be >= 1")
    words = (
        word_frequency_table(df, text_col)
        .withColumn("symbols", _char_symbols())
        .repartition("word")
        .localCheckpoint()
    )
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        best = (
            words.select(
                F.explode(F.expr(_PAIRS)).alias("p"), F.col("n_occurrences")
            )
            .groupBy("p.left", "p.right")
            .agg(F.sum("n_occurrences").alias("cnt"))
            .orderBy(F.col("cnt").desc(), "left", "right")
            .limit(1)
            .collect()
        )
        if not best or best[0]["cnt"] < min_pair_count:
            break
        left, right, cnt = best[0]["left"], best[0]["right"], int(best[0]["cnt"])
        merges.append((left, right, cnt))
        old = words
        words = words.withColumn(
            "symbols", _apply_merge(left, right)
        ).localCheckpoint()
        old.unpersist()
    return merges, words


def bpe_encode_words(
    words: DataFrame, merges: list[tuple[str, str, int]], word_col: str = "word"
) -> DataFrame:
    """(word, tokens array<string>) for each DISTINCT word in ``words``,
    applying ``merges`` in rank order (lowest rank first — the classic
    encode loop). Arrow-batched; cost ∝ vocabulary, never corpus."""
    import pandas as pd

    ranks = {(l, r): i for i, (l, r, _c) in enumerate(merges)}

    def encode_one(w: str) -> list[str]:
        syms = list(w) + [EOW]
        while len(syms) > 1:
            pairs = [(syms[i], syms[i + 1]) for i in range(len(syms) - 1)]
            cand = min(
                (p for p in pairs if p in ranks),
                key=lambda p: ranks[p],
                default=None,
            )
            if cand is None:
                break
            l, r = cand
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    def run(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    word_col: pdf[word_col],
                    "tokens": [encode_one(w) for w in pdf[word_col]],
                }
            )

    return words.select(word_col).distinct().mapInPandas(
        run, f"`{word_col}` string, tokens array<string>"
    )


def bpe_token_counts(
    df: DataFrame,
    merges: list[tuple[str, str, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_tokens) per document under the trained tokenizer —
    distinct words are encoded once, the corpus only joins word →
    token-length and sums (never re-tokenizes per occurrence)."""
    occurrences = df.select(
        F.col(id_col), F.explode(clean_words(F.col(text_col))).alias("word")
    )
    lengths = bpe_encode_words(
        occurrences.select("word").distinct(), merges
    ).select("word", F.size("tokens").alias("n_toks"))
    return (
        occurrences.join(lengths, "word")
        .groupBy(id_col)
        .agg(F.sum("n_toks").alias("n_tokens"))
    )


# --- library entries ----------------------------------------------------------

_BPE_MERGES = 30


@register("text_bpe_merges")
def text_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Library row (rows-only: the iterative argmax-and-merge loop is
    not SQL-expressible — same category as the streaming stateful ops;
    exact parity with an independent reference implementation is
    pytest-locked in tests/test_round10b_ops.py): the first 30 BPE
    merges learned from the documents corpus, with rank and pair
    count."""
    from ..session import ensure_utc
    from ..sources import load_table
    from ..sources.readers import spread

    ensure_utc(spark)
    docs = spread(load_table(spark, sf_dir, "documents"))
    merges, _words = bpe_train(docs, n_merges=_BPE_MERGES)
    return spark.createDataFrame(
        [(i, l, r, c) for i, (l, r, c) in enumerate(merges)],
        "rank long, left string, right string, pair_count long",
    )
