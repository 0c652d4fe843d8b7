"""Text-analysis column expressions (language ID, quality, tokens, shingles).

All pure `pyspark.sql.functions` — regexes kept in the common subset of
Java regex (Spark) and RE2 (DuckDB/others) so oracle SQL can mirror them
exactly. These power the LLM-training-data operators (BASELINE.json
extensions): dedup shingling, quality filtering, language ID.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .rounding import quantize


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def normalize_text(col: Column | str) -> Column:
    """Lowercase, strip non-alphanumerics to spaces, collapse whitespace.

    The canonical form used for exact-dedup hashing — punctuation and
    case differences don't defeat duplicate detection.

    ONE run-matching regex (r12): the output is byte-identical to the
    historical two-pass form (``[^a-z0-9 ]``→space, then collapse
    ``" +"``) — both yield the maximal ``[a-z0-9]`` runs joined by
    single spaces — but the unquantified character class is a JVM
    pathology under concurrency: the r12 scale sweep measured it at
    ~55× the CPU of the run-matching form on the same data (42 s vs
    0.76 s for 50k docs × 32 threads; same wall ordering). Pinned by a
    pytest equivalence property; oracles keep the two-pass SQL since
    outputs are identical strings.
    """
    t = F.lower(_c(col))
    t = F.regexp_replace(t, "[^a-z0-9]+", " ")
    return F.trim(t)


def words(col: Column | str) -> Column:
    """Whitespace tokens of the normalized text (array<string>)."""
    return F.split(normalize_text(col), " ")


def clean_words(col: Column | str) -> Column:
    """Normalized non-empty word tokens (array<string>).

    Semantically identical to ``filter(words(col), x -> x != '')`` —
    the tokens are the maximal ``[a-z0-9]`` runs of the lowercased text
    — but computed with ONE regex pass (split on non-alphanumeric runs)
    instead of normalize_text's two regexp_replaces + split + trim.
    This is the hottest expression in the repo (every dedup/text plan
    shingles through it); the r6 stage profile measured the two-pass
    form at ~5 task-CPU-s of the sf0.1 minhash run, half the
    pre-aggregate cost.
    """
    return F.filter(
        F.split(F.lower(_c(col)), "[^a-z0-9]+"), lambda x: x != ""
    )


def shingles_of_words(wcol: Column | str, n: int = 3) -> Column:
    """Positional word n-grams over a PRECOMPUTED clean-words column.

    Built as a zip_with chain over shifted copies of the word array —
    deliberately NOT ``transform(indices, i -> slice(w, i, n))``: higher-
    order functions are CodegenFallback with no common-subexpression
    elimination, so an array expression referenced *inside* a lambda body
    is re-evaluated per element — that formulation re-ran the whole
    normalize+split per shingle (measured ~160 ms/row; this one is ~100×
    cheaper). Here lambdas only touch their element arguments; ``wcol``
    is referenced O(n) times per row — which is why hot paths project
    :func:`clean_words` into a column FIRST (profiled ~45 CPU-s of a
    sf0.1 minhash run was normalize+split re-evaluation when shingling
    straight off the text column).

    zip_with pads the shorter (shifted) side with nulls; F.concat
    propagates them, and the final filter drops the null tail — leaving
    exactly size−n+1 shingles (empty for docs shorter than n words).
    """
    w = _c(wcol)
    z = w
    for k in range(1, n):
        shifted = F.slice(w, k + 1, F.greatest(F.size(w) - k, F.lit(0)))
        z = F.zip_with(z, shifted, lambda a, b: F.concat(a, F.lit(" "), b))
    return F.filter(z, lambda s: s.isNotNull())


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Single-expression shingles of a text column (convenience form).

    Hot paths should project clean_words first and use shingles_of_words
    — this inline form re-runs normalize+split O(n) times per row."""
    return shingles_of_words(clean_words(col), n)


# Tiny per-language function-word marker sets (public linguistics
# commonplace). Order matters: ties broken by this priority.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a"],
    "de": ["der", "die", "das", "und", "ist"],
    "es": ["el", "la", "los", "que", "y"],
    "fr": ["le", "les", "des", "et", "est"],
}


def langid_scores(col: Column | str) -> dict[str, Column]:
    """Per-language marker-hit counts plus the CJK flag.

    Callers MUST materialize these through a ``select()`` projection before
    feeding them to :func:`langid_pick`. Higher-order functions are
    CodegenFallback with no common-subexpression elimination, so a CASE
    chain that references each ``F.size(F.filter(words, ...))`` expression
    in up to 4 conditions re-runs normalize+split+filter ~20× per row
    (measured: 53 s for 5,000 docs vs scan-bound when projected first).
    """
    t = _c(col)
    w = words(col)

    def _in(markers: list[str]):
        # closure, not a default arg: F.filter treats 2-parameter lambdas
        # as the (element, index) form
        return lambda x: x.isin(*markers)

    out: dict[str, Column] = {"is_cjk": t.rlike("[\\u4e00-\\u9fff]")}
    for lang, markers in LANG_MARKERS.items():
        out[f"s_{lang}"] = F.size(F.filter(w, _in(markers)))
    return out


def langid_pick(
    is_cjk: Column, scores: dict[str, Column]
) -> Column:
    """Argmax with deterministic priority over *plain columns* of marker
    scores (see langid_scores): CJK → zh, else first-listed language that
    beats earlier ones strictly and later ones weakly, else 'und'."""
    langs = list(LANG_MARKERS)
    expr = F.when(is_cjk, F.lit("zh"))
    for i, lang in enumerate(langs):
        cond = scores[lang] > 0
        for j, other in enumerate(langs):
            if other == lang:
                continue
            if j > i:
                cond = cond & (scores[lang] >= scores[other])
            else:
                cond = cond & (scores[lang] > scores[other])
        expr = expr.when(cond, F.lit(lang))
    return expr.otherwise(F.lit("und"))


def langid(col: Column | str) -> Column:
    """Single-expression language ID — convenience form for small inputs.

    Hot paths should use langid_scores + select + langid_pick instead
    (this inline form re-evaluates the word array per CASE condition)."""
    s = langid_scores(col)
    is_cjk = s.pop("is_cjk")
    return langid_pick(is_cjk, {k.removeprefix("s_"): v for k, v in s.items()})


STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "by", "at", "this", "that",
]


def quality_features(col: Column | str) -> dict[str, Column]:
    """Quality-scoring feature bundle (each a scalar Column)."""
    t = _c(col)
    w = words(col)
    n_chars = F.length(t)
    n_words = F.size(w)
    return {
        "n_chars": n_chars.cast("long"),
        "n_words": n_words.cast("long"),
        # quantize, not F.round: int/int ratios land on shortest-repr
        # half boundaries constantly (functions/rounding.py)
        "mean_word_len": quantize(
            F.aggregate(w, F.lit(0), lambda acc, x: acc + F.length(x)).cast("double")
            / F.greatest(n_words, F.lit(1)),
            4,
        ),
        "stopword_ratio": quantize(
            F.size(F.filter(w, lambda x: x.isin(*STOPWORDS))).cast("double")
            / F.greatest(n_words, F.lit(1)),
            4,
        ),
        "digit_ratio": quantize(
            (n_chars - F.length(F.regexp_replace(t, "[0-9]", ""))).cast("double")
            / F.greatest(n_chars, F.lit(1)),
            4,
        ),
        "punct_ratio": quantize(
            (n_chars - F.length(F.regexp_replace(t, "[.!?,;:]", ""))).cast("double")
            / F.greatest(n_chars, F.lit(1)),
            4,
        ),
    }
