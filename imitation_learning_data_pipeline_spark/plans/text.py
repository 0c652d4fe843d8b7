"""Text-analysis plans over the documents table (BASELINE.json extension):
language ID, quality scoring, token counting, document fingerprinting.

All expressions live in functions/text.py and are pure built-ins; the
oracles mirror them fragment-for-fragment (shared regexes restricted to
the Java-regex ∩ RE2 common subset, identical rounding points).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import (
    LANG_MARKERS,
    STOPWORDS,
    langid_pick,
    langid_scores,
    normalize_text,
    quality_features,
    clean_words,
    shingles_of_words,
)
from ..session import ensure_utc
from ..sources import load_table
from .dedup import _NORM_SQL, _W_SQL, _shingle_sql
from .registry import register


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.readers import spread

    ensure_utc(spark)
    # Heavy per-row regex/shingle work over a few-MB file: repartition to
    # all cores (see sources.readers.spread).
    return spread(load_table(spark, sf_dir, "documents"))


def _marker_count_sql(markers: list[str]) -> str:
    inlist = ", ".join(f"'{m}'" for m in markers)
    return f"len(list_filter({_W_SQL}, x -> x IN ({inlist})))"


def _langid_oracle() -> str:
    scores = {lang: f"s_{lang}" for lang in LANG_MARKERS}
    score_cols = ",\n       ".join(
        f"{_marker_count_sql(ms)} AS s_{lang}" for lang, ms in LANG_MARKERS.items()
    )
    langs = list(LANG_MARKERS)
    cases = []
    for i, lang in enumerate(langs):
        conds = [f"{scores[lang]} > 0"]
        for j, other in enumerate(langs):
            if other == lang:
                continue
            op = ">=" if j > i else ">"
            conds.append(f"{scores[lang]} {op} {scores[other]}")
        cases.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    case_sql = "\n            ".join(cases)
    return f"""
WITH scored AS (
  SELECT doc_id, text,
       {score_cols}
  FROM documents
)
SELECT doc_id,
       CASE WHEN regexp_matches(text, '[\\x{{4e00}}-\\x{{9fff}}]') THEN 'zh'
            {case_sql}
            ELSE 'und' END AS lang_pred
FROM scored
"""


@register("text_langid", oracle=_langid_oracle())
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language ID — the n-gram-heuristic family, zero UDF.

    Two projections: score columns first (normalize+split+filter runs once
    per doc), then the CASE over plain columns — avoids the HOF
    no-CSE re-evaluation cliff (see functions.text.langid_scores)."""
    docs = _docs(spark, sf_dir)
    scored = docs.select(
        "doc_id",
        *[expr.alias(name) for name, expr in langid_scores("text").items()],
    )
    scores = {lang: F.col(f"s_{lang}") for lang in LANG_MARKERS}
    return scored.select(
        "doc_id", langid_pick(F.col("is_cjk"), scores).alias("lang_pred")
    )


_FEATURE_SQL = f"""
  SELECT doc_id,
         CAST(length(text) AS BIGINT) AS n_chars,
         CAST(len({_W_SQL}) AS BIGINT) AS n_words,
         round(CAST(list_aggregate(list_transform({_W_SQL}, x -> length(x)), 'sum')
                 AS DOUBLE) / greatest(len({_W_SQL}), 1), 4) AS mean_word_len,
         round(CAST(len(list_filter({_W_SQL},
                 x -> x IN ({", ".join(f"'{s}'" for s in STOPWORDS)})))
                 AS DOUBLE) / greatest(len({_W_SQL}), 1), 4) AS stopword_ratio,
         round(CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
                 AS DOUBLE) / greatest(length(text), 1), 4) AS digit_ratio,
         round(CAST(length(text) - length(regexp_replace(text, '[.!?,;:]', '', 'g'))
                 AS DOUBLE) / greatest(length(text), 1), 4) AS punct_ratio
  FROM documents
"""


@register(
    "text_quality_score",
    oracle=f"""
WITH feats AS ({_FEATURE_SQL})
SELECT doc_id, n_chars, n_words, mean_word_len, stopword_ratio,
       digit_ratio, punct_ratio,
       round(2 * stopword_ratio + least(n_words, 100) / 100.0
             - 2 * digit_ratio - 2 * punct_ratio, 4) AS quality_score,
       (n_words >= 10 AND mean_word_len BETWEEN 2 AND 12) AS is_good
FROM feats
""",
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic document-quality features + composite score.

    Score combines stopword density (fluent text has function words),
    length saturation, and digit/punct noise — the classic cheap quality
    filter for web-scale training corpora. One narrow projection per doc;
    trivially scan-bound at scale.
    """
    docs = _docs(spark, sf_dir)
    feats = docs.select("doc_id", *[
        expr.alias(name) for name, expr in quality_features("text").items()
    ])
    score = F.round(
        2 * F.col("stopword_ratio")
        + F.least(F.col("n_words"), F.lit(100)) / 100.0
        - 2 * F.col("digit_ratio")
        - 2 * F.col("punct_ratio"),
        4,
    )
    return feats.select(
        "doc_id",
        "n_chars",
        "n_words",
        "mean_word_len",
        "stopword_ratio",
        "digit_ratio",
        "punct_ratio",
        score.alias("quality_score"),
        (
            (F.col("n_words") >= 10) & F.col("mean_word_len").between(2, 12)
        ).alias("is_good"),
    )


@register(
    "text_token_count",
    oracle=f"""
SELECT doc_id,
       CAST(len({_W_SQL}) AS BIGINT) AS n_ws_tokens,
       CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[.!?,;:]'))
         AS BIGINT) AS n_regex_tokens,
       CAST(len(list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+')))
         AS BIGINT) AS n_distinct_tokens,
       round(CAST(len(list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+')))
                 AS DOUBLE)
             / greatest(len(regexp_extract_all(lower(text), '[a-z0-9]+')), 1), 4)
         AS type_token_ratio
FROM documents
""",
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish regex token counts and type/token ratio."""
    docs = _docs(spark, sf_dir)
    low = F.lower(F.col("text"))
    ws = F.filter(F.split(normalize_text("text"), " "), lambda x: x != "")
    regex_toks = F.regexp_extract_all(low, F.lit("[a-z]+|[0-9]+|[.!?,;:]"), 0)
    alpha_toks = F.regexp_extract_all(low, F.lit("[a-z0-9]+"), 0)
    return docs.select(
        "doc_id",
        F.size(ws).cast("long").alias("n_ws_tokens"),
        F.size(regex_toks).cast("long").alias("n_regex_tokens"),
        F.size(F.array_distinct(alpha_toks)).cast("long").alias("n_distinct_tokens"),
        F.round(
            F.size(F.array_distinct(alpha_toks)).cast("double")
            / F.greatest(F.size(alpha_toks), F.lit(1)),
            4,
        ).alias("type_token_ratio"),
    )


_N_SKETCH = 3


def _fingerprint_oracle() -> str:
    mins = ",\n         ".join(
        f"min(md5('{i}|' || s)) AS fp{i}" for i in range(_N_SKETCH)
    )
    return f"""
WITH shingled AS (
  SELECT doc_id, unnest({_shingle_sql(5)}) AS s FROM documents
),
sketch AS (
  SELECT doc_id,
         {mins}
  FROM shingled GROUP BY doc_id
)
SELECT d.doc_id,
       md5({_NORM_SQL}) AS fp_full,
       s.fp0, s.fp1, s.fp2
FROM documents d LEFT JOIN sketch s ON d.doc_id = s.doc_id
"""


@register("text_fingerprint", oracle=_fingerprint_oracle())
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: full content hash + k-min sketch over 5-word
    shingles (the rolling-hash / winnowing family: the sketch survives
    local edits that move content around, unlike fp_full).

    Reference analogue: the combined sha256 episode fingerprint
    (fp/fingerprint.py:37-38) — there a file-level identity, here a
    content-level near-identity."""
    docs = _docs(spark, sf_dir)
    sh = docs.select("doc_id", clean_words("text").alias("__w")).select(
        "doc_id", F.explode(shingles_of_words(F.col("__w"), 5)).alias("s")
    )
    sketch = sh.groupBy("doc_id").agg(
        *[
            F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("s")))).alias(f"fp{i}")
            for i in range(_N_SKETCH)
        ]
    )
    return docs.select(
        "doc_id", F.md5(normalize_text("text")).alias("fp_full")
    ).join(sketch, "doc_id", "left")


# --- curation scrubbing / segmentation (library surface; local-gate
# checked — the driver contract is capped at 50 queries) ---------------------

# Regexes restricted to the Java-regex ∩ RE2 common subset so the DuckDB
# oracle applies them verbatim. Deliberately simple pattern families —
# at corpus scale PII scrubbing is a regex cascade exactly like this,
# tuned per deployment.
_PII_PATTERNS = [
    ("email", r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"),
    ("phone", r"\+?[0-9][0-9()\-\s]{7,}[0-9]"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"),
]


def _redact_sql() -> str:
    expr = "text"
    for name, pat in _PII_PATTERNS:
        # DuckDB regexp_replace with 'g' flag; escape single quotes
        p = pat.replace("\\", "\\\\") if False else pat
        expr = f"regexp_replace({expr}, '{p}', '<{name.upper()}>', 'g')"
    return f"""
SELECT doc_id,
       {expr} AS clean_text,
       CAST(len(regexp_extract_all(text, '{_PII_PATTERNS[0][1]}')) AS BIGINT)
         AS n_emails,
       CAST(len(regexp_extract_all(text, '{_PII_PATTERNS[2][1]}')) AS BIGINT)
         AS n_ipv4
FROM documents
"""


@register("text_redact_pii", oracle=_redact_sql())
def text_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: regex-cascade redaction of emails / phone numbers /
    IPv4 literals plus per-doc hit counts — the standard pre-training
    scrub pass. Pure JVM regexp_replace chain; scan-bound at scale."""
    docs = _docs(spark, sf_dir)
    clean = F.col("text")
    for name, pat in _PII_PATTERNS:
        clean = F.regexp_replace(clean, pat, f"<{name.upper()}>")
    return docs.select(
        "doc_id",
        clean.alias("clean_text"),
        F.size(F.regexp_extract_all("text", F.lit(_PII_PATTERNS[0][1]), 0))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all("text", F.lit(_PII_PATTERNS[2][1]), 0))
        .cast("long")
        .alias("n_ipv4"),
    )


@register(
    "text_sentence_stats",
    oracle="""
WITH sents AS (
  SELECT doc_id,
         list_filter(list_transform(string_split_regex(text, '[.!?]+'),
                                    s -> trim(s)), s -> s <> '') AS ss
  FROM documents
)
SELECT doc_id,
       CAST(len(ss) AS BIGINT) AS n_sentences,
       round(CAST(list_aggregate(list_transform(ss, s -> length(s)), 'sum')
               AS DOUBLE) / greatest(len(ss), 1), 4) AS mean_sentence_chars,
       CAST(list_aggregate(list_transform(ss, s -> length(s)), 'max')
         AS BIGINT) AS max_sentence_chars
FROM sents
""",
)
def text_sentence_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence segmentation stats (terminal-punctuation split): sentence
    count, mean/max sentence length — the document-structure features
    quality filters key on (wall-of-text and one-liner detection)."""
    docs = _docs(spark, sf_dir)
    ss = F.filter(
        F.transform(F.split(F.col("text"), "[.!?]+"), lambda s: F.trim(s)),
        lambda s: s != "",
    )
    docs2 = docs.select("doc_id", ss.alias("__ss"))
    lens = F.transform(F.col("__ss"), lambda s: F.length(s))
    return docs2.select(
        "doc_id",
        F.size("__ss").cast("long").alias("n_sentences"),
        F.round(
            F.aggregate(lens, F.lit(0), lambda a, x: a + x).cast("double")
            / F.greatest(F.size("__ss"), F.lit(1)),
            4,
        ).alias("mean_sentence_chars"),
        F.array_max(lens).cast("long").alias("max_sentence_chars"),
    )
