"""Web-ingestion queries: HTML extraction + WARC, oracle-checked.

The extraction operator (`operators/html_text.py`) and the WARC source
(`sources/warc.py`) are host-I/O / UDF surfaces a DuckDB oracle cannot
drive directly — but the EXTRACTOR's semantics are checkable end to
end by synthesizing HTML from the documents table with a KNOWN
template in-plan (JVM `concat`, no UDF on the build side), running the
real Arrow-batched extractor over it, and predicting every output
column with SQL string arithmetic. A hash match here pins: subtree
skipping (`<script>`), title capture, anchor counting and link-text
mass, block-tag line breaking, whitespace normalization, and the
quantized link-density ratio — the whole visible contract of the
extraction stage, on well-formed input. (Malformed/adversarial input
is pytest's job: tests/test_round12_ops.py::TestHtmlText.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import oracle_quantize
from ..operators.html_text import extract_html_text
from ..session import ensure_utc
from ..sources import load_table
from .registry import register

# the synthetic page: title + nav (2 links) + a skipped script + body
_NAV_TEXT_CHARS = len("home about")  # first extracted line
_LINK_TEXT_CHARS = len("home") + len("about")


@register(
    "web_html_extract",
    oracle=f"""
WITH t AS (
  SELECT doc_id, trim(regexp_replace(text, ' +', ' ', 'g')) AS c
  FROM documents
  WHERE length(trim(text)) > 0
)
SELECT doc_id,
       'Doc ' || doc_id AS title,
       'home about' || chr(10) || c AS text,
       2 AS n_links,
       CAST({_NAV_TEXT_CHARS} + 1 + length(c) AS INT) AS text_chars,
       {oracle_quantize(
           f"{_LINK_TEXT_CHARS} * 1.0 / ({_NAV_TEXT_CHARS} + 1 + length(c))", 4
       )} AS link_density
FROM t
""",
)
def web_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize one HTML page per document (deterministic template),
    extract with the real operator, return the extraction columns the
    oracle predicts from the raw text."""
    ensure_utc(spark)
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter(F.length(F.trim("text")) > 0)
    )
    pages = docs.select(
        "doc_id",
        F.concat(
            F.lit("<html><head><title>Doc "),
            F.col("doc_id").cast("string"),
            F.lit(
                '</title></head><body><nav><a href="/">home</a> '
                '<a href="/about">about</a></nav>'
                "<script>var x = 1;</script><p>"
            ),
            F.col("text"),
            F.lit("</p></body></html>"),
        ).alias("html"),
    )
    out = extract_html_text(pages, html_col="html", id_col="doc_id")
    return out.select(
        "doc_id",
        "title",
        "text",
        "n_links",
        F.col("text_chars").cast("int").alias("text_chars"),
        "link_density",
    )
