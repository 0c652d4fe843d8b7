"""HTML → text extraction for web-corpus ingestion (stdlib-only).

The front door of every web-scale LLM corpus (C4, RefinedWeb, FineWeb)
is boilerplate-aware text extraction from crawled HTML. This module is
that stage in its dependency-free form: a :mod:`html.parser`-based
extractor (stdlib — trafilatura/justext/bs4 are not in this container
and are NOT silently required) run as ONE Arrow-batched ``mapInPandas``
over (id, html) rows, emitting per-document:

- ``text``: visible text with ``<script>/<style>/<noscript>/<template>``
  subtrees dropped, block-level tags as line breaks, inline tags
  flowed, entities decoded (``html.unescape`` via the parser's
  ``convert_charrefs``), whitespace normalized;
- ``title``: the first ``<title>`` content;
- ``n_links`` / ``link_text_chars``: anchor counts and anchor-text
  mass for the standard link-density boilerplate signal
  (``link_density = link_text_chars / max(text_chars, 1)`` — nav/menu
  pages score high and get filtered downstream);
- ``text_chars``: visible-text length after normalization.

Scale shape: pure map-side — no shuffle, no driver involvement; the
Python cost is the parse itself, paid once per document in Arrow
batches. Downstream quality gates (Gopher rules, language ID, dedup)
consume ``text`` unchanged. Malformed HTML never raises: html.parser
is a forgiving streaming tokenizer (unclosed tags flow through), which
is the correct posture for crawl data — refusal lives at the WARC
framing layer (`sources/warc.py`), not the markup layer.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from typing import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SKIP_SUBTREES = {"script", "style", "noscript", "template", "svg"}
# HTML5 block-ish elements: entering/leaving one is a line break
_BLOCK = {
    "p", "div", "br", "li", "ul", "ol", "table", "tr", "td", "th",
    "h1", "h2", "h3", "h4", "h5", "h6", "section", "article", "header",
    "footer", "nav", "aside", "blockquote", "pre", "figure",
    "figcaption", "main", "form", "hr",
}


class _TextExtractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._skip_depth = 0
        self._in_title = False
        self._in_anchor = 0
        self.parts: list[str] = []
        self.title_parts: list[str] = []
        self.n_links = 0
        self.link_text_chars = 0

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_SUBTREES:
            self._skip_depth += 1
            return
        if self._skip_depth > 0:
            # a link inside <noscript>/<template> contributes neither
            # text nor link metrics — counting it would inflate n_links
            # relative to link_text_chars (the pair must stay coherent)
            return
        if tag == "title":
            self._in_title = True
        elif tag == "a":
            self._in_anchor += 1
            self.n_links += 1
        if tag in _BLOCK:
            self.parts.append("\n")

    def handle_endtag(self, tag):
        if tag in _SKIP_SUBTREES and self._skip_depth > 0:
            self._skip_depth -= 1
            return
        if self._skip_depth > 0:
            return
        if tag == "title":
            self._in_title = False
        elif tag == "a" and self._in_anchor > 0:
            self._in_anchor -= 1
        if tag in _BLOCK:
            self.parts.append("\n")

    def handle_data(self, data):
        if self._skip_depth > 0:
            return
        if self._in_title:
            self.title_parts.append(data)
            return
        if data:
            self.parts.append(data)
            if self._in_anchor > 0:
                self.link_text_chars += len(data.strip())


def extract_text(html: str) -> dict:
    """One document's extraction — the unit the Spark operator maps.
    Pure function; safe for driver-side tests and oracle derivation."""
    p = _TextExtractor()
    p.feed(html or "")
    p.close()
    # normalize: collapse intra-line whitespace, drop blank lines
    lines = []
    for raw_line in "".join(p.parts).split("\n"):
        line = " ".join(raw_line.split())
        if line:
            lines.append(line)
    text = "\n".join(lines)
    return {
        "text": text,
        "title": " ".join("".join(p.title_parts).split()),
        "n_links": p.n_links,
        "link_text_chars": p.link_text_chars,
        "text_chars": len(text),
    }


_OUT_FIELDS = (
    "text string, title string, n_links int, link_text_chars int, "
    "text_chars int"
)

# first-2-KiB probe, per the HTML5 encoding prescan
_META_CHARSET = re.compile(
    rb"""<meta[^>]+charset\s*=\s*["']?\s*([a-zA-Z0-9_\-]+)""", re.IGNORECASE
)


def decode_html(payload: bytes, declared: str | None = None) -> str:
    """Crawl-grade charset handling (the WHATWG encoding-sniffing
    order, minus chardet-style statistical guessing): BOM wins, then
    the transport-declared charset (HTTP Content-Type parameter), then
    an HTML5-style ``<meta charset>`` prescan of the first 2 KiB, then
    UTF-8. Every decode uses ``errors="replace"`` — a mojibake'd
    document flows to the quality gates (which score it down), a
    raised one kills a task; unknown/misdeclared labels fall through
    to the next source rather than erroring."""
    if payload.startswith(b"\xef\xbb\xbf"):
        return payload[3:].decode("utf-8", "replace")
    if payload.startswith((b"\xff\xfe", b"\xfe\xff")):
        return payload.decode("utf-16", "replace")
    for label in (declared, _sniff_meta_charset(payload)):
        if not label:
            continue
        try:
            return payload.decode(label, "replace")
        except LookupError:  # unknown codec label in the wild
            continue
    return payload.decode("utf-8", "replace")


def _sniff_meta_charset(payload: bytes) -> str | None:
    m = _META_CHARSET.search(payload[:2048])
    return m.group(1).decode("ascii", "replace") if m else None


def _charset_from_content_type(ct: str | None) -> str | None:
    """``text/html; charset=ISO-8859-1`` → ``ISO-8859-1``."""
    if not ct or "charset=" not in ct:
        return None
    return ct.split("charset=", 1)[1].split(";")[0].strip().strip("\"'") or None


def extract_html_text(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    content_type_col: str | None = None,
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """(id, html) → (id, text, title, n_links, link_text_chars,
    text_chars, link_density) via one Arrow-batched ``mapInPandas``.
    ``html_col`` may be string or binary; binary payloads go through
    :func:`decode_html` (BOM → transport charset → ``<meta charset>``
    prescan → UTF-8, always ``errors="replace"``). Pass
    ``content_type_col`` (e.g. the WARC source's ``content_type``) so
    the HTTP-declared charset participates in that order.
    ``passthrough`` carries input columns (url, date, ...) through the
    batch unchanged, so callers never join extraction output back to
    its own input — that join's two branches would each recompute the
    upstream (for a WARC input: parse the whole crawl twice)."""
    import pandas as pd

    pt = [c for c in passthrough if c not in (id_col,)]
    pt_schema = "".join(
        f", {c} {df.schema[c].dataType.simpleString()}" for c in pt
    )
    # id keeps ITS dtype — hardcoding `long` would Arrow-fail a string
    # id (e.g. the WARC source's record_id)
    id_type = df.schema[id_col].dataType.simpleString()
    schema = f"{id_col} {id_type}, {_OUT_FIELDS}{pt_schema}"
    cols = [id_col, html_col]
    if content_type_col:
        cols.append(content_type_col)
    cols += [c for c in pt if c not in cols]

    def _run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            cts = (
                pdf[content_type_col]
                if content_type_col
                else [None] * len(pdf)
            )
            out = []
            for row_i, (i, h, ct) in enumerate(
                zip(pdf[id_col], pdf[html_col], cts)
            ):
                if isinstance(h, (bytes, bytearray)):
                    h = decode_html(bytes(h), _charset_from_content_type(ct))
                rec = {id_col: i, **extract_text(h)}
                for c in pt:
                    rec[c] = pdf[c].iloc[row_i]
                out.append(rec)
            yield pd.DataFrame(
                out,
                columns=[
                    id_col, "text", "title", "n_links",
                    "link_text_chars", "text_chars", *pt,
                ],
            )

    extracted = df.select(*cols).mapInPandas(_run, schema)
    return extracted.withColumn("link_density", link_density_col())


def link_density_col() -> Column:
    """The boilerplate signal, quantized like every oracled ratio."""
    from ..functions.rounding import quantize

    raw = F.col("link_text_chars").cast("double") / F.greatest(
        F.col("text_chars"), F.lit(1)
    ).cast("double")
    return quantize(raw, 4)
