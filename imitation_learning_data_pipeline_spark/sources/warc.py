"""WARC (Web ARChive) source — Common Crawl-shaped web ingestion.

The reference pipeline never ingested web corpora, but a 100 TB LLM
data pipeline starts from one: Common Crawl ships WARC/1.0 files
(ISO 28500, public spec) of gzip-compressed records — each record its
own gzip MEMBER, so a crawl file is a concatenation of small gzip
streams. That framing is exactly what makes the format
Spark-splittable at the FILE level and stdlib-parsable here:

- discovery + bytes come from Spark's ``binaryFile`` source (one row
  per .warc.gz — the same listing-free pattern as
  ``pipeline/discover.py``), so the driver never lists or reads files;
- each task decodes ITS files with :mod:`gzip` (which transparently
  consumes concatenated members) and a pure-stdlib WARC header parser
  inside one Arrow-batched ``mapInPandas`` — no external warcio
  dependency, nothing row-at-a-time over record payloads;
- parallelism is per-FILE (a .gz stream is not seekable mid-member):
  the standard Common Crawl layout is ~1 GB × 64k files per crawl, so
  a 1000-executor cluster is saturated by file count, not intra-file
  splits. The PARSER is incremental (peak one record), but
  ``binaryFile`` materializes each file's bytes in its task row —
  budget one compressed file per task core (~1 GB; Common Crawl's
  actual sizing). A deployment needing sub-file streaming would swap
  the binaryFile leaf for a custom datasource feeding the SAME
  ``parse_warc_stream`` — the parser already takes any byte stream.

Records surface as (warc_file, record_offset, warc_type, record_id,
target_uri, warc_date, content_type, http_status, payload binary).
HTTP response records are unwrapped: ``payload`` is the HTTP BODY
(the HTML), with the status line parsed into ``http_status``. Pair
with :mod:`..operators.html_text` for text extraction.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

WARC_SCHEMA = (
    "warc_file string, record_offset long, warc_type string, "
    "record_id string, target_uri string, warc_date string, "
    "content_type string, http_status int, payload binary"
)


class WarcFormatError(ValueError):
    """Malformed WARC framing — raised, never silently skipped: a
    mid-file parse failure means truncated/corrupt crawl data, and a
    dedup/extraction pass over silently-halved input is worse than a
    loud task failure."""


def _parse_headers(block: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    for line in block.split(b"\r\n"):
        if not line or b":" not in line:
            continue
        k, _, v = line.partition(b":")
        headers[k.strip().lower().decode("latin-1")] = v.strip().decode(
            "latin-1", "replace"
        )
    return headers


def _dechunk(body: bytes) -> bytes:
    """Decode HTTP/1.1 chunked transfer framing (hex-size CRLF lines).
    Raises ValueError on malformed framing — caller decides posture."""
    out, pos = [], 0
    while True:
        nl = body.find(b"\r\n", pos)
        if nl < 0:
            raise ValueError("chunked body: missing size line")
        size = int(body[pos:nl].split(b";")[0].strip() or b"0", 16)
        pos = nl + 2
        if size == 0:
            return b"".join(out)
        chunk = body[pos : pos + size]
        if len(chunk) != size:
            raise ValueError("chunked body: truncated chunk")
        out.append(chunk)
        pos += size + 2  # trailing CRLF


def _decode_http_body(body: bytes, headers: dict[str, str]) -> bytes:
    """Undo transfer/content codings the crawler recorded verbatim
    (real crawls carry both): chunked framing first, then
    gzip/x-gzip/deflate. A body whose declared coding fails to decode
    is kept RAW — the header may simply be wrong (common in the wild);
    mojibake flows to the downstream quality gates, which exist to
    score it out, while raising would kill the whole task over one
    mislabeled page. (Framing errors at the WARC layer still refuse —
    that contract is unchanged.)"""
    te = headers.get("transfer-encoding", "").lower()
    if "chunked" in te:
        try:
            body = _dechunk(body)
        except ValueError:
            return body
    ce = headers.get("content-encoding", "").lower().strip()
    if ce in ("gzip", "x-gzip"):
        import gzip as _gz

        try:
            return _gz.decompress(body)
        except OSError:
            return body
    if ce == "deflate":
        import zlib

        for wbits in (zlib.MAX_WBITS, -zlib.MAX_WBITS):  # zlib + raw forms
            try:
                return zlib.decompress(body, wbits)
            except zlib.error:
                continue
        return body
    return body


def parse_warc_stream(stream, warc_file: str) -> Iterator[dict]:
    """Incremental WARC/1.0 record iterator over a DECOMPRESSED byte
    stream (pass a ``gzip.GzipFile`` for .warc.gz — stdlib gzip
    consumes concatenated members transparently). Yields one dict per
    record; peak memory is one record."""
    offset = 0
    while True:
        magic = stream.readline()
        if not magic:
            return
        if magic.strip() == b"":  # inter-record CRLF padding
            offset += len(magic)
            continue
        if not magic.startswith(b"WARC/"):
            raise WarcFormatError(
                f"{warc_file}: expected WARC/1.x version line at "
                f"~offset {offset}, got {magic[:40]!r}"
            )
        header_lines = []
        consumed = len(magic)
        while True:
            line = stream.readline()
            if not line:
                raise WarcFormatError(
                    f"{warc_file}: EOF inside record headers at ~offset {offset}"
                )
            consumed += len(line)
            if line in (b"\r\n", b"\n"):
                break
            header_lines.append(line.rstrip(b"\r\n"))
        headers = _parse_headers(b"\r\n".join(header_lines))
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError) as exc:
            raise WarcFormatError(
                f"{warc_file}: record at ~offset {offset} has no valid "
                "Content-Length"
            ) from exc
        block = stream.read(length)
        if len(block) != length:
            raise WarcFormatError(
                f"{warc_file}: truncated record at ~offset {offset} "
                f"(wanted {length} payload bytes, got {len(block)})"
            )
        consumed += length
        warc_type = headers.get("warc-type", "")
        content_type = headers.get("content-type", "")
        http_status = None
        payload = block
        # unwrap HTTP response/request framing: the WARC block is the
        # full HTTP message; body starts after the first blank line
        if content_type.startswith("application/http"):
            sep = block.find(b"\r\n\r\n")
            if sep >= 0:
                status_line = block[: block.find(b"\r\n")]
                parts = status_line.split()
                if len(parts) >= 2 and parts[0].startswith(b"HTTP/"):
                    try:
                        http_status = int(parts[1])
                    except ValueError:
                        http_status = None
                http_headers = _parse_headers(block[:sep])
                content_type = http_headers.get("content-type", content_type)
                payload = _decode_http_body(block[sep + 4 :], http_headers)
        yield {
            "warc_file": warc_file,
            "record_offset": offset,
            "warc_type": warc_type,
            "record_id": headers.get("warc-record-id", ""),
            "target_uri": headers.get("warc-target-uri", ""),
            "warc_date": headers.get("warc-date", ""),
            "content_type": content_type,
            "http_status": http_status,
            "payload": payload,
        }
        offset += consumed


def read_warc(
    spark: SparkSession,
    path_glob: str,
    record_types: tuple[str, ...] = ("response",),
) -> DataFrame:
    """WARC records as a DataFrame — one row per record of the given
    ``record_types`` (Common Crawl convention: ``response`` carries the
    HTML; ``request``/``metadata``/``warcinfo`` exist alongside).

    Plan shape: ``binaryFile`` scan (PATH + LENGTH pruned — content is
    only materialized inside the task) → one Arrow-batched
    ``mapInPandas`` parsing each task's files. No shuffle; downstream
    filters on (content_type, http_status) stay in the same stage.
    """
    import pandas as pd

    wanted = set(record_types)

    def _parse(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import gzip
        import io

        for pdf in batches:
            for path, content in zip(pdf["path"], pdf["content"]):
                raw = io.BytesIO(bytes(content))
                stream = (
                    gzip.GzipFile(fileobj=raw)
                    if str(path).endswith(".gz")
                    else raw
                )
                rows = [
                    r
                    for r in parse_warc_stream(stream, str(path))
                    if r["warc_type"] in wanted
                ]
                if rows:
                    yield pd.DataFrame(rows)

    binary = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc*")
        .load(path_glob)
        .select("path", "content")
    )
    return binary.mapInPandas(_parse, WARC_SCHEMA)
