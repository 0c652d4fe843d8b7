"""Optimization-round 15 equivalence pins.

Every optimization that restructures an operator's internals gets a
row-identity test against the prior (staged) shape here — the staged
plan IS the oracle, exactly like the Bloom-vs-broadcast twin in
plans/dedup.py. Performance claims live in OPTIMIZATION_r15.md; this
file only proves the outputs did not move.
"""

from __future__ import annotations

import gzip
import io

import pytest

from imitation_learning_data_pipeline_spark.sources.warc import (
    parse_warc_stream,
)


def _record(
    rec_type: str = "response",
    uri: str = "http://t.example/a",
    body: bytes = b"<html><p>hi</p></html>",
    http_headers: bytes = b"Content-Type: text/html\r\n",
    status: bytes = b"200 OK",
    http: bool = True,
) -> bytes:
    if http:
        block = b"HTTP/1.1 " + status + b"\r\n" + http_headers + b"\r\n" + body
        ct = "application/http; msgtype=response"
    else:
        block = body
        ct = "text/plain"
    return (
        f"WARC/1.0\r\n"
        f"WARC-Type: {rec_type}\r\n"
        f"WARC-Record-ID: <urn:x:1>\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        f"Content-Type: {ct}\r\n"
        f"Content-Length: {len(block)}\r\n\r\n"
    ).encode() + block + b"\r\n\r\n"


class TestHeadersOnlyParse:
    """parse_warc_stream(with_payload=False) — the decide-first
    metadata pass — must agree with the full parse on every
    header-derived field, including the coding-dependent
    undecoded_coding flag."""

    def _both(self, raw: bytes) -> tuple[list[dict], list[dict]]:
        full = list(parse_warc_stream(io.BytesIO(raw), "f"))
        meta = list(
            parse_warc_stream(io.BytesIO(raw), "f", with_payload=False)
        )
        return full, meta

    def test_fields_match_and_payload_skipped(self):
        raw = _record() + _record(uri="http://t.example/b", status=b"404 Not Found")
        full, meta = self._both(raw)
        assert len(full) == len(meta) == 2
        for f, m in zip(full, meta):
            assert m["payload"] == b""
            assert f["payload"] != b""
            for k in f:
                if k != "payload":
                    assert f[k] == m[k], k

    def test_coded_bodies_flag_identically(self):
        # gzip (decodes → unflagged), br (known-undecodable → flagged),
        # mislabeled gzip (fails → unflagged): the flag logic must run
        # even in metadata mode because it is filter input downstream.
        cases = [
            (gzip.compress(b"x"), b"Content-Encoding: gzip\r\n"),
            (b"\x00br-bytes", b"Content-Encoding: br\r\n"),
            (b"not-gzip", b"Content-Encoding: gzip\r\n"),
            (b"plain", b""),
        ]
        raw = b"".join(
            _record(
                body=body,
                http_headers=b"Content-Type: text/html\r\n" + enc,
            )
            for body, enc in cases
        )
        full, meta = self._both(raw)
        assert [r["undecoded_coding"] for r in full] == [
            r["undecoded_coding"] for r in meta
        ] == [None, "br", None, None]

    def test_conversion_record_payload_skipped(self):
        raw = _record(rec_type="conversion", body=b"text body", http=False)
        full, meta = self._both(raw)
        assert full[0]["payload"] == b"text body"
        assert meta[0]["payload"] == b""
        assert full[0]["content_type"] == meta[0]["content_type"] == "text/plain"


class TestDecideFirstIngest:
    """ingest_warc_plan's decide-first form (optimization r15) must be
    row-identical to the staged shape it replaced — both modes, both
    URL-normalization settings, and the forced-fused WET arm."""

    @pytest.mark.parametrize("wet", [False, True])
    @pytest.mark.parametrize("normalize", [False, True])
    def test_row_identity_vs_staged(self, spark, tmp_path, wet, normalize):
        from imitation_learning_data_pipeline_spark.plans.web import (
            build_warc_corpus,
            ingest_warc_plan,
        )

        corpus = build_warc_corpus(
            "/root/testdata/sf0.001",
            out_root=str(tmp_path / "c"),
            kind="conversion" if wet else "response",
        )
        kw = dict(dedup_url=True, normalize_urls=normalize, wet=wet)
        staged = ingest_warc_plan(spark, corpus, decide_first=False, **kw)
        decided = ingest_warc_plan(spark, corpus, decide_first=True, **kw)
        assert staged.columns == decided.columns
        # nullability may tighten (decided doc_id is provably non-null —
        # xxhash64 over mapInPandas-schema'd inputs); names+types pin
        assert [(f.name, f.dataType) for f in staged.schema.fields] == [
            (f.name, f.dataType) for f in decided.schema.fields
        ]
        a = sorted(map(tuple, staged.collect()))
        b = sorted(map(tuple, decided.collect()))
        assert a == b

    def test_wet_auto_stays_staged_html_auto_decides(self, spark, tmp_path):
        """Auto mode: HTML ingest takes the zero-exchange decide-first
        plan (extraction dominates → winner-only pays off); WET keeps
        the staged shape (its extraction is a JVM decode — a second
        parse pass costs more than the text shuffle it saves)."""
        from imitation_learning_data_pipeline_spark.plans.web import (
            build_warc_corpus,
            ingest_warc_plan,
        )

        html_corpus = build_warc_corpus(
            "/root/testdata/sf0.001", out_root=str(tmp_path / "h")
        )
        wet_corpus = build_warc_corpus(
            "/root/testdata/sf0.001",
            out_root=str(tmp_path / "w"),
            kind="conversion",
        )
        html_plan = ingest_warc_plan(spark, html_corpus, dedup_url=True)
        wet_plan = ingest_warc_plan(spark, wet_corpus, dedup_url=True, wet=True)
        html_phys = html_plan._jdf.queryExecution().executedPlan().toString()
        wet_phys = wet_plan._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in html_phys
        assert "Exchange" in wet_phys  # staged URL-dedup aggregate

    def test_decide_first_refuses_extraction_gates(self, spark, tmp_path):
        from imitation_learning_data_pipeline_spark.plans.web import (
            build_warc_corpus,
            ingest_warc_plan,
        )

        corpus = build_warc_corpus(
            "/root/testdata/sf0.001", out_root=str(tmp_path / "c")
        )
        with pytest.raises(ValueError, match="decide_first"):
            ingest_warc_plan(
                spark, corpus, dedup_url=True, max_link_density=0.5,
                decide_first=True,
            )
        with pytest.raises(ValueError, match="decide_first"):
            ingest_warc_plan(
                spark, corpus, dedup_url=False, decide_first=True
            )
