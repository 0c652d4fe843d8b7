"""Optimization-round 16 equivalence pins.

Same discipline as tests/test_opt_r15.py: every optimization that
restructures an operator's internals gets a row-identity test against
the prior shape — the staged plan IS the oracle. Performance claims
live in OPTIMIZATION_r16.md; this file only proves outputs did not
move.
"""

from __future__ import annotations

import json
import os

import pytest


class TestIndexedIngest:
    """ingest_warc_plan's index-planned form (optimization r16) must be
    row-identical to the staged shape — both modes, both
    URL-normalization settings — including doc ids (the generator's
    rec_offset field exists exactly for that parity)."""

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
            index=True,
        )
        kw = dict(dedup_url=True, normalize_urls=normalize, wet=wet)
        staged = ingest_warc_plan(spark, corpus, decide_first=False, **kw)
        indexed = ingest_warc_plan(spark, corpus, **kw)  # auto → indexed
        # prove auto mode actually took the index plan: the leaf is the
        # index TEXT scan (value:string), not the whole-file binaryFile
        # scan (path/content) — plan strings truncate paths, so match
        # on the read schema
        phys = indexed._jdf.queryExecution().executedPlan().toString()
        assert "value:string" in phys
        assert "content:binary" not in phys
        assert staged.columns == indexed.columns
        assert [(f.name, f.dataType) for f in staged.schema.fields] == [
            (f.name, f.dataType) for f in indexed.schema.fields
        ]
        a = sorted(map(tuple, staged.collect()))
        b = sorted(map(tuple, indexed.collect()))
        assert a == b

    def test_auto_without_index_keeps_r15_shapes(self, spark, tmp_path):
        """No index → auto mode behaves exactly as r15 pinned it:
        HTML decides first (zero exchanges), WET stays staged."""
        from imitation_learning_data_pipeline_spark.plans.web import (
            build_warc_corpus,
            ingest_warc_plan,
        )

        html_corpus = build_warc_corpus(
            "/root/testdata/sf0.001", out_root=str(tmp_path / "h")
        )
        plan = ingest_warc_plan(spark, html_corpus, dedup_url=True)
        phys = plan._jdf.queryExecution().executedPlan().toString()
        assert "index.cdxj" not in phys
        assert "Exchange" not in phys

    def test_usable_index_requires_rec_offset(self, tmp_path):
        from imitation_learning_data_pipeline_spark.plans.web import (
            _usable_index,
        )

        d = tmp_path / "noidx"
        d.mkdir()
        assert _usable_index(str(d)) is None
        # a standard CDXJ line (no rec_offset) must NOT engage the
        # doc-id-parity path
        payload = {
            "url": "http://t.example/a",
            "mime": "text/html",
            "status": "200",
            "length": "10",
            "offset": "0",
            "filename": str(d / "seg0000.warc.gz"),
        }
        (d / "index.cdxj").write_text(
            f"example,t)/a 20260101000000 {json.dumps(payload)}\n"
        )
        assert _usable_index(str(d)) is None
        payload["rec_offset"] = "0"
        (d / "index.cdxj").write_text(
            f"example,t)/a 20260101000000 {json.dumps(payload)}\n"
        )
        assert _usable_index(str(d)) is not None
        # a NARROWING glob must not engage the whole-directory index —
        # the indexed plan would ingest records the glob excludes
        assert _usable_index(os.path.join(str(d), "*.warc.gz")) is None
        assert _usable_index(os.path.join(str(d), "seg000*.warc.gz")) is None

    def test_verify_generator_matches_inline_filter(self, spark):
        """_verify_jaccard's explode(when(...)) threshold (r16) must be
        row- and schema-identical to the pre-r15 inline-filter shape —
        the generator is ONLY a pushdown barrier (one array_intersect
        per candidate in the executed plan), never a semantics change."""
        from pyspark.sql import functions as F

        from imitation_learning_data_pipeline_spark.functions.rounding import (
            quantize,
        )
        from imitation_learning_data_pipeline_spark.plans.dedup import (
            _BUCKET_CAP,
            _bucket_pairs,
            _corpus,
            _minhash_band_rows,
            _minhash_sig_plan,
            _verify_jaccard,
        )

        sigs = _minhash_sig_plan(_corpus(spark, "/root/testdata/sf0.001"))
        sigs = sigs.persist()
        try:
            sets = sigs.select("doc_id", "sh")
            cand = _bucket_pairs(
                _minhash_band_rows(sigs), ["band", "bucket"], _BUCKET_CAP
            )
            got = _verify_jaccard(cand, sets, 0.5)
            inter = F.size(
                F.array_intersect(F.col("x.sh"), F.col("y.sh"))
            ).cast("double")
            union = (
                F.size(F.col("x.sh"))
                + F.size(F.col("y.sh"))
                - F.size(F.array_intersect(F.col("x.sh"), F.col("y.sh")))
            )
            jac = inter / union
            want = (
                cand.join(sets.alias("x"), F.col("doc_a") == F.col("x.doc_id"))
                .join(sets.alias("y"), F.col("doc_b") == F.col("y.doc_id"))
                .filter(jac >= 0.5)
                .select("doc_a", "doc_b", quantize(jac, 4).alias("jaccard"))
            )
            assert got.dtypes == want.dtypes
            a = sorted(map(tuple, got.collect()))
            b = sorted(map(tuple, want.collect()))
            assert a == b and len(a) > 0
            # the barrier property itself: one array_intersect in the
            # executed plan (the filter shape evaluates it 3-4 times);
            # AQE's string repeats the plan under "== Initial Plan =="
            # — count the final section only
            phys = (
                got._jdf.queryExecution().executedPlan().toString()
                .split("== Initial Plan ==")[0]
            )
            assert phys.count("array_intersect") == 1
        finally:
            sigs.unpersist()

    def test_index_plan_is_lazy(self, spark, tmp_path):
        """Building (not executing) the indexed plan must run ZERO
        Spark jobs — the ADVICE r15 build-time-action complaint does
        not apply to this shape."""
        from imitation_learning_data_pipeline_spark.plans.web import (
            build_warc_corpus,
            ingest_warc_plan,
        )

        corpus = build_warc_corpus(
            "/root/testdata/sf0.001", out_root=str(tmp_path / "c"),
            index=True,
        )
        sc = spark.sparkContext
        store = sc._jsc.sc().statusStore()
        before = store.jobsList(None).size()
        ingest_warc_plan(spark, corpus, dedup_url=True)
        after = store.jobsList(None).size()
        assert after == before
