"""Round-3 operator tests: repetition stats, corpus top-k n-grams, the
banded range join, and int8-quantized ANN — semantic invariants beyond
the oracle contract (which already checks cross-engine equality)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


class TestRepetitionStats:
    def test_fractions_bounded_and_consistent(self, spark):
        from imitation_learning_data_pipeline_spark.plans.text import (
            text_repetition_stats,
        )

        rows = text_repetition_stats(spark, SF_DIR).collect()
        assert len(rows) > 0
        for r in rows:
            assert 0.0 <= r.word_rep_frac <= 1.0
            assert 0.0 <= r.top_2gram_frac <= 1.0
            assert 0.0 <= r.dup_3gram_frac <= 1.0
            assert r.n_words >= 1

    def test_planted_repetition_scores_high(self, spark):
        """A doc that is one phrase repeated must score ≈1 on every
        repetition signal; a doc of all-distinct words must score 0 on
        word_rep_frac."""
        from imitation_learning_data_pipeline_spark.plans import text as t

        docs = spark.createDataFrame(
            [
                (1, "spam ham " * 50),
                (2, " ".join(f"w{i}" for i in range(100))),
            ],
            "doc_id long, text string",
        )
        orig = t._docs
        t._docs = lambda s, d: docs
        try:
            out = {r.doc_id: r for r in t.text_repetition_stats(spark, SF_DIR).collect()}
        finally:
            t._docs = orig
        assert out[1].word_rep_frac > 0.95
        assert out[1].top_2gram_frac > 0.45  # "spam ham"/"ham spam" split the mass
        assert out[1].dup_3gram_frac > 0.95
        assert out[2].word_rep_frac == 0.0
        assert out[2].dup_3gram_frac == 0.0


class TestTopkNgrams:
    def test_rank_ordering_and_count(self, spark):
        from imitation_learning_data_pipeline_spark.plans.text import text_topk_ngrams

        rows = text_topk_ngrams(spark, SF_DIR).orderBy("rank").collect()
        assert len(rows) == 20
        assert [r.rank for r in rows] == list(range(1, 21))
        counts = [r.n_occurrences for r in rows]
        assert counts == sorted(counts, reverse=True)
        # ties must be broken by gram ascending
        for a, b in zip(rows, rows[1:]):
            if a.n_occurrences == b.n_occurrences:
                assert a.gram < b.gram


class TestRangeJoin:
    def test_matches_window_semantics_exactly(self, spark):
        """The banded equi-join must agree with a direct per-click scan
        computed driver-side on a small sample."""
        from imitation_learning_data_pipeline_spark.plans.temporal import (
            _RANGE_US,
            range_join_prior_views,
        )
        from imitation_learning_data_pipeline_spark.sources import load_table

        got = {
            r.event_id: r.n_prior_views
            for r in range_join_prior_views(spark, SF_DIR).collect()
        }
        ev = load_table(spark, SF_DIR, "events").select(
            "event_id", "user_id", "event_type", F.unix_micros("ts").alias("us")
        ).collect()
        views = {}
        for r in ev:
            if r.event_type == "view":
                views.setdefault(r.user_id, []).append(r.us)
        expected = {}
        for r in ev:
            if r.event_type == "click":
                vs = views.get(r.user_id, [])
                expected[r.event_id] = sum(
                    1 for v in vs if r.us - _RANGE_US < v <= r.us
                )
        assert got == expected

    def test_zero_count_clicks_retained(self, spark):
        from imitation_learning_data_pipeline_spark.plans.temporal import (
            range_join_prior_views,
        )

        rows = range_join_prior_views(spark, SF_DIR).collect()
        assert any(r.n_prior_views == 0 for r in rows)

    def test_no_cartesian_in_plan(self, spark):
        from imitation_learning_data_pipeline_spark.plans.temporal import (
            range_join_prior_views,
        )

        plan = range_join_prior_views(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestInt8Ann:
    def test_quantization_error_bound(self):
        from imitation_learning_data_pipeline_spark.plans.similarity import (
            _quantize_i8,
        )

        rng = np.random.RandomState(7)
        mat = rng.randn(32, 64)
        q = _quantize_i8(mat)
        scale = np.abs(mat).max(axis=1, keepdims=True) / 127.0
        assert np.abs(q).max() <= 127
        assert np.abs(q * scale - mat).max() <= scale.max() / 2 + 1e-12

    def test_recall_vs_float_bruteforce(self, spark):
        """int8 quantization is near-lossless for top-k retrieval: per
        query, ≥7 of the float-cosine top-10 must appear in the int8
        top-10. (Dot-product vs cosine ranking agree here because the
        synthetic embeddings have near-uniform norms.)"""
        from imitation_learning_data_pipeline_spark.plans.similarity import (
            ann_bruteforce_topk,
            ann_int8_topk,
        )

        f_top = {}
        for r in ann_bruteforce_topk(spark, SF_DIR).collect():
            f_top.setdefault(r.qid, set()).add(r.vec_id)
        q_top = {}
        for r in ann_int8_topk(spark, SF_DIR).collect():
            q_top.setdefault(r.qid, set()).add(r.vec_id)
        assert set(f_top) == set(q_top)
        for qid in f_top:
            assert len(f_top[qid] & q_top[qid]) >= 7, qid

    def test_scores_are_exact_integers(self, spark):
        from imitation_learning_data_pipeline_spark.plans.similarity import (
            ann_int8_topk,
        )

        df = ann_int8_topk(spark, SF_DIR)
        assert dict(df.dtypes)["dot_q"] == "bigint"
        assert df.count() == 80
