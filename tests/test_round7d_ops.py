"""Round-7d: Gopher quality-rule filter (plans/text.py::gopher_rules).

Coverage: each published rule trips on a purpose-built document while a
clean document passes all seven; the plan is a pure projection (no
Exchange); the contract threshold override stays discriminative.
"""

from __future__ import annotations

from imitation_learning_data_pipeline_spark.plans.text import gopher_rules

GOOD = (
    "The project has a set of tools to work with and the results have "
    "been good because the team chose to work with care and that focus "
    "paid off over time for all of the people involved in it today. "
) * 3  # ~90 words, stopword-rich, clean prose


def _frame(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _one(df):
    rows = df.collect()
    assert len(rows) == 1
    return rows[0].asDict()


class TestGopherRules:
    def test_clean_doc_passes_all_rules(self, spark):
        r = _one(gopher_rules(_frame(spark, [(1, GOOD)])))
        for k, v in r.items():
            if k.startswith("r_") or k == "keep":
                assert v is True, f"{k} unexpectedly failed: {r}"

    def test_short_doc_fails_word_count_only(self, spark):
        r = _one(gopher_rules(_frame(spark, [(1, "the and to be that have with of short")])))
        assert r["r_word_count"] is False and r["keep"] is False
        assert r["r_stopwords"] is True and r["r_alpha_words"] is True

    def test_symbol_ratio_rule(self, spark):
        # >10% of words' worth of # symbols
        text = GOOD + " " + "#" * 30
        r = _one(gopher_rules(_frame(spark, [(1, text)])))
        assert r["r_symbol_ratio"] is False
        assert r["symbol_word_ratio"] > 0.1

    def test_ellipsis_counts_in_symbol_ratio(self, spark):
        text = GOOD + " " + "... " * 30
        r = _one(gopher_rules(_frame(spark, [(1, text)])))
        assert r["r_symbol_ratio"] is False

    def test_bullet_lines_rule(self, spark):
        lines = ["- item %d" % i for i in range(20)] + [GOOD]
        r = _one(gopher_rules(_frame(spark, [(1, "\n".join(lines))])))
        assert r["r_bullet_lines"] is False
        assert r["bullet_line_frac"] > 0.9

    def test_ellipsis_lines_rule(self, spark):
        lines = ["this line trails off..." for _ in range(10)] + [GOOD]
        r = _one(gopher_rules(_frame(spark, [(1, "\n".join(lines))])))
        assert r["r_ellipsis_lines"] is False

    def test_alpha_words_rule(self, spark):
        text = GOOD + " " + " ".join(str(i) for i in range(200))
        r = _one(gopher_rules(_frame(spark, [(1, text)])))
        assert r["r_alpha_words"] is False
        assert r["alpha_word_frac"] < 0.8

    def test_mean_word_len_rule(self, spark):
        text = " ".join(["pneumonoultramicroscopic"] * 60)
        r = _one(gopher_rules(_frame(spark, [(1, text)])))
        assert r["r_mean_word_len"] is False

    def test_stopword_threshold_default_vs_override(self, spark):
        # exactly one required stopword present
        text = " ".join(["data"] * 60) + " the"
        df = _frame(spark, [(1, text)])
        assert _one(gopher_rules(df))["r_stopwords"] is False  # ≥2 default
        assert (
            _one(gopher_rules(df, min_required_stopwords=1))["r_stopwords"]
            is True
        )

    def test_empty_text_is_all_zero_not_null(self, spark):
        r = _one(gopher_rules(_frame(spark, [(1, "")])))
        assert r["n_words"] == 0
        assert r["mean_word_len"] == 0.0
        assert r["keep"] is False

    def test_plan_is_pure_projection(self, spark):
        df = gopher_rules(_frame(spark, [(1, GOOD), (2, "x")]))
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
