"""Round-4 operators: decontamination probe overlap + deterministic
sampling. Invariants beyond the DuckDB oracle (which checks exact
values): semantic properties that must hold at any scale factor."""

from __future__ import annotations

from conftest import SF_DIR


class TestDecontamProbeOverlap:
    def test_planted_probe_copies_are_flagged(self, spark):
        """Every planted corpus copy of a probe document shares (nearly)
        all its shingles with the probe set, so it MUST be flagged."""
        from pyspark.sql import functions as F

        from imitation_learning_data_pipeline_spark.functions.text import clean_words
        from imitation_learning_data_pipeline_spark.plans.dedup import (
            _DECONTAM_N,
            _PROBE_MOD,
            _PROBE_REM,
            decontam_probe_overlap,
        )
        from imitation_learning_data_pipeline_spark.sources import load_table

        docs = load_table(spark, SF_DIR, "documents")
        # a probe doc shorter than the shingle width has no shingles at
        # all — its planted copy can't be flagged by construction, so it
        # is excluded from the expectation (mirrors the operator's
        # n-gram width requirement).
        probe_ids = {
            r.doc_id
            for r in docs.select(
                "doc_id", F.size(clean_words("text")).alias("nw")
            ).collect()
            if r.doc_id % _PROBE_MOD == _PROBE_REM and r.nw >= _DECONTAM_N
        }
        # planted copies exist for doc_id % 10 in {0, 5} (plans/dedup._corpus)
        expected_hits = {pid + 1000000 for pid in probe_ids if pid % 10 == 0} | {
            pid + 2000000 for pid in probe_ids if pid % 10 == 5
        }
        out = decontam_probe_overlap(spark, SF_DIR).collect()
        flagged = {r.doc_id for r in out}
        assert expected_hits, "fixture must plant at least one probe copy"
        assert expected_hits <= flagged
        assert all(r.n_overlap >= 1 for r in out)
        # probe documents themselves are never in the candidate side
        assert not (flagged & probe_ids)

    def test_probe_side_is_broadcast(self, spark):
        """The probe shingle set must reach the corpus join as a
        broadcast — the property that keeps the corpus shuffle-free."""
        from imitation_learning_data_pipeline_spark.plans.dedup import (
            decontam_probe_overlap,
        )

        plan = decontam_probe_overlap(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan


class TestDeterministicSampling:
    def test_stratified_caps_and_keeps(self, spark):
        from imitation_learning_data_pipeline_spark.plans.sampling import (
            _STRAT_CAP,
            sample_stratified_docs,
        )
        from imitation_learning_data_pipeline_spark.sources import load_table

        totals = {
            r.lang: r.n
            for r in load_table(spark, SF_DIR, "documents")
            .groupBy("lang")
            .count()
            .withColumnRenamed("count", "n")
            .collect()
        }
        out = sample_stratified_docs(spark, SF_DIR).collect()
        by_lang: dict[str, int] = {}
        for r in out:
            by_lang[r.lang] = by_lang.get(r.lang, 0) + 1
        for lang, n_l in totals.items():
            if n_l <= _STRAT_CAP:
                # under-represented strata are kept whole
                assert by_lang.get(lang, 0) == n_l
            else:
                # expected cap docs; allow binomial slack, require a real cut
                assert 0 < by_lang[lang] < n_l

    def test_stratified_is_stable_across_runs(self, spark):
        from imitation_learning_data_pipeline_spark.plans.sampling import (
            sample_stratified_docs,
        )

        a = {r.doc_id for r in sample_stratified_docs(spark, SF_DIR).collect()}
        b = {r.doc_id for r in sample_stratified_docs(spark, SF_DIR).collect()}
        assert a == b

    def test_mixture_acceptance_semantics(self, spark):
        from imitation_learning_data_pipeline_spark.plans.sampling import (
            sample_mixture_sources,
        )

        rows = sample_mixture_sources(spark, SF_DIR).collect()
        assert rows
        total = sum(r.n_total for r in rows)
        k = len(rows)
        target = total / k
        for r in rows:
            assert 0 <= r.n_sampled <= r.n_total
            assert 0 < r.accept_milli <= 1000
            if r.n_total <= target:
                # small sources are kept whole
                assert r.accept_milli == 1000
                assert r.n_sampled == r.n_total


class TestDedupClusterComponents:
    def test_cluster_invariants(self, spark):
        from imitation_learning_data_pipeline_spark.plans.dedup import (
            dedup_cluster_components,
            dedup_minhash_lsh,
        )

        pairs = [
            (r.doc_a, r.doc_b)
            for r in dedup_minhash_lsh(spark, SF_DIR).collect()
        ]
        out = dedup_cluster_components(spark, SF_DIR).collect()
        cluster = {r.doc_id: r.cluster_id for r in out}
        size = {r.doc_id: r.cluster_size for r in out}
        # 1. every similar pair landed in the same component
        for a, b in pairs:
            assert cluster[a] == cluster[b]
        # 2. the cluster id is the smallest member (canonical doc)
        members: dict[int, list[int]] = {}
        for doc, cid in cluster.items():
            members.setdefault(cid, []).append(doc)
        for cid, docs in members.items():
            assert cid == min(docs)
            # 3. every member reports the true component size
            assert all(size[d] == len(docs) for d in docs)
        # 4. only docs with at least one pair appear (no singletons)
        paired = {d for ab in pairs for d in ab}
        assert set(cluster) == paired
