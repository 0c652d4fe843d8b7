"""Round-11 session-2 operators: fuzzy MinHash decontamination,
k-anonymity privacy audit, deterministic HLL sketches, DoReMi-style
domain reweighting."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

DOC_A = "the quick brown fox jumps over the lazy dog near the river bank today"
DOC_B = "colorless green ideas sleep furiously while syntax dreams of deep structure"
DOC_C = "a completely different document about spark shuffles and partition pruning"


class TestDecontamFuzzy:
    def _mk(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_exact_copy_found_at_jaccard_one(self, spark):
        """A normalized-identical copy has identical minhash signatures
        (every band collides), so recall is GUARANTEED, not
        probabilistic."""
        from imitation_learning_data_pipeline_spark.plans.dedup import decontam_fuzzy

        probe = self._mk(spark, [(1, DOC_A)])
        docs = self._mk(spark, [(100, DOC_A.upper() + " !!!"), (101, DOC_B)])
        out = decontam_fuzzy(docs, probe).collect()
        assert [(r.doc_id, r.probe_id, r.jaccard) for r in out] == [(100, 1, 1.0)]

    def test_near_copy_found_above_threshold(self, spark):
        """A long doc with a short appended tail (j≈0.87 — recall
        P≈0.99 on the LSH curve; this planted pair deterministically
        collides under the fixed hash family) is reported with its
        exact quantized Jaccard; an unrelated doc is not."""
        from imitation_learning_data_pipeline_spark.plans.dedup import decontam_fuzzy

        base = " ".join(f"word{i} token{i} item{i}" for i in range(12))
        probe = self._mk(spark, [(1, base)])
        docs = self._mk(
            spark,
            [(100, base + " tail marker words appended here"), (101, DOC_C)],
        )
        out = {(r.doc_id, r.probe_id): r.jaccard for r in decontam_fuzzy(docs, probe).collect()}
        assert set(out) == {(100, 1)}
        assert 0.5 <= out[(100, 1)] < 1.0

    def test_soundness_vs_brute_force(self, spark):
        """Every reported pair must carry the EXACT 3-gram Jaccard and
        clear the threshold — cross-checked against an all-pairs
        computation (LSH affects recall, never the reported values)."""
        from imitation_learning_data_pipeline_spark.plans.dedup import (
            decontam_fuzzy,
            exploded_shingles,
        )

        probe = self._mk(spark, [(1, DOC_A), (2, DOC_B)])
        docs = self._mk(
            spark,
            [
                (100, DOC_A),
                (101, DOC_A + " extra words at the end of it"),
                (102, DOC_B),
                (103, DOC_C),
            ],
        )
        got = {
            (r.doc_id, r.probe_id): r.jaccard
            for r in decontam_fuzzy(docs, probe).collect()
        }
        rows = exploded_shingles(docs).collect()
        p_rows = exploded_shingles(probe).collect()
        d_sh: dict[int, set] = {}
        for r in rows:
            d_sh.setdefault(r.doc_id, set()).add(r.s)
        p_sh: dict[int, set] = {}
        for r in p_rows:
            p_sh.setdefault(r.doc_id, set()).add(r.s)
        brute = {}
        for d, ds in d_sh.items():
            for p, ps in p_sh.items():
                j = len(ds & ps) / len(ds | ps)
                if j >= 0.5:
                    brute[(d, p)] = round(j, 4)
        # soundness: reported ⊆ brute with identical values
        for k, v in got.items():
            assert k in brute and abs(v - brute[k]) < 1e-9
        # guaranteed recall for identical-signature pairs
        assert (100, 1) in got and got[(100, 1)] == 1.0
        assert (102, 2) in got and got[(102, 2)] == 1.0

    def test_empty_probe_yields_empty(self, spark):
        from imitation_learning_data_pipeline_spark.plans.dedup import decontam_fuzzy

        probe = self._mk(spark, [])
        docs = self._mk(spark, [(100, DOC_A)])
        assert decontam_fuzzy(docs, probe).count() == 0
