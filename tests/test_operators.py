"""Targeted operator tests beyond the oracle contract: planted-duplicate
recall, ANN sanity, multimodal plumbing, streaming availableNow."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


class TestDedup:
    def test_exact_finds_planted_only(self, spark):
        from imitation_learning_data_pipeline_spark.plans.dedup import dedup_exact

        out = dedup_exact(spark, SF_DIR).collect()
        # 50 planted case/punct variants at sf0.001 → 50 groups of 2.
        assert len(out) == 50
        assert all(r.n_copies == 2 for r in out)
        assert all(r.canonical_doc < 1000000 for r in out)

    def test_minhash_recalls_planted_near_dups(self, spark):
        from imitation_learning_data_pipeline_spark.plans.dedup import dedup_minhash_lsh

        pairs = {(r.doc_a, r.doc_b) for r in dedup_minhash_lsh(spark, SF_DIR).collect()}
        # Exact-normalized copies (jaccard 1.0) must all be caught.
        exact_planted = {(d, d + 1000000) for d in range(0, 500, 10)}
        assert exact_planted <= pairs
        # Tail-appended near-dups: high jaccard, banding should catch most.
        near_planted = {(d, d + 2000000) for d in range(5, 500, 10)}
        recall = len(near_planted & pairs) / len(near_planted)
        assert recall > 0.8

    def test_simhash_near_dups_close(self, spark):
        from imitation_learning_data_pipeline_spark.plans.dedup import (
            _SIMHASH_BITS,
            dedup_simhash,
        )

        sh = {r.doc_id: r.simhash for r in dedup_simhash(spark, SF_DIR).collect()}
        # avg hamming distance between a doc and its near-dup copy stays a
        # small fraction of the signature width (flipped bits scale with
        # width, so the bound is width-relative: ≤ 6/32 ≈ 0.19)
        dists = [
            bin(sh[d] ^ sh[d + 2000000]).count("1")
            for d in range(5, 500, 10)
            if d + 2000000 in sh
        ]
        assert dists and sum(dists) / len(dists) <= 0.19 * _SIMHASH_BITS

    def test_embedding_cosine_finds_planted_copies(self, spark):
        from imitation_learning_data_pipeline_spark.plans.dedup import (
            dedup_embedding_cosine,
        )

        pairs = {
            (r.vec_a, r.vec_b): r.cos_sim
            for r in dedup_embedding_cosine(spark, SF_DIR).collect()
        }
        planted = {(d, d + 1000000) for d in range(0, 500, 50)}
        assert planted <= set(pairs)
        assert all(abs(pairs[p] - 1.0) < 1e-6 for p in planted)

    def test_embedding_cosine_block_cap_equals_bruteforce(self, spark):
        """A label larger than block_cap is salted into sub-blocks and
        cross-compared; the result must equal single-gemm brute force —
        same pairs whether a block fits in one worker or not (the hot-
        label OOM guard, plans/dedup.py embedding_cosine_pairs)."""
        import numpy as np

        from imitation_learning_data_pipeline_spark.plans.dedup import (
            embedding_cosine_pairs,
        )

        rng = np.random.default_rng(7)
        n, dim = 500, 16
        base = rng.normal(size=(n, dim))
        # plant near-dups: every 25th vector gets a barely-perturbed twin
        rows = []
        for i in range(n):
            rows.append((i, 0, [float(x) for x in base[i]]))
        for i in range(0, n, 25):
            rows.append((10_000 + i, 0, [float(x) for x in base[i] * 1.0001]))
        df = spark.createDataFrame(
            rows, "vec_id long, label int, v array<double>"
        )
        # cap 64 forces ⌈520/64⌉ = 9 sub-blocks; chunk 17 exercises the
        # row-chunked gemm path on uneven boundaries
        got = {
            (r.vec_a, r.vec_b)
            for r in embedding_cosine_pairs(
                df, threshold=0.95, block_cap=64, gemm_chunk=17
            ).collect()
        }
        ids = np.array([r[0] for r in rows])
        mat = np.stack([np.asarray(r[2]) for r in rows])
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        sims = mat @ mat.T
        ii, jj = np.where(np.triu(sims >= 0.95, k=1))
        want = {
            (min(ids[i], ids[j]), max(ids[i], ids[j])) for i, j in zip(ii, jj)
        }
        assert got == want
        assert len(want) >= n // 25  # the planted twins are in there


class TestSimilarity:
    def test_bruteforce_self_best_match(self, spark):
        from imitation_learning_data_pipeline_spark.plans.similarity import (
            ann_bruteforce_topk,
        )

        out = ann_bruteforce_topk(spark, SF_DIR)
        rows = out.collect()
        assert {r.qid for r in rows} == set(range(8))
        per_q = {}
        for r in rows:
            per_q.setdefault(r.qid, []).append(r)
        for q, rs in per_q.items():
            assert len(rs) == 10
            sims = [r.cos_sim for r in sorted(rs, key=lambda r: r.rnk)]
            assert sims == sorted(sims, reverse=True)

    def test_ivf_topk_ranked_within_probed_cells(self, spark):
        """IVF search invariant: per-query results are a correctly-ranked
        top-5 (descending cosine, vec_id tiebreak) drawn from the
        nprobe probed cells; the query itself is excluded."""
        from imitation_learning_data_pipeline_spark.plans.mllib_ops import ann_ivf_topk

        rows = ann_ivf_topk(spark, SF_DIR).collect()
        assert rows
        by_q: dict[int, list] = {}
        for r in rows:
            by_q.setdefault(r.qid, []).append(r)
        for qid, rs in by_q.items():
            rs = sorted(rs, key=lambda r: r.rnk)
            assert len(rs) <= 5
            cosines = [r.cos_sim for r in rs]
            assert cosines == sorted(cosines, reverse=True)
            assert qid not in {r.vec_id for r in rs}  # self excluded

    def test_ivf_recall_monotone_in_nprobe_and_exact_at_full_probe(self, spark):
        """Round-2 verdict item 6: recall@5 vs brute force is monotone
        non-decreasing in nprobe, and nprobe=k reproduces brute force
        EXACTLY (same (qid, rnk, vec_id) triples), not just same recall."""
        from imitation_learning_data_pipeline_spark.plans.mllib_ops import (
            ann_ivf_recall,
            ivf_topk,
        )
        from imitation_learning_data_pipeline_spark.plans.similarity import (
            ann_bruteforce_topk,
        )

        row = ann_ivf_recall(spark, SF_DIR).collect()[0]
        assert row.recall_monotone
        assert row.full_probe_exact
        assert row.n_queries == 8

        # nprobe=16 == all cells: identical ranked triples to brute force.
        full = {
            (r.qid, r.rnk, r.vec_id)
            for r in ivf_topk(spark, SF_DIR, nprobe=16, k_neighbors=5).collect()
        }
        brute = {
            (r.qid, r.rnk, r.vec_id)
            for r in ann_bruteforce_topk(spark, SF_DIR).collect()
            if r.rnk <= 5
        }
        assert full == brute

    def test_lsh_topk_subset_of_bucket(self, spark):
        from imitation_learning_data_pipeline_spark.plans.similarity import ann_lsh_topk

        out = ann_lsh_topk(spark, SF_DIR).collect()
        assert all(r.rnk <= 5 for r in out)


class TestMultimodal:
    def test_decode_stub_not_implemented_without_fake(self, spark):
        import pytest

        from imitation_learning_data_pipeline_spark.operators.multimodal import (
            attach_payload,
            decode_media,
        )
        from imitation_learning_data_pipeline_spark.sources import load_table

        docs = load_table(spark, SF_DIR, "documents").limit(5)
        with pytest.raises(Exception, match="NotImplementedError|decode"):
            decode_media(attach_payload(docs), fake_decode=False).collect()

    def test_fake_decode_deterministic(self, spark):
        from imitation_learning_data_pipeline_spark.operators.multimodal import (
            attach_payload,
            decode_media,
        )
        from imitation_learning_data_pipeline_spark.sources import load_table

        docs = load_table(spark, SF_DIR, "documents").limit(20)
        a = {r.doc_id: (r.width, r.height, r.n_frames)
             for r in decode_media(attach_payload(docs), fake_decode=True).collect()}
        b = {r.doc_id: (r.width, r.height, r.n_frames)
             for r in decode_media(attach_payload(docs), fake_decode=True).collect()}
        assert a == b
        assert all(128 <= w < 640 for (w, _, _) in a.values())


class TestStreaming:
    def test_streaming_equals_batch(self, spark):
        from imitation_learning_data_pipeline_spark.sources import load_table
        from imitation_learning_data_pipeline_spark.streaming import streaming_event_counts

        out = streaming_event_counts(spark, SF_DIR)
        batch = (
            load_table(spark, SF_DIR, "events")
            .groupBy("user_id", "event_type")
            .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        )
        got = {(r.user_id, r.event_type): (r.n, r.total_value) for r in out.collect()}
        want = {(r.user_id, r.event_type): (r.n, r.total_value) for r in batch.collect()}
        assert got == want


class TestHashing:
    def test_split_fractions_and_determinism(self, spark):
        from imitation_learning_data_pipeline_spark.functions.hashing import split_assign

        df = spark.range(20000).select(
            F.col("id"), split_assign("id", seed="42").alias("split")
        )
        counts = {r.split: r.n for r in df.groupBy("split").agg(F.count("*").alias("n")).collect()}
        assert abs(counts["train"] / 20000 - 0.8) < 0.02
        assert abs(counts["val"] / 20000 - 0.1) < 0.01
        assert abs(counts["test"] / 20000 - 0.1) < 0.01

    def test_blake2b_parity_udf_matches_reference_implementation(self, spark):
        """Bit-exact against a verbatim transcription of the REFERENCE's
        stable_hash_int/hash_to_unit_interval (utils.py:10-40), not the
        UDF's own formula — int keys serialize via compact JSON and the
        seed keys BLAKE2b as 8 little-endian bytes."""
        import hashlib
        import json

        from imitation_learning_data_pipeline_spark.functions.hashing import (
            blake2b_unit_interval_udf,
        )

        def reference_u(obj, seed=42):  # utils.py:10-40, transcribed
            payload = (
                obj.encode("utf-8")
                if isinstance(obj, str)
                else json.dumps(obj, separators=(",", ":"), sort_keys=True).encode()
            )
            key = (seed & ((1 << 64) - 1)).to_bytes(8, "little", signed=False)
            h = hashlib.blake2b(payload, digest_size=8, key=key)
            return int.from_bytes(h.digest(), "big") / float((1 << 64) - 1)

        udf = blake2b_unit_interval_udf()
        # int keys: the materialize split path (ep_idx ints, seed=42)
        rows = (
            spark.range(100).select("id", udf("id", F.lit(42)).alias("u")).collect()
        )
        for r in rows:
            assert abs(r.u - reference_u(int(r.id))) < 1e-15
        # string keys: utf-8 path
        sdf = spark.createDataFrame([("chunk-000",), ("ep_7",)], "k string")
        rows = sdf.select("k", udf("k", F.lit(7)).alias("u")).collect()
        for r in rows:
            assert abs(r.u - reference_u(r.k, seed=7)) < 1e-15
