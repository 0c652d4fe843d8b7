"""Round-6 fixes: compaction skew split, swap crash-safety, LSH
multi-probe recall, and bench/CLI hygiene regressions from the r5
verdict punch list."""

from __future__ import annotations

import os

import pytest
from conftest import SF_DIR


def _parquet_files(d: str) -> list[str]:
    return [f for f in os.listdir(d) if f.endswith(".parquet")]


class TestCompactionSkew:
    def test_big_partition_splits_into_target_sized_files(self, spark, tmp_path):
        """r5 verdict What's-wrong #1: a skewed Hive partition must
        compact into ~ceil(bytes/target) files through multiple tasks,
        not funnel into one task / one oversized file."""
        from pyspark.sql import functions as F

        from imitation_learning_data_pipeline_spark.pipeline.compact import compact

        p = str(tmp_path / "skew")
        # part=big ~9x the bytes of part=small; sha2 payload defeats
        # compression so on-disk size tracks row count
        (
            spark.range(0, 10_000)
            .withColumn("part", F.when(F.col("id") % 10 == 0, "small").otherwise("big"))
            .withColumn("payload", F.sha2(F.col("id").cast("string"), 256))
            .repartition(20)
            .write.partitionBy("part")
            .parquet(p)
        )
        big_bytes = sum(
            os.path.getsize(os.path.join(p, "part=big", f))
            for f in _parquet_files(os.path.join(p, "part=big"))
        )
        target = big_bytes // 4  # expect ~4-5 slices in the big partition
        r = compact(spark, p, target_bytes=target, partition_col="part")
        big_after = _parquet_files(os.path.join(p, "part=big"))
        small_after = _parquet_files(os.path.join(p, "part=small"))
        assert len(big_after) > 1, "big partition must split, not funnel into one file"
        assert len(big_after) <= 8  # ~ceil(bytes/target), not sprawl
        assert len(small_after) <= 2
        back = spark.read.parquet(p)
        assert back.count() == 10_000
        assert back.filter(F.col("part") == "small").count() == 1_000

    def test_leftover_tmp_and_old_dirs_are_cleaned(self, spark, tmp_path):
        """A crashed prior run strands the (dot-prefixed) stage-aside
        dirs; the next run must clear both and still succeed — and the
        hidden naming keeps a crash-stranded subtree dir invisible to
        partition discovery in the meantime."""
        from imitation_learning_data_pipeline_spark.pipeline.compact import compact

        p = str(tmp_path / "t")
        spark.range(0, 1000).repartition(8).write.parquet(p)
        for leftover in (f"{tmp_path}/.t__compact_tmp", f"{tmp_path}/.t__compact_old"):
            os.makedirs(leftover)
            with open(os.path.join(leftover, "stale.parquet"), "w") as f:
                f.write("junk from a crashed run")
        r = compact(spark, p, target_bytes=1 << 30)
        assert r["files_after"] == 1
        assert not os.path.exists(f"{tmp_path}/.t__compact_tmp")
        assert not os.path.exists(f"{tmp_path}/.t__compact_old")
        assert spark.read.parquet(p).count() == 1000

    def test_unpartitioned_round_trip_still_green(self, spark, tmp_path):
        from imitation_learning_data_pipeline_spark.pipeline.compact import compact

        p = str(tmp_path / "u")
        spark.range(0, 4000).repartition(40).write.parquet(p)
        r = compact(spark, p, target_bytes=1 << 30)
        assert r["files_before"] == 40
        assert r["files_after"] == 1
        back = spark.read.parquet(p)
        assert back.count() == 4000
        assert back.agg({"id": "sum"}).collect()[0][0] == 4000 * 3999 // 2


class TestCosineLshMultiprobe:
    def _planted_corpus(self):
        """Deterministic near-miss pair: cosine ≈ 0.995 but split across
        exactly ONE hyperplane of similarity.PLANES — invisible to
        exact-bucket blocking, recovered by multi-probe."""
        import numpy as np

        from imitation_learning_data_pipeline_spark.plans.similarity import (
            _PLANES_MAT,
        )

        p0 = _PLANES_MAT[0] / np.linalg.norm(_PLANES_MAT[0])
        for seed in range(100):
            rng = np.random.default_rng(seed)
            w = rng.normal(size=_PLANES_MAT.shape[1])
            w -= (w @ p0) * p0  # ⊥ plane 0 → δ alone decides its sign
            d = 0.05 * np.linalg.norm(w)
            v1, v2 = w + d * p0, w - d * p0
            b1 = (_PLANES_MAT @ v1) >= 0
            b2 = (_PLANES_MAT @ v2) >= 0
            if (b1 != b2).sum() == 1:
                cos = float(v1 @ v2 / (np.linalg.norm(v1) * np.linalg.norm(v2)))
                assert cos >= 0.95
                filler = [rng.normal(size=len(w)) * 5 for _ in range(20)]
                return v1, v2, filler, cos
        raise AssertionError("no seed produced a one-plane split")

    def _pairs(self, spark, multiprobe):
        from imitation_learning_data_pipeline_spark.plans.dedup import (
            embedding_cosine_lsh_pairs,
        )

        v1, v2, filler, cos = self._planted_corpus()
        rows = [(1, [float(x) for x in v1]), (2, [float(x) for x in v2])]
        # an exact-copy pair must be found in BOTH modes (home block)
        rows += [(3, [float(x) for x in filler[0]]), (4, [float(x) for x in filler[0]])]
        rows += [(10 + i, [float(x) for x in f]) for i, f in enumerate(filler[1:])]
        df = spark.createDataFrame(rows, "vec_id long, v array<double>")
        out = embedding_cosine_lsh_pairs(df, multiprobe=multiprobe).collect()
        return {(r.vec_a, r.vec_b): r.cos_sim for r in out}, cos

    def test_near_miss_missed_without_multiprobe(self, spark):
        pairs, _ = self._pairs(spark, multiprobe=False)
        assert (1, 2) not in pairs
        assert pairs.get((3, 4)) == pytest.approx(1.0)

    def test_near_miss_recovered_with_multiprobe_exactly_once(self, spark):
        from imitation_learning_data_pipeline_spark.plans.dedup import (
            embedding_cosine_lsh_pairs,
        )

        pairs, cos = self._pairs(spark, multiprobe=True)
        assert pairs.get((1, 2)) == pytest.approx(cos, abs=1e-3)
        assert pairs.get((3, 4)) == pytest.approx(1.0)
        # exactly-once discovery: no pair row may be emitted twice
        v1, v2, filler, _ = self._planted_corpus()
        rows = [(1, [float(x) for x in v1]), (2, [float(x) for x in v2])] + [
            (10 + i, [float(x) for x in f]) for i, f in enumerate(filler)
        ]
        df = spark.createDataFrame(rows, "vec_id long, v array<double>")
        out = embedding_cosine_lsh_pairs(df, multiprobe=True, threshold=-1.0).collect()
        keys = [(r.vec_a, r.vec_b) for r in out]
        assert len(keys) == len(set(keys)), "duplicate pair emission"


class TestLshIndexBucketEncoding:
    def test_bucket_stays_string_with_letter_prefix(self, spark, tmp_path):
        """ADVICE r5: all-digit partition values get type-inferred to int
        (leading zeros dropped); the 'b' prefix pins bucket to string."""
        from imitation_learning_data_pipeline_spark.plans.similarity import (
            _emb_raw,
            write_lsh_index,
        )

        write_lsh_index(_emb_raw(spark, SF_DIR), str(tmp_path / "idx"))
        dirs = [d for d in os.listdir(tmp_path / "idx") if d.startswith("bucket=")]
        assert dirs and all(d.startswith("bucket=b") for d in dirs)
        back = spark.read.parquet(str(tmp_path / "idx"))
        assert dict(back.dtypes)["bucket"] == "string"


class TestSubstringDupSpans:
    """Corpus-wide exact-substring duplicate spans (Lee et al. shape)."""

    def _docs(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_planted_shared_run_and_unique_docs(self, spark):
        from imitation_learning_data_pipeline_spark.plans.dedup import (
            substring_dup_spans,
        )

        # 12 shared words (= 5 shared 8-gram positions) embedded in two
        # docs with different unique prefixes/suffixes; a third doc is
        # fully unique.
        shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu"
        rows = [
            (1, "one two three four five six seven " + shared + " aa bb cc dd ee ff gg"),
            (2, "red orange yellow green blue indigo violet " + shared + " hh ii jj kk ll mm nn"),
            (3, "completely unique words nothing here repeats anywhere at all ever once only"),
        ]
        out = {
            r["doc_id"]: r.asDict()
            for r in substring_dup_spans(self._docs(spark, rows), n=8).collect()
        }
        assert set(out) == {1, 2}
        # 12-word run → 12-8+1 = 5 duplicated 8-grams, span 5+8-1 = 12.
        for d in (1, 2):
            assert out[d]["n_dup_grams"] == 5
            assert out[d]["max_dup_span_words"] == 12

    def test_within_doc_repeat_alone_does_not_count(self, spark):
        from imitation_learning_data_pipeline_spark.plans.dedup import (
            substring_dup_spans,
        )

        # The 8-gram repeats twice INSIDE doc 1 but exists in no other
        # doc: min(doc_id) == max(doc_id) → not a cross-doc duplicate.
        rep = "p1 p2 p3 p4 p5 p6 p7 p8"
        rows = [
            (1, rep + " filler middle words go here " + rep),
            (2, "different text with no overlap whatsoever in any gram at all"),
        ]
        assert substring_dup_spans(self._docs(spark, rows), n=8).count() == 0

    def test_exact_copies_span_whole_doc(self, spark):
        from imitation_learning_data_pipeline_spark.plans.dedup import (
            substring_dup_spans,
        )

        text = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 w14 w15"
        rows = [(1, text), (2, text)]
        out = {
            r["doc_id"]: r.asDict()
            for r in substring_dup_spans(self._docs(spark, rows), n=8).collect()
        }
        assert set(out) == {1, 2}
        for d in (1, 2):
            assert out[d]["max_dup_span_words"] == 15
            assert out[d]["n_dup_grams"] == 8  # 15-8+1 positions


class TestBloomDecontam:
    """Bloom-prefiltered decontamination: exact output, bounded memory."""

    def test_bloom64_no_false_negatives_and_bounded_fpp(self):
        import numpy as np
        from imitation_learning_data_pipeline_spark.functions.bloom import Bloom64

        rng = np.random.default_rng(7)
        members = rng.integers(-(2**62), 2**62, size=5000, dtype=np.int64)
        others = rng.integers(-(2**62), 2**62, size=20000, dtype=np.int64)
        others = np.setdiff1d(others, members)
        b = Bloom64.build(members, fpp=0.01)
        assert b.contains_many(members).all()  # zero false negatives
        fp = b.contains_many(others).mean()
        assert fp < 0.05  # ~0.01 nominal; loose bound against seed luck

    def _frames(self, spark):
        probe = spark.createDataFrame(
            [
                (100, "the quick brown fox jumps over the lazy dog today"),
                (101, "benchmark questions about gradient descent convergence rates"),
            ],
            "doc_id long, text string",
        )
        docs = spark.createDataFrame(
            [
                (1, "intro text then the quick brown fox jumps over the lazy dog today and more"),
                (2, "no overlap with any benchmark material in this document at all"),
                (3, "we ask questions about gradient descent convergence rates in this paper"),
            ],
            "doc_id long, text string",
        )
        return docs, probe

    def test_equals_broadcast_join_formulation(self, spark):
        from imitation_learning_data_pipeline_spark.plans.dedup import (
            decontam_overlap,
            decontam_overlap_bloom,
        )

        docs, probe = self._frames(spark)
        want = sorted(map(tuple, decontam_overlap(docs, probe).collect()))
        got = sorted(map(tuple, decontam_overlap_bloom(docs, probe).collect()))
        assert got == want and len(got) == 2

    def test_forced_false_positives_stay_exact(self, spark):
        # 64-bit filter → almost every corpus shingle is a Bloom hit;
        # the exact verification join must still reproduce the
        # broadcast-join answer bit for bit.
        from imitation_learning_data_pipeline_spark.plans.dedup import (
            decontam_overlap,
            decontam_overlap_bloom,
        )

        docs, probe = self._frames(spark)
        want = sorted(map(tuple, decontam_overlap(docs, probe).collect()))
        got = sorted(
            map(tuple, decontam_overlap_bloom(docs, probe, m_bits=64).collect())
        )
        assert got == want


class TestIncrementalDedupStore:
    """Persisted minhash state: dedup each new batch in O(batch)."""

    _OLD = [
        (1, "the cat sat on the mat while the dog slept near the door all day"),
        (2, "the cat sat on the mat while the dog slept near the door all day"),
        (3, "completely different content about spark shuffles and partition pruning"),
    ]
    _NEW = [
        # near-dup of stored doc 1/2 (small tail edit)
        (10, "the cat sat on the mat while the dog slept near the door all night"),
        # intra-batch exact pair
        (11, "fresh batch text that duplicates its sibling word for word exactly"),
        (12, "fresh batch text that duplicates its sibling word for word exactly"),
        # unique
        (13, "nothing in common with anything stored or batched here at all today"),
    ]

    def test_batch_vs_store_and_intra_batch_pairs(self, spark, tmp_path):
        from imitation_learning_data_pipeline_spark.plans.dedup import (
            dedup_against_store,
            minhash_pairs,
            write_minhash_store,
        )

        store = str(tmp_path / "mh_store")
        old = spark.createDataFrame(self._OLD, "doc_id long, text string")
        new = spark.createDataFrame(self._NEW, "doc_id long, text string")
        write_minhash_store(old, store)

        got = {
            (r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in dedup_against_store(new, store, threshold=0.5).collect()
        }
        # store-vs-store pair (1,2) must NOT appear; batch-vs-store and
        # intra-batch pairs must.
        assert (1, 2) not in got
        assert (11, 12) in got and got[(11, 12)] == 1.0
        assert (1, 10) in got and (2, 10) in got

        # Invariant: incremental pairs == full-corpus pairs minus the
        # old-old pairs (same threshold, same cap policy).
        full = {
            (r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in minhash_pairs(old.unionByName(new), threshold=0.5).collect()
        }
        old_ids = {d for d, _ in self._OLD}
        expect = {
            p: j for p, j in full.items()
            if not (p[0] in old_ids and p[1] in old_ids)
        }
        assert got == expect

    def test_append_folds_batch_into_store(self, spark, tmp_path):
        from imitation_learning_data_pipeline_spark.plans.dedup import (
            dedup_against_store,
            write_minhash_store,
        )

        store = str(tmp_path / "mh_store2")
        old = spark.createDataFrame(self._OLD, "doc_id long, text string")
        new = spark.createDataFrame(self._NEW, "doc_id long, text string")
        write_minhash_store(old, store)
        write_minhash_store(new, store, mode="append")

        # A second batch duplicating doc 11 (which arrived via append)
        # is caught against the grown store.
        batch2 = spark.createDataFrame(
            [(20, "fresh batch text that duplicates its sibling word for word exactly")],
            "doc_id long, text string",
        )
        pairs = {
            (r["doc_a"], r["doc_b"])
            for r in dedup_against_store(batch2, store, threshold=0.5).collect()
        }
        assert (11, 20) in pairs and (12, 20) in pairs
        assert all(20 in p for p in pairs)  # one side is always the batch


class TestStreamingIncrementalDedup:
    """foreachBatch incremental dedup: O(batch) per trigger, idempotent
    per-batch store folds, checkpointed multi-arrival."""

    def _write_batch(self, spark, d, rows, name):
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.mode("append").parquet(str(d))

    def test_three_arrivals(self, spark, tmp_path):
        from pyspark.sql import types as T

        from imitation_learning_data_pipeline_spark.streaming.incremental import (
            run_incremental_dedup_stream,
        )

        ingest = tmp_path / "ingest"
        store = str(tmp_path / "store")
        pairs = str(tmp_path / "pairs")
        ckpt = str(tmp_path / "ckpt")
        schema = T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("text", T.StringType()),
            ]
        )

        def _run():
            stream = spark.readStream.schema(schema).parquet(str(ingest))
            run_incremental_dedup_stream(stream, store, pairs, ckpt)

        def _pairs():
            return {
                (r["doc_a"], r["doc_b"], r["ingest_batch"])
                for r in spark.read.parquet(pairs).collect()
            }

        # Arrival 1: intra-batch exact pair (1,2); 3 unique.
        self._write_batch(
            spark,
            ingest,
            [
                (1, "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo"),
                (2, "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo"),
                (3, "totally unrelated document text with its own private vocabulary set"),
            ],
            "b1",
        )
        _run()
        got1 = _pairs()
        assert {(a, b) for a, b, _ in got1} == {(1, 2)}

        # Arrival 2: doc 10 duplicates STORED doc 3 → cross-batch pair;
        # batch-1 pairs are not re-emitted.
        self._write_batch(
            spark,
            ingest,
            [(10, "totally unrelated document text with its own private vocabulary set"),
             (11, "yet another singleton nothing matches this one at all anywhere")],
            "b2",
        )
        _run()
        got2 = _pairs()
        assert {(a, b) for a, b, _ in got2} == {(1, 2), (3, 10)}
        # Cross-batch pair landed in a LATER ingest_batch partition.
        b_of = {(a, b): n for a, b, n in got2}
        assert b_of[(3, 10)] > b_of[(1, 2)]

        # Arrival 3 (no new data): checkpoint makes it a no-op.
        _run()
        assert _pairs() == got2

        # Store state: every arrived doc is in the sets dataset exactly once.
        ids = sorted(
            r["doc_id"] for r in spark.read.parquet(f"{store}/sets").collect()
        )
        assert ids == [1, 2, 3, 10, 11]


class TestStreamingApproxDistinct:
    """applyInPandasWithState custom stateful op: per-key HLL registers
    (bounded 2^p bytes/key) refined across checkpointed arrivals."""

    def test_two_arrivals_refine_within_tolerance(self, spark, tmp_path):
        import pandas as pd
        from pyspark.sql import types as T

        from pyspark.sql import functions as F

        from imitation_learning_data_pipeline_spark.streaming.incremental import (
            streaming_approx_distinct,
        )

        ingest = tmp_path / "in"
        ingest.mkdir()
        ckpt = str(tmp_path / "ckpt")
        sink = str(tmp_path / "sink")
        schema = T.StructType(
            [
                T.StructField("k", T.StringType()),
                T.StructField("v", T.LongType()),
            ]
        )

        def _run():
            # foreachBatch sink: the memory sink can't recover from a
            # checkpoint, and a real deployment lands update rows in a
            # table anyway.
            stream = spark.readStream.schema(schema).parquet(str(ingest))
            out = streaming_approx_distinct(stream, "k", "v", p=10)

            def _sink(df, bid):
                df.withColumn("b", F.lit(int(bid))).write.mode(
                    "append"
                ).parquet(sink)

            q = (
                out.writeStream.foreachBatch(_sink)
                .outputMode("update")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

        def _latest(_=None):
            rows = spark.read.parquet(sink).collect()
            best = {}
            for r in rows:  # highest batch id per key wins
                if r["key"] not in best or r["b"] > best[r["key"]][1]:
                    best[r["key"]] = (r["approx_distinct"], r["b"])
            return {k: v[0] for k, v in best.items()}

        # Arrival 1: key "a" sees values 0..999, key "b" sees 0..49.
        pd.DataFrame(
            {"k": ["a"] * 1000 + ["b"] * 50,
             "v": list(range(1000)) + list(range(50))}
        ).to_parquet(ingest / "batch1.parquet", index=False)
        est1 = _latest(_run())
        assert abs(est1["a"] - 1000) / 1000 < 0.10
        assert abs(est1["b"] - 50) / 50 < 0.15

        # Arrival 2: "a" re-sees 500..1499 (500 new); state must carry
        # the first arrival through the checkpoint → ~1500 total.
        pd.DataFrame(
            {"k": ["a"] * 1000, "v": list(range(500, 1500))}
        ).to_parquet(ingest / "batch2.parquet", index=False)
        est2 = _latest(_run())
        assert abs(est2["a"] - 1500) / 1500 < 0.10
        # "b" saw no new data; its last estimate stands.
        assert est2["b"] == est1["b"]

    def test_state_is_bounded(self):
        # The register file IS the state: 2^8 bytes regardless of count.
        import numpy as np

        from imitation_learning_data_pipeline_spark.streaming.incremental import (
            _hll_estimate,
            _hll_update,
        )

        regs = np.zeros(256, dtype=np.uint8)
        _hll_update(regs, range(100_000), p=8)
        assert regs.nbytes == 256
        assert abs(_hll_estimate(regs) - 100_000) / 100_000 < 0.10
