"""Round-10 ops, part 3: exact-substring dedup REMOVAL (Lee et al.),
DSIR importance resampling (Xie et al. 2023), and classifier-based
quality filtering (the GPT-3 recipe)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


PASSAGE = "alpha beta gamma delta epsilon zeta eta theta iota kappa"


class TestRemoveDupSpans:
    def _corpus(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_canonical_keeps_duplicate_loses(self, spark):
        from imitation_learning_data_pipeline_spark.plans.dedup import remove_dup_spans

        rows = [
            (1, f"one unique prefix {PASSAGE} and one unique suffix"),
            (2, f"totally different opening {PASSAGE} closing words here"),
            (3, "nothing shared with anything else in this corpus at all"),
        ]
        out = {
            r["doc_id"]: r
            for r in remove_dup_spans(self._corpus(spark, rows), n=8).collect()
        }
        # Doc 1 owns the canonical occurrence: text unchanged.
        assert out[1]["n_removed"] == 0
        assert PASSAGE in out[1]["kept_text"]
        # Doc 2 loses exactly the 10 shared words.
        assert out[2]["n_removed"] == 10
        assert "alpha" not in out[2]["kept_text"]
        assert out[2]["kept_text"].startswith("totally different opening")
        assert out[2]["kept_text"].endswith("closing words here")
        # Untouched doc.
        assert out[3]["n_removed"] == 0

    def test_within_doc_repeat_removed(self, spark):
        from imitation_learning_data_pipeline_spark.plans.dedup import remove_dup_spans

        rows = [(1, f"{PASSAGE} filler words in the middle {PASSAGE}")]
        out = remove_dup_spans(self._corpus(spark, rows), n=8).collect()[0]
        # Second occurrence excised, first (canonical) kept.
        assert out["n_removed"] == 10
        assert out["kept_text"].count("alpha") == 1
        assert out["kept_text"].startswith("alpha beta")

    def test_accounting(self, spark):
        from imitation_learning_data_pipeline_spark.plans.dedup import remove_dup_spans

        rows = [
            (1, PASSAGE),
            (2, PASSAGE),  # exact copy: all 10 words removed
        ]
        out = {r["doc_id"]: r for r in remove_dup_spans(self._corpus(spark, rows), n=8).collect()}
        assert out[1]["n_words"] == 10 and out[1]["n_removed"] == 0
        assert out[2]["n_removed"] == 10 and out[2]["kept_text"] == ""


class TestDsir:
    def _frames(self, spark):
        # Raw corpus: 20 docs in the target style (sports vocab), 20 junk.
        sporty = "match goal team score win league player season coach referee"
        junky = "lorem ipsum dolor sit amet consectetur adipiscing elit sed do"
        rows = []
        for i in range(20):
            w = sporty.split()
            rows.append((i, " ".join(w[i % 5 :] + w[: i % 5])))
        for i in range(20, 40):
            w = junky.split()
            rows.append((i, " ".join(w[i % 7 :] + w[: i % 7])))
        raw = spark.createDataFrame(rows, "doc_id long, text string")
        # Target domain: fresh sports docs (ids disjoint from raw).
        tgt = spark.createDataFrame(
            [(100 + i, sporty) for i in range(5)], "doc_id long, text string"
        )
        return raw, tgt

    def test_selects_target_like_docs(self, spark):
        from imitation_learning_data_pipeline_spark.plans.dsir import (
            doc_features,
            dsir_resample_topk,
            dsir_scores,
            dsir_weights,
        )

        raw, tgt = self._frames(spark)
        both = raw.unionByName(tgt)
        feats = doc_features(both)
        weights = dsir_weights(feats, tgt.select("doc_id"))
        scored = dsir_scores(raw, weights)
        top = dsir_resample_topk(scored, k=15).collect()
        picked = {r["doc_id"] for r in top}
        # Gumbel noise is ~O(1) on the log scale; the vocab gap is huge,
        # so every selected doc must be from the sporty half.
        assert picked <= set(range(20)), picked
        # Scores separate the halves strictly.
        by_id = {r["doc_id"]: r["score_int"] for r in scored.collect()}
        assert min(by_id[i] for i in range(20)) > max(by_id[i] for i in range(20, 40))

    def test_deterministic(self, spark):
        from imitation_learning_data_pipeline_spark.plans.dsir import (
            dsir_importance_topk,
        )

        a = [tuple(r) for r in dsir_importance_topk(spark, SF_DIR).collect()]
        b = [tuple(r) for r in dsir_importance_topk(spark, SF_DIR).collect()]
        assert a == b
        assert len(a) > 0


class TestQualityClassifier:
    def test_separates_planted_spam(self, spark):
        from imitation_learning_data_pipeline_spark.plans.quality_model import (
            _planted,
            pareto_keep,
            score_quality,
            train_quality_classifier,
        )
        from imitation_learning_data_pipeline_spark.functions.hashing import (
            md5_unit_interval,
        )

        corpus = _planted(spark, SF_DIR).withColumn(
            "is_train", md5_unit_interval("doc_id", seed="qsplit") < 0.7
        )
        model = train_quality_classifier(corpus.filter("is_train"))
        scored = score_quality(model, corpus.filter("NOT is_train"))
        rows = scored.select(
            "doc_id",
            "label",
            "quality_score",
            pareto_keep("quality_score", "doc_id").alias("kept"),
        ).collect()
        good = [r for r in rows if r["label"] == 1]
        bad = [r for r in rows if r["label"] == 0]
        assert good and bad
        # Hard separation on the planted vocab.
        assert min(r["quality_score"] for r in good) > max(
            r["quality_score"] for r in bad
        )
        # GPT-3 Pareto filter: keeps most good, almost no spam.
        assert sum(r["kept"] for r in good) >= 0.7 * len(good)
        assert sum(r["kept"] for r in bad) <= 0.1 * len(bad)

    def test_holdout_invariants_row(self, spark):
        from imitation_learning_data_pipeline_spark.plans.quality_model import (
            quality_classifier_holdout,
        )

        row = quality_classifier_holdout(spark, SF_DIR).collect()[0]
        assert row["auc_ge_090"] and row["good_kept_ge_070"] and row["bad_kept_le_010"]
        assert row["n_train"] + row["n_eval"] > 0

    def test_pareto_keep_deterministic(self, spark):
        from imitation_learning_data_pipeline_spark.plans.quality_model import (
            pareto_keep,
        )

        df = spark.range(200).select(
            F.col("id").alias("doc_id"), (F.col("id") / 200.0).alias("s")
        )
        a = df.select("doc_id", pareto_keep("s", "doc_id").alias("k")).collect()
        b = df.select("doc_id", pareto_keep("s", "doc_id").alias("k")).collect()
        assert a == b
        # Monotone-ish: a score of 1.0 is always kept, 0.0 essentially never.
        kept = {r["doc_id"]: r["k"] for r in a}
        assert kept[199] is True


class TestRound10cCli:
    def test_rewrite_dups_dsir_quality_verbs(self, spark, tmp_path, capsys):
        import json as _json

        from imitation_learning_data_pipeline_spark.cli import main

        # rewrite-dups: two docs sharing a 10-word passage.
        src = str(tmp_path / "docs")
        rows = [
            (1, f"one unique prefix {PASSAGE} and one unique suffix"),
            (2, f"totally different opening {PASSAGE} closing words here"),
            (3, "nothing shared with anything else in this small corpus"),
        ]
        spark.createDataFrame(rows, "doc_id long, text string").write.parquet(src)
        rout = str(tmp_path / "rewritten")
        assert main(["rewrite-dups", "--input", src, "--out", rout]) == 0
        stats = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert stats["docs_out"] == 3 and stats["words_removed"] == 10
        got = {
            r["doc_id"]: r["kept_text"]
            for r in spark.read.parquet(rout).collect()
        }
        assert "alpha" in got[1] and "alpha" not in got[2]

        # dsir --target-where: sporty target inside a mixed corpus.
        mixed = str(tmp_path / "mixed")
        sporty = "match goal team score win league player season coach referee"
        junky = "lorem ipsum dolor sit amet consectetur adipiscing elit sed do"
        mrows = [(i, sporty, "tgt") for i in range(10)] + [
            (100 + i, junky, "raw") for i in range(10)
        ] + [(200 + i, sporty, "raw") for i in range(10)]
        spark.createDataFrame(
            mrows, "doc_id long, text string, source string"
        ).write.parquet(mixed)
        dout = str(tmp_path / "dsir_sel")
        assert (
            main(
                ["dsir", "--input", mixed, "--target-where", "source = 'tgt'",
                 "--k", "12", "--out", dout]
            )
            == 0
        )
        sel = {r["doc_id"] for r in spark.read.parquet(dout).collect()}
        assert len(sel) == 12
        # junk docs (100-109) must lose to sporty ones under any Gumbel draw
        assert not (sel & {100 + i for i in range(10)})

        # quality-model: labeled spam vs real, filter the corpus.
        labeled = str(tmp_path / "labeled")
        lrows = [(i, sporty + f" extra{i}", 1) for i in range(20)] + [
            (100 + i, "buy cheap click winner prize " * 2, 0) for i in range(20)
        ]
        spark.createDataFrame(
            lrows, "doc_id long, text string, label int"
        ).write.parquet(labeled)
        qout = str(tmp_path / "scored")
        assert (
            main(
                ["quality-model", "--input", mixed, "--labeled", labeled,
                 "--out", qout]
            )
            == 0
        )
        q = spark.read.parquet(qout)
        assert q.count() == 30 and "quality_score" in q.columns


class TestDsirWeightStore:
    def test_roundtrip_matches_inline(self, spark, tmp_path):
        from imitation_learning_data_pipeline_spark.plans.dsir import (
            doc_features,
            dsir_resample_topk,
            dsir_scores,
            dsir_select_batch,
            dsir_weights,
            read_dsir_weights,
            write_dsir_weights,
        )

        sporty = "match goal team score win league player season coach referee"
        junky = "lorem ipsum dolor sit amet consectetur adipiscing elit sed do"
        rows = [(i, sporty if i % 2 == 0 else junky) for i in range(40)]
        raw = spark.createDataFrame(rows, "doc_id long, text string")
        tgt_ids = raw.filter("doc_id % 2 = 0 and doc_id < 10").select("doc_id")
        feats = doc_features(raw)
        weights = dsir_weights(feats, tgt_ids)
        path = str(tmp_path / "wstore")
        write_dsir_weights(weights, path)
        stored = read_dsir_weights(spark, path)
        inline = dsir_resample_topk(dsir_scores(raw, weights), k=10).collect()
        batch = dsir_select_batch(raw, stored, k=10).collect()
        assert [tuple(r) for r in inline] == [tuple(r) for r in batch]
        # One parquet part: the store is metadata-sized by construction.
        import glob
        assert len(glob.glob(f"{path}/part-*.parquet")) == 1

    def test_unseen_buckets_score_zero(self, spark, tmp_path):
        from imitation_learning_data_pipeline_spark.plans.dsir import (
            doc_features,
            dsir_select_batch,
            dsir_weights,
            read_dsir_weights,
            write_dsir_weights,
        )

        ref = spark.createDataFrame(
            [(1, "alpha beta gamma"), (2, "delta epsilon zeta")],
            "doc_id long, text string",
        )
        w = dsir_weights(doc_features(ref), ref.limit(1).select("doc_id"))
        path = str(tmp_path / "w2")
        write_dsir_weights(w, path)
        # Batch made ENTIRELY of vocabulary the reference never saw.
        batch = spark.createDataFrame(
            [(10, "totally novel words here")], "doc_id long, text string"
        )
        out = dsir_select_batch(batch, read_dsir_weights(spark, path), k=5).collect()
        assert len(out) == 1 and out[0]["score"] == 0.0

    def test_store_guard(self, spark, tmp_path):
        from imitation_learning_data_pipeline_spark.plans.dsir import read_dsir_weights

        bad = str(tmp_path / "notweights")
        spark.range(3).write.parquet(bad)
        with pytest.raises(ValueError, match="DSIR weight store"):
            read_dsir_weights(spark, bad)


class TestStreamingDsir:
    def test_threshold_stream_matches_batch_and_replays(self, spark, tmp_path):
        from imitation_learning_data_pipeline_spark.plans.dsir import (
            doc_features,
            dsir_weights,
            write_dsir_weights,
        )
        from imitation_learning_data_pipeline_spark.streaming.incremental import (
            run_incremental_dsir_stream,
        )

        sporty = "match goal team score win league player season coach referee"
        junky = "lorem ipsum dolor sit amet consectetur adipiscing elit sed do"
        ref = spark.createDataFrame(
            [(900 + i, sporty) for i in range(5)]
            + [(950 + i, junky) for i in range(5)],
            "doc_id long, text string",
        )
        wpath = str(tmp_path / "weights")
        write_dsir_weights(
            dsir_weights(doc_features(ref), ref.filter("doc_id < 950").select("doc_id")),
            wpath,
        )
        rows = [(i, sporty if i % 2 == 0 else junky) for i in range(12)]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        src = str(tmp_path / "src")
        docs.repartition(3).write.parquet(src)
        stream = spark.readStream.schema("doc_id long, text string").option(
            "maxFilesPerTrigger", 1
        ).parquet(src)
        out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
        run_incremental_dsir_stream(stream, wpath, out, ckpt, min_score=0.0)
        got = {r["doc_id"] for r in spark.read.parquet(out).collect()}
        # Sporty docs score positive, junk negative: the threshold keeps
        # exactly the even ids regardless of batch boundaries.
        assert got == {i for i in range(12) if i % 2 == 0}
        # Replay with a fresh checkpoint: partitions replaced, not appended.
        run_incremental_dsir_stream(
            stream, wpath, out, str(tmp_path / "ck2"), min_score=0.0
        )
        assert spark.read.parquet(out).count() == len(got)

    def test_mode_exclusivity(self, spark, tmp_path):
        from imitation_learning_data_pipeline_spark.streaming.incremental import (
            run_incremental_dsir_stream,
        )

        with pytest.raises(ValueError, match="exactly one"):
            run_incremental_dsir_stream(None, "w", "o", "c")
        with pytest.raises(ValueError, match="exactly one"):
            run_incremental_dsir_stream(
                None, "w", "o", "c", min_score=0.0, k_per_batch=5
            )

    def test_per_batch_topk(self, spark, tmp_path):
        from imitation_learning_data_pipeline_spark.plans.dsir import (
            doc_features,
            dsir_weights,
            write_dsir_weights,
        )
        from imitation_learning_data_pipeline_spark.streaming.incremental import (
            run_incremental_dsir_stream,
        )

        sporty = "match goal team score win league player season coach referee"
        ref = spark.createDataFrame(
            [(900, sporty), (950, "lorem ipsum dolor sit amet consectetur")],
            "doc_id long, text string",
        )
        wpath = str(tmp_path / "w")
        write_dsir_weights(
            dsir_weights(doc_features(ref), ref.filter("doc_id = 900").select("doc_id")),
            wpath,
        )
        docs = spark.createDataFrame(
            [(i, sporty) for i in range(9)], "doc_id long, text string"
        )
        src = str(tmp_path / "src")
        docs.repartition(3).write.parquet(src)
        stream = spark.readStream.schema("doc_id long, text string").option(
            "maxFilesPerTrigger", 1
        ).parquet(src)
        out = str(tmp_path / "out")
        run_incremental_dsir_stream(
            stream, wpath, out, str(tmp_path / "ck"), k_per_batch=2
        )
        per_batch = {
            r["ingest_batch"]: r["n"]
            for r in spark.read.parquet(out)
            .groupBy("ingest_batch")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        # 3 files -> 3 micro-batches, top-2 each.
        assert len(per_batch) == 3 and all(n == 2 for n in per_batch.values())


class TestDsirGlobalCompaction:
    def test_stream_then_fold_equals_single_batch(self, spark, tmp_path):
        from imitation_learning_data_pipeline_spark.plans.dsir import (
            doc_features,
            dsir_select_batch,
            dsir_weights,
            read_dsir_selection,
            read_dsir_weights,
            write_dsir_weights,
        )
        from imitation_learning_data_pipeline_spark.streaming.incremental import (
            run_incremental_dsir_stream,
        )

        sporty = "match goal team score win league player season coach referee"
        junky = "lorem ipsum dolor sit amet consectetur adipiscing elit sed do"
        ref = spark.createDataFrame(
            [(900, sporty), (950, junky)], "doc_id long, text string"
        )
        wpath = str(tmp_path / "w")
        write_dsir_weights(
            dsir_weights(doc_features(ref), ref.filter("doc_id = 900").select("doc_id")),
            wpath,
        )
        # Mixed corpus split over 4 files -> 4 micro-batches.
        rows = [
            (i, " ".join((sporty if i % 3 else junky).split()[i % 4 :]))
            for i in range(24)
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        src = str(tmp_path / "src")
        docs.repartition(4).write.parquet(src)
        stream = spark.readStream.schema("doc_id long, text string").option(
            "maxFilesPerTrigger", 1
        ).parquet(src)
        out = str(tmp_path / "sel")
        run_incremental_dsir_stream(
            stream, wpath, out, str(tmp_path / "ck"), k_per_batch=6
        )
        folded = read_dsir_selection(spark, out, k=6).collect()
        single = dsir_select_batch(
            docs, read_dsir_weights(spark, wpath), k=6
        ).collect()
        assert [tuple(r) for r in folded] == [tuple(r) for r in single]

    def test_store_guard(self, spark, tmp_path):
        from imitation_learning_data_pipeline_spark.plans.dsir import (
            read_dsir_selection,
        )

        bad = str(tmp_path / "bad")
        spark.range(3).write.parquet(bad)
        with pytest.raises(ValueError, match="selection store"):
            read_dsir_selection(spark, bad, k=2)


class TestClusterKeepBest:
    def test_best_keeper_and_singletons(self, spark):
        from imitation_learning_data_pipeline_spark.plans.dedup import cluster_keep_best

        docs = spark.createDataFrame(
            [
                (1, 5.0),   # cluster {1,2,3}: 2 has the best score
                (2, 9.0),
                (3, 9.0),   # ties 2 on score -> min doc_id (2) wins
                (7, 1.0),   # singleton: its own keeper
            ],
            "doc_id long, score double",
        )
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3)], "doc_a long, doc_b long"
        )
        out = {
            r["doc_id"]: (r["cluster_id"], r["is_keeper"])
            for r in cluster_keep_best(docs, pairs, "score").collect()
        }
        assert out[1] == (1, False)
        assert out[2] == (1, True)   # best score, tie broken by min id
        assert out[3] == (1, False)
        assert out[7] == (7, True)   # singleton keeps itself

    def test_lib_query_planted_semantics(self, spark):
        from imitation_learning_data_pipeline_spark.plans.dedup import (
            dedup_cluster_keep_best,
        )
        from tests.conftest import SF_DIR

        rows = dedup_cluster_keep_best(spark, SF_DIR).collect()
        by_id = {r["doc_id"]: r for r in rows}
        # Tail-appended near-dups (+2000000, 5 extra words) must beat
        # their bases wherever both ended up in one cluster.
        for r in rows:
            if r["doc_id"] >= 2000000 and (r["doc_id"] - 2000000) in by_id:
                base = by_id[r["doc_id"] - 2000000]
                if base["cluster_id"] == r["cluster_id"]:
                    assert r["is_keeper"] and not base["is_keeper"]
        # Exactly one keeper per cluster.
        from collections import Counter

        per_cluster = Counter(r["cluster_id"] for r in rows if r["is_keeper"])
        all_clusters = {r["cluster_id"] for r in rows}
        assert set(per_cluster) == all_clusters
        assert all(v == 1 for v in per_cluster.values())


class TestFunnelRewriteStage:
    def test_rewrite_before_dedup(self, spark):
        from imitation_learning_data_pipeline_spark.plans.curation import (
            curation_funnel,
        )

        base = (
            "the quick brown fox jumps over the lazy dog and runs far "
            "away into the quiet green hills before the sun sets tonight"
        )
        rows = [
            (1, base),
            (2, base),  # exact copy: rewrite empties it -> dropped
            (3, base + " plus a genuinely new closing thought appended here"),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        cur, report = curation_funnel(
            docs, stages=("rewrite", "dedup"), report=True
        )
        got = {r["doc_id"]: r["text"] for r in cur.collect()}
        # Doc 1 canonical (kept in full); doc 2 emptied and dropped;
        # doc 3 keeps only its unique tail.
        assert set(got) == {1, 3}
        assert got[1].startswith("the quick brown fox")
        assert "quick" not in got[3] and got[3].endswith("appended here")
        assert report[0]["stage"] == "rewrite" and report[0]["rows_out"] == 2

    def test_unknown_stage_still_raises(self, spark):
        from imitation_learning_data_pipeline_spark.plans.curation import (
            curation_funnel,
        )

        docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        with pytest.raises(ValueError, match="unknown stages"):
            curation_funnel(docs, stages=("gopher", "nope"))


class TestEmbeddingOutliers:
    def test_global_mode_flags_planted(self, spark):
        import random

        from imitation_learning_data_pipeline_spark.plans.embedding_quality import (
            embedding_outliers,
        )

        rng = random.Random(7)
        rows = [(i, [rng.gauss(0, 1) for _ in range(16)]) for i in range(200)]
        rows += [(1000 + i, [rng.gauss(0, 1) * 12 for _ in range(16)]) for i in range(5)]
        vecs = spark.createDataFrame(rows, "vec_id long, v array<double>")
        out = {r["vec_id"]: r for r in embedding_outliers(vecs).collect()}
        assert all(out[1000 + i]["is_outlier"] for i in range(5))
        base_flags = sum(1 for i in range(200) if out[i]["is_outlier"])
        assert base_flags <= 10  # ≤5% false-flag rate on clean gaussians

    def test_cell_mode_tiny_cell_flagged(self, spark):
        import random

        from imitation_learning_data_pipeline_spark.plans.embedding_quality import (
            embedding_outliers,
        )

        rng = random.Random(11)
        # Two tight, well-separated clusters + one extreme singleton.
        rows = [(i, [rng.gauss(0, 0.1) for _ in range(8)]) for i in range(50)]
        rows += [(100 + i, [rng.gauss(5, 0.1) for _ in range(8)]) for i in range(50)]
        rows += [(999, [100.0] * 8)]
        vecs = spark.createDataFrame(rows, "vec_id long, v array<double>")
        out = {r["vec_id"]: r for r in embedding_outliers(vecs, k=3).collect()}
        # Whether KMeans parked a centroid on the extreme point (tiny
        # cell -> flagged by min_cell) or lumped it into a cluster
        # (giant z -> flagged by threshold), it must be an outlier.
        assert out[999]["is_outlier"]
        base_flags = sum(1 for i in list(range(50)) + list(range(100, 150))
                         if out[i]["is_outlier"])
        assert base_flags <= 5

    def test_invariant_row(self, spark):
        from imitation_learning_data_pipeline_spark.plans.embedding_quality import (
            embedding_outlier_check,
        )
        from tests.conftest import SF_DIR

        row = embedding_outlier_check(spark, SF_DIR).collect()[0]
        assert row["planted_all_flagged"] and row["base_rate_low"]


class TestTemperatureMixture:
    def test_flattens_toward_uniform(self, spark):
        from imitation_learning_data_pipeline_spark.plans.sampling import (
            mixture_temperature_budget,
            mixture_token_budget,
        )
        from tests.conftest import SF_DIR

        temp = {r["source"]: r for r in mixture_temperature_budget(spark, SF_DIR).collect()}
        nat = {s: r["n_tokens"] for s, r in temp.items()}
        q = {s: r["q_bp"] for s, r in temp.items()}
        # Shares sum to ~1 (basis points; integer rounding slack).
        assert abs(sum(q.values()) - 10000) <= len(q)
        # Flattening: the share RATIO between largest and smallest
        # source must shrink vs natural proportions (alpha < 1).
        big = max(nat, key=nat.get)
        small = min(nat, key=nat.get)
        if nat[big] > nat[small]:
            nat_ratio = nat[big] / nat[small]
            q_ratio = q[big] / max(q[small], 1)
            assert q_ratio < nat_ratio
            # And ordering is preserved (monotone transform).
            assert q[big] >= q[small]
        # Epoch cap honored.
        assert all(r["epochs_milli"] <= 4000 for r in temp.values())


class TestEmbedFilterCli:
    def test_verb_global_mode(self, spark, tmp_path, capsys):
        import json as _json
        import random

        from imitation_learning_data_pipeline_spark.cli import main

        rng = random.Random(3)
        rows = [(i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(100)]
        rows += [(900, [50.0] * 8)]
        src = str(tmp_path / "emb")
        spark.createDataFrame(rows, "vec_id long, embedding array<float>").write.parquet(src)
        out = str(tmp_path / "kept")
        assert main(["embed-filter", "--input", src, "--keep-only", "--out", out]) == 0
        stats = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        kept = {r["vec_id"] for r in spark.read.parquet(out).collect()}
        assert 900 not in kept and len(kept) >= 95
        assert stats["outliers"] == 0  # keep-only output carries no outliers


class TestBlocklistFilter:
    def test_occurrences_and_threshold(self, spark):
        from imitation_learning_data_pipeline_spark.plans.text import blocklist_filter

        docs = spark.createDataFrame(
            [
                (1, "clean words only here"),
                (2, "one bad word here"),
                (3, "bad bad words and another bad one"),
            ],
            "doc_id long, text string",
        )
        out = {
            r["doc_id"]: (r["n_blocked"], r["keep"])
            for r in blocklist_filter(docs, ["bad", "another"]).collect()
        }
        assert out[1] == (0, True)
        assert out[2] == (1, False)
        assert out[3] == (4, False)  # occurrences, not distinct types
        relaxed = {
            r["doc_id"]: r["keep"]
            for r in blocklist_filter(docs, ["bad", "another"], max_hits=1).collect()
        }
        assert relaxed[2] is True and relaxed[3] is False


class TestQualityModelPersistence:
    def test_roundtrip_and_streaming_scoring(self, spark, tmp_path):
        from imitation_learning_data_pipeline_spark.plans.quality_model import (
            load_quality_model,
            save_quality_model,
            score_quality,
            train_quality_classifier,
        )
        from imitation_learning_data_pipeline_spark.streaming.incremental import (
            run_incremental_quality_model_stream,
        )

        sporty = "match goal team score win league player season coach referee"
        spam = "buy cheap click winner prize buy cheap click winner prize"
        labeled = spark.createDataFrame(
            [(i, sporty + f" x{i}", 1) for i in range(15)]
            + [(100 + i, spam, 0) for i in range(15)],
            "doc_id long, text string, label int",
        )
        model = train_quality_classifier(labeled)
        mpath = str(tmp_path / "model")
        save_quality_model(model, mpath)
        reloaded = load_quality_model(mpath)

        probe = spark.createDataFrame(
            [(1, sporty), (2, spam)], "doc_id long, text string"
        )
        a = {r["doc_id"]: r["quality_score"] for r in score_quality(model, probe).collect()}
        b = {r["doc_id"]: r["quality_score"] for r in score_quality(reloaded, probe).collect()}
        assert a == b and a[1] > 0.5 > a[2]

        # Streaming scorer over 3 micro-batches, keep-only mode.
        docs = spark.createDataFrame(
            [(i, sporty if i % 2 == 0 else spam) for i in range(12)],
            "doc_id long, text string",
        )
        src = str(tmp_path / "src")
        docs.repartition(3).write.parquet(src)
        stream = spark.readStream.schema("doc_id long, text string").option(
            "maxFilesPerTrigger", 1
        ).parquet(src)
        out = str(tmp_path / "scored")
        run_incremental_quality_model_stream(
            stream, mpath, out, str(tmp_path / "ck"), filter_keep=True
        )
        kept = {r["doc_id"] for r in spark.read.parquet(out).collect()}
        # Spam never survives; the seeded Pareto rule may drop a few
        # good docs (by design), but most sporty docs survive.
        assert kept <= {i for i in range(12) if i % 2 == 0}
        assert len(kept) >= 4

    def test_cli_model_reuse(self, spark, tmp_path, capsys):
        import json as _json

        from imitation_learning_data_pipeline_spark.cli import main

        sporty = "match goal team score win league player season coach referee"
        labeled = str(tmp_path / "labeled")
        spark.createDataFrame(
            [(i, sporty, 1) for i in range(10)]
            + [(100 + i, "buy cheap click winner prize", 0) for i in range(10)],
            "doc_id long, text string, label int",
        ).write.parquet(labeled)
        corpus = str(tmp_path / "corpus")
        spark.createDataFrame(
            [(1, sporty), (2, "buy cheap click winner prize")],
            "doc_id long, text string",
        ).write.parquet(corpus)
        mdl = str(tmp_path / "mdl")
        out1, out2 = str(tmp_path / "o1"), str(tmp_path / "o2")
        assert main(["quality-model", "--input", corpus, "--labeled", labeled,
                     "--model-out", mdl, "--out", out1]) == 0
        assert main(["quality-model", "--input", corpus, "--model", mdl,
                     "--out", out2]) == 0
        s1 = {r["doc_id"]: r["quality_score"] for r in spark.read.parquet(out1).collect()}
        s2 = {r["doc_id"]: r["quality_score"] for r in spark.read.parquet(out2).collect()}
        assert s1 == s2


class TestFunnelBlocklistStage:
    def test_blocklist_stage_and_cli(self, spark, tmp_path, capsys):
        import json as _json

        from imitation_learning_data_pipeline_spark.cli import main
        from imitation_learning_data_pipeline_spark.plans.curation import (
            curation_funnel,
        )

        docs = spark.createDataFrame(
            [
                (1, "perfectly fine words here"),
                (2, "contains a banned word"),
                (3, "clean again"),
            ],
            "doc_id long, text string",
        )
        cur, report = curation_funnel(
            docs, stages=("blocklist",), blockwords=["banned"]
        )
        assert {r["doc_id"] for r in cur.collect()} == {1, 3}
        assert report[0]["rows_out"] == 2
        with pytest.raises(ValueError, match="needs blockwords"):
            curation_funnel(docs, stages=("blocklist",))

        src = str(tmp_path / "docs")
        docs.write.parquet(src)
        out = str(tmp_path / "curated")
        assert main(["curate", "--path", src, "--stages", "blocklist,dedup",
                     "--blockwords", "banned", "--out", out]) == 0
        rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["funnel"][0]["stage"] == "blocklist"
        assert spark.read.parquet(out).count() == 2


class TestRemoveDupSpansInvariants:
    def test_overlapping_grams_union_coverage(self, spark):
        from imitation_learning_data_pipeline_spark.plans.dedup import remove_dup_spans

        # Doc 2 shares an 11-word window with doc 1 (two overlapping
        # 8-gram families): covered positions must UNION, removing the
        # full 11 words exactly once.
        w = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11"
        rows = [
            (1, f"{w} unique tail for canonical"),
            (2, f"other head {w} other tail"),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r["doc_id"]: r for r in remove_dup_spans(docs, n=8).collect()}
        assert out[1]["n_removed"] == 0
        assert out[2]["n_removed"] == 11
        assert out[2]["kept_text"] == "other head other tail"

    def test_unique_corpus_is_untouched(self, spark):
        from imitation_learning_data_pipeline_spark.plans.dedup import remove_dup_spans

        # Every word globally unique -> nothing can be a duplicated
        # gram -> every doc survives verbatim (normalized).
        rows = [
            (i, " ".join(f"tok{i}x{j}" for j in range(12))) for i in range(8)
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        out = remove_dup_spans(docs, n=8).collect()
        assert all(r["n_removed"] == 0 for r in out)
        assert all(r["kept_text"].count(" ") == 11 for r in out)

    def test_short_docs_never_removed(self, spark):
        from imitation_learning_data_pipeline_spark.plans.dedup import remove_dup_spans

        # Docs shorter than n have no n-grams at all — identical short
        # docs are exact-dedup's job, not span removal's.
        rows = [(1, "same tiny doc"), (2, "same tiny doc")]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        out = remove_dup_spans(docs, n=8).collect()
        assert all(r["n_removed"] == 0 for r in out)


class TestRound10cHardening:
    def test_blocklist_normalizes_entries(self, spark):
        from imitation_learning_data_pipeline_spark.plans.text import blocklist_filter

        docs = spark.createDataFrame(
            [(1, "this has a banned token")], "doc_id long, text string"
        )
        out = blocklist_filter(docs, ["Banned!"]).collect()[0]
        assert out["n_blocked"] == 1 and out["keep"] is False
        with pytest.raises(ValueError, match="multi-word"):
            blocklist_filter(docs, ["two words"])
        with pytest.raises(ValueError, match="normalized to nothing"):
            blocklist_filter(docs, ["!!!"])

    def test_global_fold_refuses_larger_k(self, spark, tmp_path):
        from imitation_learning_data_pipeline_spark.plans.dsir import (
            doc_features,
            dsir_weights,
            read_dsir_selection,
            write_dsir_weights,
        )
        from imitation_learning_data_pipeline_spark.streaming.incremental import (
            run_incremental_dsir_stream,
        )

        ref = spark.createDataFrame(
            [(900, "alpha beta gamma"), (950, "delta epsilon zeta")],
            "doc_id long, text string",
        )
        wpath = str(tmp_path / "w")
        write_dsir_weights(
            dsir_weights(doc_features(ref), ref.limit(1).select("doc_id")), wpath
        )
        docs = spark.createDataFrame(
            [(i, "alpha beta gamma") for i in range(9)], "doc_id long, text string"
        )
        src = str(tmp_path / "src")
        docs.repartition(3).write.parquet(src)
        stream = spark.readStream.schema("doc_id long, text string").option(
            "maxFilesPerTrigger", 1
        ).parquet(src)
        out = str(tmp_path / "sel")
        run_incremental_dsir_stream(
            stream, wpath, out, str(tmp_path / "ck"), k_per_batch=2
        )
        # k within the per-batch cut: fine; beyond it: refused.
        assert len(read_dsir_selection(spark, out, k=2).collect()) == 2
        with pytest.raises(ValueError, match="exceeds the store's k_per_batch"):
            read_dsir_selection(spark, out, k=3)


class TestPerceptualHash:
    def test_locality_and_pairs(self, spark):
        from imitation_learning_data_pipeline_spark.operators.multimodal import (
            _fake_ahash,
            attach_payload,
            perceptual_hash,
        )
        from imitation_learning_data_pipeline_spark.plans.multimodal_queries import (
            phash_pairs,
        )

        base = ("the quick brown fox jumps over the lazy dog " * 6).encode()
        edited = bytearray(base)
        edited[10] = ord("x")  # one-byte edit -> few pixels change
        assert bin(
            _fake_ahash(base) ^ _fake_ahash(bytes(edited))
        ).count("1") <= 3
        assert _fake_ahash(base) == _fake_ahash(bytes(base))
        assert _fake_ahash(b"") == 0

        rows = [
            (1, base.decode()),
            (2, base.decode()),            # exact copy -> hamming 0
            (3, bytes(edited).decode()),   # near copy -> small hamming
            (4, "a completely different payload with other bytes entirely xyz"),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        hashes = perceptual_hash(attach_payload(docs), fake_decode=True)
        pairs = {
            (r["doc_a"], r["doc_b"]): r["hamming"]
            for r in phash_pairs(hashes).collect()
        }
        assert pairs[(1, 2)] == 0
        assert pairs[(1, 3)] <= 3
        assert (1, 4) not in pairs and (2, 4) not in pairs

    def test_pigeonhole_no_false_negatives(self, spark):
        # Any pair within Hamming <= 3 MUST be found: flip 3 scattered
        # bits of a fixed 64-bit pattern and require the candidate.
        from imitation_learning_data_pipeline_spark.plans.multimodal_queries import (
            phash_pairs,
        )

        h0 = 0x0123456789ABCDEF
        h1 = h0 ^ (1 << 2) ^ (1 << 21) ^ (1 << 63)  # 3 flips in 3 bands

        def signed(h):
            return h - (1 << 64) if h >= (1 << 63) else h

        hashes = spark.createDataFrame(
            [(1, signed(h0)), (2, signed(h1))], "doc_id long, phash long"
        )
        got = phash_pairs(hashes).collect()
        assert len(got) == 1 and got[0]["hamming"] == 3

    def test_library_query_planted(self, spark):
        from imitation_learning_data_pipeline_spark.plans.multimodal_queries import (
            multimodal_phash_pairs,
        )
        from tests.conftest import SF_DIR

        pairs = {
            (r["doc_a"], r["doc_b"]): r["hamming"]
            for r in multimodal_phash_pairs(spark, SF_DIR).collect()
        }
        exact = [(a, b) for (a, b) in pairs if b == a + 1000000]
        assert exact and all(pairs[p] == 0 for p in exact)


class TestFunnelNeardupStage:
    def test_neardup_keeps_best_extraction(self, spark):
        from imitation_learning_data_pipeline_spark.plans.curation import (
            curation_funnel,
        )

        base = (
            "alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lamda mu nu xi omicron pi rho sigma tau upsilon"
        )
        rows = [
            (1, base),                                  # truncated extraction
            (2, base + " phi chi psi omega and more"),  # fuller extraction
            (3, "entirely different content with its own words here now"),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        cur, report = curation_funnel(docs, stages=("neardup",))
        kept = {r["doc_id"] for r in cur.collect()}
        # Docs 1 and 2 are near-dups; the LONGER extraction (2) wins
        # even though 1 has the smaller id. Doc 3 is a singleton.
        assert kept == {2, 3}
        assert report[0] == {"stage": "neardup", "rows_in": 3, "rows_out": 2}


class TestPhashCli:
    def test_verb(self, spark, tmp_path, capsys):
        import json as _json

        from imitation_learning_data_pipeline_spark.cli import main

        base = "the quick brown fox jumps over the lazy dog " * 6
        src = str(tmp_path / "media")
        spark.createDataFrame(
            [(1, base.encode()), (2, base.encode()), (3, b"unrelated bytes here xyz")],
            "doc_id long, payload binary",
        ).write.parquet(src)
        out = str(tmp_path / "pairs")
        assert main(["phash", "--input", src, "--fake-decode", "--out", out]) == 0
        stats = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        pairs = {(r["doc_a"], r["doc_b"]) for r in spark.read.parquet(out).collect()}
        assert (1, 2) in pairs and stats["pairs"] >= 1


class TestDsirFoldDedup:
    def test_redropped_file_does_not_double_select(self, spark, tmp_path):
        from imitation_learning_data_pipeline_spark.plans.dsir import (
            doc_features,
            dsir_weights,
            read_dsir_selection,
            write_dsir_weights,
        )
        from imitation_learning_data_pipeline_spark.streaming.incremental import (
            run_incremental_dsir_stream,
        )

        ref = spark.createDataFrame(
            [(900, "alpha beta gamma"), (950, "delta epsilon zeta")],
            "doc_id long, text string",
        )
        wpath = str(tmp_path / "w")
        write_dsir_weights(
            dsir_weights(doc_features(ref), ref.limit(1).select("doc_id")), wpath
        )
        docs = spark.createDataFrame(
            [(i, "alpha beta gamma") for i in range(6)], "doc_id long, text string"
        )
        src = str(tmp_path / "src")
        docs.repartition(1).write.parquet(src)
        # Re-drop the SAME rows as a second file: same docs, new batch.
        import shutil, glob

        part = glob.glob(f"{src}/part-*.parquet")[0]
        shutil.copy(part, f"{src}/part-redrop.parquet")
        stream = spark.readStream.schema("doc_id long, text string").option(
            "maxFilesPerTrigger", 1
        ).parquet(src)
        out = str(tmp_path / "sel")
        run_incremental_dsir_stream(
            stream, wpath, out, str(tmp_path / "ck"), k_per_batch=6
        )
        got = read_dsir_selection(spark, out, k=6).collect()
        ids = [r["doc_id"] for r in got]
        assert sorted(ids) == list(range(6))  # each doc once, never twice


class TestFunnelClassifyStage:
    def test_classify_stage_with_persisted_model(self, spark, tmp_path):
        from imitation_learning_data_pipeline_spark.plans.curation import (
            curation_funnel,
        )
        from imitation_learning_data_pipeline_spark.plans.quality_model import (
            save_quality_model,
            train_quality_classifier,
        )

        sporty = "match goal team score win league player season coach referee"
        spam = "buy cheap click winner prize buy cheap click winner prize"
        labeled = spark.createDataFrame(
            [(i, sporty + f" v{i}", 1) for i in range(15)]
            + [(100 + i, spam, 0) for i in range(15)],
            "doc_id long, text string, label int",
        )
        mpath = str(tmp_path / "model")
        save_quality_model(train_quality_classifier(labeled), mpath)

        docs = spark.createDataFrame(
            [(i, sporty if i % 2 == 0 else spam) for i in range(20)],
            "doc_id long, text string",
        )
        cur, report = curation_funnel(
            docs, stages=("classify",), quality_model_path=mpath
        )
        kept = {r["doc_id"] for r in cur.collect()}
        assert kept <= {i for i in range(20) if i % 2 == 0}
        assert len(kept) >= 7  # Pareto keeps most high scorers
        assert report[0]["stage"] == "classify"
        with pytest.raises(ValueError, match="needs\n?.*quality_model_path|quality_model_path"):
            curation_funnel(docs, stages=("classify",))
