"""Round-7b: continuous-aggregate rollup store (plans/rollup.py).

Coverage: algebraic exactness of the partials→merge→finalize fold,
plain-store O(touched-bucket) folds (untouched bucket files byte-
identical), the replay fence, the batch layout's replay idempotence,
compaction, the streaming twin, and the CLI verb.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from imitation_learning_data_pipeline_spark.plans.rollup import (
    compact_rollup_store,
    finalize_rollup,
    fold_rollup_into_store,
    merge_rollup,
    read_rollup,
    rollup_partials,
    write_rollup_store,
)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "g string, ts timestamp, v double")


def _rows(seed: int, n: int, groups=("a", "b", "c")):
    import datetime as dt
    import random

    rnd = random.Random(seed)
    out = []
    for i in range(n):
        out.append(
            (
                rnd.choice(groups),
                dt.datetime(2024, 1, 1 + rnd.randrange(3), rnd.randrange(24)),
                float(rnd.randrange(1000)),
            )
        )
    return out


def _final_map(df):
    return {
        (r["g"], str(r["bucket_ts"])): r.asDict() for r in df.collect()
    }


class TestRollupAlgebra:
    def test_merge_equals_direct(self, spark):
        """Partials computed per-batch and merged == one-pass aggregate
        over the concatenation (integer-valued metrics: exact)."""
        batches = [_rows(s, 400) for s in (1, 2, 3)]
        parts = [
            rollup_partials(_mk(spark, b), ["g"], ["v"], time_col="ts")
            for b in batches
        ]
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        folded = _final_map(finalize_rollup(merge_rollup(u)))
        direct = _final_map(
            finalize_rollup(
                rollup_partials(
                    _mk(spark, batches[0] + batches[1] + batches[2]),
                    ["g"],
                    ["v"],
                    time_col="ts",
                )
            )
        )
        assert set(folded) == set(direct)
        for k in direct:
            f, d = folded[k], direct[k]
            assert f["n_rows"] == d["n_rows"]
            assert f["v_n"] == d["v_n"]
            assert f["v_sum"] == d["v_sum"]  # integral doubles: exact
            assert f["v_min"] == d["v_min"] and f["v_max"] == d["v_max"]
            assert abs(f["v_var"] - d["v_var"]) < 1e-6 * max(1.0, abs(d["v_var"]))

    def test_single_aggregate_plan(self, spark):
        """All five stats × metrics compile into ONE hash aggregate —
        adding a metric must not add a pass."""
        parts = rollup_partials(_mk(spark, _rows(9, 100)), ["g"], ["v"])
        plan = parts._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1

    def test_distinct_sketches_merge_losslessly(self, spark, tmp_path):
        """Per-group HLL distinct folded through the store == one-pass
        sketch over the concatenation (register union is lossless), and
        the estimate is exact on small cardinalities."""
        b0, b1 = _rows(80, 400), _rows(81, 400)
        p0 = rollup_partials(_mk(spark, b0), ["g"], ["v"], distinct_cols=["v"])
        p1 = rollup_partials(_mk(spark, b1), ["g"], ["v"], distinct_cols=["v"])
        folded = {
            r["g"]: r["v_distinct_est"]
            for r in finalize_rollup(merge_rollup(p0.unionByName(p1))).collect()
        }
        whole = {
            r["g"]: r["v_distinct_est"]
            for r in finalize_rollup(
                rollup_partials(
                    _mk(spark, b0 + b1), ["g"], ["v"], distinct_cols=["v"]
                )
            ).collect()
        }
        assert folded == whole
        exact = {
            r["g"]: r["n"]
            for r in _mk(spark, b0 + b1)
            .groupBy("g")
            .agg(F.count_distinct("v").alias("n"))
            .collect()
        }
        for g, est in whole.items():
            assert abs(est - exact[g]) <= 0.05 * exact[g]
        # store roundtrip keeps sketches foldable
        store = str(tmp_path / "dstore")
        write_rollup_store(p0, store)
        fold_rollup_into_store(spark, store, p1, batch_id=1)
        got = {
            r["g"]: r["v_distinct_est"]
            for r in read_rollup(spark, store).collect()
        }
        assert got == whole

    def test_reserved_names_raise(self, spark):
        df = _mk(spark, _rows(0, 10))
        with pytest.raises(ValueError):
            rollup_partials(df.withColumnRenamed("g", "a__b"), ["a__b"], ["v"])
        with pytest.raises(ValueError):
            rollup_partials(df.withColumnRenamed("g", "bucket"), ["bucket"], ["v"])


def _bucket_files(store: str) -> dict[str, tuple]:
    """{bucket dir: sorted ((file, size, mtime))} for change detection."""
    out = {}
    for d in sorted(os.listdir(store)):
        if not d.startswith("bucket="):
            continue
        full = os.path.join(store, d)
        out[d] = tuple(
            sorted(
                (f, os.path.getsize(os.path.join(full, f)),
                 os.path.getmtime(os.path.join(full, f)))
                for f in os.listdir(full)
                if f.endswith(".parquet")
            )
        )
    return out


class TestRollupStore:
    def test_fold_matches_direct_and_prunes(self, spark, tmp_path):
        store = str(tmp_path / "store")
        b0, b1 = _rows(10, 500), _rows(11, 200, groups=("c",))
        write_rollup_store(
            rollup_partials(_mk(spark, b0), ["g"], ["v"]), store, n_buckets=16
        )
        before = _bucket_files(store)
        stats = fold_rollup_into_store(
            spark, store, rollup_partials(_mk(spark, b1), ["g"], ["v"]), batch_id=1
        )
        assert stats["folded"] and stats["touched_buckets"] == 1
        after = _bucket_files(store)
        # untouched buckets keep byte-identical files; exactly one differs
        changed = [d for d in before if after.get(d) != before[d]]
        assert len(changed) == 1
        got = {r["g"]: r.asDict() for r in read_rollup(spark, store).collect()}
        want = {
            r["g"]: r.asDict()
            for r in finalize_rollup(
                rollup_partials(_mk(spark, b0 + b1), ["g"], ["v"])
            ).collect()
        }
        assert set(got) == set(want)
        for g in want:
            assert got[g]["n_rows"] == want[g]["n_rows"]
            assert got[g]["v_sum"] == want[g]["v_sum"]
            assert got[g]["v_min"] == want[g]["v_min"]
            assert got[g]["v_max"] == want[g]["v_max"]

    def test_replay_fence(self, spark, tmp_path):
        store = str(tmp_path / "store")
        write_rollup_store(
            rollup_partials(_mk(spark, _rows(20, 300)), ["g"], ["v"]), store
        )
        batch = rollup_partials(_mk(spark, _rows(21, 100)), ["g"], ["v"])
        assert fold_rollup_into_store(spark, store, batch, batch_id=5)["folded"]
        snap = {r["g"]: r["v_sum"] for r in read_rollup(spark, store).collect()}
        # replayed batch (same id) must be a no-op, not a double-count
        again = fold_rollup_into_store(spark, store, batch, batch_id=5)
        assert not again["folded"]
        assert snap == {
            r["g"]: r["v_sum"] for r in read_rollup(spark, store).collect()
        }

    def test_lock_respected(self, spark, tmp_path):
        from imitation_learning_data_pipeline_spark.pipeline.compact import (
            ConcurrentMaintenanceError,
        )

        store = str(tmp_path / "store")
        write_rollup_store(
            rollup_partials(_mk(spark, _rows(30, 50)), ["g"], ["v"]), store
        )
        lock = store + "__maintenance_lock"
        with open(lock, "w") as fh:
            fh.write("{}")
        batch = rollup_partials(_mk(spark, _rows(31, 10)), ["g"], ["v"])
        with pytest.raises(ConcurrentMaintenanceError):
            fold_rollup_into_store(spark, store, batch)
        os.unlink(lock)
        assert fold_rollup_into_store(spark, store, batch)["folded"]

    def test_batch_layout_replay_idempotent_and_compact(self, spark, tmp_path):
        store = str(tmp_path / "bstore")
        b0, b1 = _rows(40, 300), _rows(41, 300)
        p0 = rollup_partials(_mk(spark, b0), ["g"], ["v"])
        p1 = rollup_partials(_mk(spark, b1), ["g"], ["v"])
        write_rollup_store(p0, store, ingest_batch=0)
        write_rollup_store(p1, store, ingest_batch=1)
        want = {
            r["g"]: r.asDict()
            for r in finalize_rollup(
                rollup_partials(_mk(spark, b0 + b1), ["g"], ["v"])
            ).collect()
        }
        got = {r["g"]: r.asDict() for r in read_rollup(spark, store).collect()}
        assert {g: got[g]["v_sum"] for g in got} == {
            g: want[g]["v_sum"] for g in want
        }
        # at-least-once replay of batch 1 REPLACES its partition
        write_rollup_store(p1, store, ingest_batch=1)
        got2 = {r["g"]: r.asDict() for r in read_rollup(spark, store).collect()}
        assert {g: got2[g]["v_sum"] for g in got2} == {
            g: want[g]["v_sum"] for g in want
        }
        # compaction: one row per group, same aggregate, plain layout
        stats = compact_rollup_store(spark, store)
        assert stats["n_groups"] == len(want)
        got3 = {r["g"]: r.asDict() for r in read_rollup(spark, store).collect()}
        assert {g: got3[g]["v_sum"] for g in got3} == {
            g: want[g]["v_sum"] for g in want
        }
        # compacted store now accepts plain folds
        more = rollup_partials(_mk(spark, _rows(42, 50)), ["g"], ["v"])
        assert fold_rollup_into_store(spark, store, more, batch_id=2)["folded"]

    def test_fold_on_batch_layout_refused(self, spark, tmp_path):
        store = str(tmp_path / "bstore")
        p = rollup_partials(_mk(spark, _rows(50, 50)), ["g"], ["v"])
        write_rollup_store(p, store, ingest_batch=0)
        with pytest.raises(ValueError, match="batch-layout"):
            fold_rollup_into_store(spark, store, p)


class TestStreamingRollup:
    def test_stream_matches_batch(self, spark, tmp_path):
        from imitation_learning_data_pipeline_spark.streaming.incremental import (
            run_incremental_rollup_stream,
        )

        src = str(tmp_path / "src")
        rows = _rows(60, 400)
        _mk(spark, rows).repartition(4).write.parquet(src)
        store = str(tmp_path / "store")
        ckpt = str(tmp_path / "ckpt")
        stream = spark.readStream.schema("g string, ts timestamp, v double").option(
            "maxFilesPerTrigger", 2
        ).parquet(src)
        run_incremental_rollup_stream(stream, ["g"], ["v"], store, ckpt)
        got = {r["g"]: r.asDict() for r in read_rollup(spark, store).collect()}
        want = {
            r["g"]: r.asDict()
            for r in finalize_rollup(
                rollup_partials(_mk(spark, rows), ["g"], ["v"])
            ).collect()
        }
        assert set(got) == set(want)
        for g in want:
            assert got[g]["n_rows"] == want[g]["n_rows"]
            assert got[g]["v_sum"] == want[g]["v_sum"]


class TestRollupCli:
    def test_cli_roundtrip(self, spark, tmp_path, capsys):
        from imitation_learning_data_pipeline_spark.cli import main

        src0, src1 = str(tmp_path / "s0"), str(tmp_path / "s1")
        b0, b1 = _rows(70, 300), _rows(71, 120)
        _mk(spark, b0).write.parquet(src0)
        _mk(spark, b1).write.parquet(src1)
        store = str(tmp_path / "store")
        assert (
            main(
                ["rollup", "--input", src0, "--group", "g", "--metrics", "v",
                 "--store", store]
            )
            == 0
        )
        assert (
            main(
                ["rollup", "--input", src1, "--group", "g", "--metrics", "v",
                 "--store", store, "--fold", "--batch-id", "1"]
            )
            == 0
        )
        capsys.readouterr()
        assert main(["rollup", "--store", store, "--read"]) == 0
        out = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
        want = {
            r["g"]: r.asDict()
            for r in finalize_rollup(
                rollup_partials(_mk(spark, b0 + b1), ["g"], ["v"])
            ).collect()
        }
        assert {r["g"]: r["v_sum"] for r in out} == {
            g: want[g]["v_sum"] for g in want
        }


class TestApplyMixturePlan:
    def _docs(self, spark):
        rows = [(i, "web") for i in range(100)] + [(1000 + i, "code") for i in range(10)]
        return spark.createDataFrame(rows, "doc_id long, source string")

    def test_copy_counts_and_determinism(self, spark):
        from imitation_learning_data_pipeline_spark.plans.sampling import (
            apply_mixture_plan,
        )

        docs = self._docs(spark)
        plan = spark.createDataFrame(
            [("web", 1000), ("code", 2500)], "source string, epochs_milli long"
        )
        out = apply_mixture_plan(docs, plan)
        pdf = out.toPandas()
        web = pdf[pdf.source == "web"]
        code = pdf[pdf.source == "code"]
        # web at exactly 1.0 epochs: every doc once, epoch_idx 0
        assert len(web) == 100 and set(web.epoch_idx) == {0}
        # code at 2.5: every doc 2 or 3 times, mean ~2.5
        per_doc = code.groupby("doc_id").size()
        assert set(per_doc) <= {2, 3}
        assert 20 <= len(code) <= 30
        # epoch_idx is 0..n-1 per doc
        for d, n in per_doc.items():
            assert sorted(code[code.doc_id == d].epoch_idx) == list(range(n))
        # pure function of (doc_id, seed): rerun identical
        pdf2 = apply_mixture_plan(docs, plan).toPandas()
        a = sorted(map(tuple, pdf[["doc_id", "epoch_idx"]].values))
        b = sorted(map(tuple, pdf2[["doc_id", "epoch_idx"]].values))
        assert a == b

    def test_zero_epoch_source_dropped_and_no_shuffle(self, spark):
        from imitation_learning_data_pipeline_spark.plans.sampling import (
            apply_mixture_plan,
        )

        docs = self._docs(spark)
        plan = spark.createDataFrame(
            [("web", 0), ("code", 2000)], "source string, epochs_milli long"
        )
        out = apply_mixture_plan(docs, plan)
        assert out.filter("source = 'web'").count() == 0
        assert out.filter("source = 'code'").count() == 20
        # broadcast join + map-side explode: zero exchanges on the doc side
        plan_str = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan_str
        import re

        assert len(re.findall(r"Exchange (?!SinglePartition)", plan_str)) <= 1


class TestChunkDocuments:
    def _docs(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_coverage_overlap_and_edges(self, spark):
        from imitation_learning_data_pipeline_spark.plans.text import chunk_documents

        words = " ".join(f"w{i}" for i in range(10))
        rows = [
            (1, words),             # 10 tokens: chunks at 0,3,6 (max 4, stride 3)
            (2, "a b"),             # shorter than max: one chunk
            (3, ""),                # empty: no chunks
            (4, " ".join(f"x{i}" for i in range(7))),  # n == max+stride boundary
        ]
        out = chunk_documents(
            self._docs(spark, rows), max_tokens=4, stride=3
        ).collect()
        by_doc = {}
        for r in out:
            by_doc.setdefault(r["doc_id"], []).append(r.asDict())
        for chunks in by_doc.values():
            chunks.sort(key=lambda c: c["chunk_id"])
        assert 3 not in by_doc
        d1 = by_doc[1]
        assert [(c["start_token"], c["n_tokens"]) for c in d1] == [
            (0, 4), (3, 4), (6, 4),
        ]
        # every token covered; adjacent chunks overlap by max-stride = 1
        assert d1[0]["chunk_text"] == "w0 w1 w2 w3"
        assert d1[1]["chunk_text"] == "w3 w4 w5 w6"
        assert d1[2]["chunk_text"] == "w6 w7 w8 w9"
        assert by_doc[2] == [
            {"doc_id": 2, "chunk_id": 0, "start_token": 0, "n_tokens": 2,
             "chunk_text": "a b"}
        ]
        d4 = by_doc[4]  # 7 tokens: starts 0,3 — last chunk reaches token 6
        assert [(c["start_token"], c["n_tokens"]) for c in d4] == [(0, 4), (3, 4)]
        assert d4[-1]["chunk_text"].endswith("x6")

    def test_no_shuffle_and_guards(self, spark):
        from imitation_learning_data_pipeline_spark.plans.text import chunk_documents

        docs = self._docs(spark, [(1, "a b c d e f")])
        out = chunk_documents(docs, max_tokens=3, stride=2)
        tree = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in tree and "Generate" in tree
        with pytest.raises(ValueError):
            chunk_documents(docs, max_tokens=3, stride=4)
        with pytest.raises(ValueError):
            chunk_documents(docs, max_tokens=0, stride=0)


class TestProbeStore:
    def test_store_matches_from_scratch_plan(self, spark, tmp_path):
        from imitation_learning_data_pipeline_spark.plans.dedup import (
            decontam_overlap,
            decontam_overlap_against_store,
            write_probe_store,
        )

        probe = spark.createDataFrame(
            [(1, "the quick brown fox jumps over the lazy dog today"),
             (2, "machine learning models memorize benchmark answers easily")],
            "doc_id long, text string",
        )
        docs = spark.createDataFrame(
            [(10, "someone said the quick brown fox jumps over the lazy dog yesterday"),
             (11, "completely unrelated words about gardening and cooking recipes"),
             (12, "models memorize benchmark answers easily when training data leaks")],
            "doc_id long, text string",
        )
        store = str(tmp_path / "probe")
        stats = write_probe_store(probe, store, n=5)
        assert stats["n_shingles"] > 0 and stats["bloom_bytes"] > 0
        want = {
            r["doc_id"]: r["n_overlap"]
            for r in decontam_overlap(docs, probe, n=5).collect()
        }
        got = {
            r["doc_id"]: r["n_overlap"]
            for r in decontam_overlap_against_store(docs, store, n=5).collect()
        }
        assert got == want and 10 in got and 11 not in got

    def test_bloom_roundtrip_forced_collisions_stay_exact(self, spark, tmp_path):
        """Deserialized tiny filter (heavy false positives) must still
        produce exact output — the verify join restores exactness."""
        from imitation_learning_data_pipeline_spark.functions.bloom import Bloom64
        from imitation_learning_data_pipeline_spark.plans.dedup import (
            decontam_overlap,
            decontam_overlap_against_store,
            write_probe_store,
        )

        probe = spark.createDataFrame(
            [(1, "alpha beta gamma delta epsilon zeta eta theta")],
            "doc_id long, text string",
        )
        docs = spark.createDataFrame(
            [(10, "prefix alpha beta gamma delta epsilon zeta suffix words"),
             (11, "nothing shared here with anything else at all today")],
            "doc_id long, text string",
        )
        store = str(tmp_path / "probe")
        write_probe_store(probe, store, n=5)
        # overwrite the sidecar with a pathologically small filter
        import struct

        hashes = [
            r["h"]
            for r in spark.read.parquet(store + "/shingles").collect()
        ]
        tiny = Bloom64(8, k=1)
        tiny.add_many(hashes)
        with open(store + "/_bloom.bin", "wb") as fh:
            fh.write(tiny.to_bytes())
        # hadoop's local FS keeps a checksum sidecar for files IT wrote;
        # an out-of-band overwrite must drop it or reads fail CRC
        crc = store + "/._bloom.bin.crc"
        if os.path.exists(crc):
            os.unlink(crc)
        want = {
            r["doc_id"]: r["n_overlap"]
            for r in decontam_overlap(docs, probe, n=5).collect()
        }
        got = {
            r["doc_id"]: r["n_overlap"]
            for r in decontam_overlap_against_store(docs, store, n=5).collect()
        }
        assert got == want


class TestStreamingDecontam:
    def test_stream_reports_match_batch(self, spark, tmp_path):
        from imitation_learning_data_pipeline_spark.plans.dedup import (
            decontam_overlap,
            write_probe_store,
        )
        from imitation_learning_data_pipeline_spark.streaming.incremental import (
            run_incremental_decontam_stream,
        )

        probe = spark.createDataFrame(
            [(1, "the quick brown fox jumps over the lazy dog today")],
            "doc_id long, text string",
        )
        store = str(tmp_path / "probe")
        write_probe_store(probe, store, n=5)
        rows = [
            (10, "someone said the quick brown fox jumps over the lazy dog again"),
            (11, "unrelated gardening text with zero overlap whatsoever here now"),
            (12, "quick brown fox jumps over the lazy dog spotted running away"),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        src = str(tmp_path / "src")
        docs.repartition(3).write.parquet(src)
        out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
        stream = spark.readStream.schema("doc_id long, text string").option(
            "maxFilesPerTrigger", 1
        ).parquet(src)
        run_incremental_decontam_stream(stream, store, out, ckpt, n=5)
        got = {
            r["doc_id"]: r["n_overlap"]
            for r in spark.read.parquet(out).collect()
        }
        want = {
            r["doc_id"]: r["n_overlap"]
            for r in decontam_overlap(docs, probe, n=5).collect()
        }
        assert got == want and 11 not in got
        # replay with a fresh checkpoint: dynamic overwrite keeps one
        # report per doc (partitions replaced, not appended)
        run_incremental_decontam_stream(stream, store, out, str(tmp_path / "ck2"), n=5)
        got2 = {
            r["doc_id"]: r["n_overlap"]
            for r in spark.read.parquet(out).collect()
        }
        assert got2 == want
import json


class TestDecontamCli:
    def test_build_and_check(self, spark, tmp_path, capsys):
        from imitation_learning_data_pipeline_spark.cli import main

        probe_p = str(tmp_path / "probe.parquet")
        spark.createDataFrame(
            [(1, "the quick brown fox jumps over the lazy dog today")],
            "doc_id long, text string",
        ).write.parquet(probe_p)
        corpus_p = str(tmp_path / "corpus.parquet")
        spark.createDataFrame(
            [(10, "witness saw the quick brown fox jumps over the lazy dog run"),
             (11, "unrelated text about cooking pasta with fresh tomatoes basil")],
            "doc_id long, text string",
        ).write.parquet(corpus_p)
        store = str(tmp_path / "store")
        assert main(["decontam", "--probe", probe_p, "--store", store]) == 0
        built = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert built["n_shingles"] > 0
        assert main(["decontam", "--input", corpus_p, "--store", store]) == 0
        rows = [
            json.loads(l)
            for l in capsys.readouterr().out.strip().splitlines()
            if l.startswith("{")
        ]
        by_id = {r["doc_id"]: r["n_overlap"] for r in rows}
        assert 10 in by_id and 11 not in by_id
