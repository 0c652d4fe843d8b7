"""Round-5 operators: SimHash pair extraction, reusable dedup APIs over
caller DataFrames (not just the contract fixtures), and the
connected-components convergence guard + pointer-jumping path.

Invariants beyond the DuckDB oracle: semantic properties that must hold
on ANY input, exercised on non-fixture frames."""

from __future__ import annotations

import pytest
from conftest import SF_DIR


def _docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# A deterministic 40-word vocabulary for synthetic docs: every doc below
# draws ordered, non-overlapping word windows so shingle sets are
# disjoint between unrelated docs.
_VOCAB = [f"w{i:02d}" for i in range(40)]


def _doc(lo: int, hi: int) -> str:
    return " ".join(_VOCAB[lo:hi])


class TestSimhashPairs:
    def test_planted_exact_copies_pair_at_hamming_zero(self, spark):
        """Case/punct variants normalize identically → identical
        signature → guaranteed candidate (all 4 bands collide) and
        Hamming 0."""
        from imitation_learning_data_pipeline_spark.plans.dedup import (
            dedup_simhash_pairs,
        )
        from imitation_learning_data_pipeline_spark.sources import load_table

        doc_ids = {
            r.doc_id
            for r in load_table(spark, SF_DIR, "documents").select("doc_id").collect()
        }
        expected = {(d, d + 1000000) for d in doc_ids if d % 10 == 0}
        out = dedup_simhash_pairs(spark, SF_DIR).collect()
        got = {(r.doc_a, r.doc_b): r.hamming for r in out}
        assert expected <= set(got)
        assert all(got[p] == 0 for p in expected)
        assert all(0 <= r.hamming <= 3 for r in out)

    def test_api_on_custom_frame(self, spark):
        """simhash_pairs takes any (doc_id, text) frame: an identical
        pair is found at Hamming 0; word-disjoint docs don't pair."""
        from imitation_learning_data_pipeline_spark.plans.dedup import simhash_pairs

        docs = _docs_df(
            spark,
            [
                (1, _doc(0, 12)),
                (2, _doc(0, 12)),  # exact copy of 1
                (3, _doc(12, 24)),  # disjoint
                (4, _doc(24, 40)),  # disjoint
            ],
        )
        got = {(r.doc_a, r.doc_b): r.hamming for r in simhash_pairs(docs).collect()}
        assert got == {(1, 2): 0}

    def test_pigeonhole_candidate_guarantee(self, spark):
        """A pair within Hamming ≤ 3 differs in ≤ 3 of 4 bands → shares
        ≥ 1 exact byte → MUST be emitted (no cap in play). Checked by
        comparing the banded operator against a direct all-pairs Hamming
        join on the signatures."""
        from pyspark.sql import functions as F

        from imitation_learning_data_pipeline_spark.plans.dedup import (
            _SH_K,
            simhash_pairs,
            simhash_signatures,
        )

        docs = _docs_df(
            spark,
            [(i, _doc(0, 12) if i % 2 == 0 else _doc(12, 30)) for i in range(20)],
        )
        sig = simhash_signatures(docs)
        a, b = sig.alias("a"), sig.alias("b")
        hd = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
        brute = {
            (r.doc_a, r.doc_b)
            for r in a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
            .filter(hd <= _SH_K)
            .select(
                F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
            )
            .collect()
        }
        banded = {(r.doc_a, r.doc_b) for r in simhash_pairs(docs).collect()}
        assert banded == brute


class TestDedupApisOnCallerFrames:
    """r4 verdict item 6: the dedup family is a library, not a set of
    fixture-welded contract queries."""

    def test_minhash_pairs(self, spark):
        from imitation_learning_data_pipeline_spark.plans.dedup import minhash_pairs

        base = _doc(0, 20)
        docs = _docs_df(
            spark,
            [
                # near-dup at J=18/19: one appended word. (Two appended
                # words → J=0.9 happens to miss all 3 md5 band buckets —
                # LSH recall at j⁴-per-band is probabilistic by design
                # and deterministic given md5, so the fixture pins a
                # verified-colliding pair.)
                (10, base),
                (11, base + " w20"),
                (12, _doc(20, 40)),  # unrelated
            ],
        )
        pairs = {(r.doc_a, r.doc_b): r.jaccard for r in minhash_pairs(docs).collect()}
        assert (10, 11) in pairs
        assert pairs[(10, 11)] == round(18 / 19, 4)
        assert not any(12 in p for p in pairs)

    def test_ngram_jaccard_pairs(self, spark):
        from imitation_learning_data_pipeline_spark.plans.dedup import (
            ngram_jaccard_pairs,
        )

        base = _doc(0, 20)
        docs = _docs_df(
            spark,
            [(10, base), (11, base + " w20 w21"), (12, _doc(20, 40))],
        )
        pairs = {
            (r.doc_a, r.doc_b): r.jaccard
            for r in ngram_jaccard_pairs(docs).collect()
        }
        # exact Jaccard of the 3-shingle sets: |∩|=18, |∪|=20
        assert pairs == {(10, 11): 0.9}

    def test_decontam_spans(self, spark):
        """Longest contiguous overlap: a verbatim copy spans the whole
        probe doc; an interleaved quote spans only its quoted run."""
        from imitation_learning_data_pipeline_spark.plans.dedup import decontam_spans

        probe = _docs_df(spark, [(900, _doc(0, 10))])
        docs = _docs_df(
            spark,
            [
                (1, _doc(0, 10)),  # verbatim: run of 6 shingles → span 10
                # 6 probe words quoted mid-document (positions 6..11 of
                # 0-based words): only 2 consecutive 5-shingles hit → span 6
                (2, _doc(20, 26) + " " + _doc(0, 6) + " " + _doc(30, 36)),
                (3, _doc(15, 30)),  # clean — absent from output
            ],
        )
        got = {
            r.doc_id: (r.n_overlap, r.max_span_words)
            for r in decontam_spans(docs, probe).collect()
        }
        assert got[1] == (6, 10)
        assert got[2] == (2, 6)
        assert 3 not in got

    def test_decontam_overlap(self, spark):
        from imitation_learning_data_pipeline_spark.plans.dedup import decontam_overlap

        probe = _docs_df(spark, [(900, _doc(0, 10))])
        docs = _docs_df(
            spark,
            [
                (1, _doc(0, 10)),  # verbatim probe leak → all 6 5-shingles hit
                (2, _doc(3, 13)),  # partial window overlap
                (3, _doc(15, 30)),  # clean
            ],
        )
        got = {r.doc_id: r.n_overlap for r in decontam_overlap(docs, probe).collect()}
        assert got[1] == 6
        assert 1 <= got[2] <= 3
        assert 3 not in got


class TestLshIndexPartitionPruning:
    """The ann_lsh scale path made real: corpus written partitioned by
    bucket; a query reads only its bucket directories."""

    def test_search_matches_join_formulation_and_prunes(self, spark, tmp_path):
        from imitation_learning_data_pipeline_spark.plans.similarity import (
            _emb_raw,
            _query_matrix,
            ann_lsh_topk,
            search_lsh_index,
            write_lsh_index,
        )

        sf = SF_DIR
        write_lsh_index(_emb_raw(spark, sf), str(tmp_path / "idx"))
        qids, qmat = _query_matrix(_emb_raw(spark, sf))
        out = search_lsh_index(spark, str(tmp_path / "idx"), qids, qmat, k=5)

        # identical results to the broadcast-join formulation
        exp = {
            (r.qid, r.rnk): (r.vec_id, r.cos_sim)
            for r in ann_lsh_topk(spark, sf).collect()
        }
        got = {(r.qid, r.rnk): (r.vec_id, r.cos_sim) for r in out.collect()}
        assert got == exp

        # the scan must prune partitions: PartitionFilters carries the
        # bucket predicate, and the pruned scan reads < all buckets
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters: [" in plan
        assert "bucket" in plan.split("PartitionFilters: [", 1)[1][:200]

    def test_one_file_per_bucket(self, spark, tmp_path):
        import os

        from imitation_learning_data_pipeline_spark.plans.similarity import (
            _emb_raw,
            write_lsh_index,
        )

        write_lsh_index(_emb_raw(spark, SF_DIR), str(tmp_path / "idx"))
        for d in os.listdir(tmp_path / "idx"):
            if not d.startswith("bucket="):
                continue
            files = [
                f
                for f in os.listdir(tmp_path / "idx" / d)
                if f.endswith(".parquet")
            ]
            assert len(files) == 1, f"{d}: {files}"


class TestContractSurfaceInvariants:
    """Machine-checks for the registry curation (ADVICE r4: proxy claims
    were comment-only)."""

    def test_surface_is_exactly_capped_and_oracled(self):
        import __spark_entry__ as e

        qs, os_ = e.queries(), e.oracle_sql()
        assert len(qs) == 50
        assert set(os_) <= set(qs)

    def test_every_referenced_name_is_registered(self):
        from imitation_learning_data_pipeline_spark.plans.registry import (
            CONTRACT_EXCLUDE,
            CONTRACT_FIRST,
            QUERIES,
        )

        missing = [n for n in CONTRACT_FIRST if n not in QUERIES]
        assert not missing, f"CONTRACT_FIRST references unknown: {missing}"
        missing = [n for n in CONTRACT_EXCLUDE if n not in QUERIES]
        assert not missing, f"CONTRACT_EXCLUDE references unknown: {missing}"
        dupes = [n for n in CONTRACT_FIRST if n in CONTRACT_EXCLUDE]
        assert not dupes, f"in both FIRST and EXCLUDE: {dupes}"

    def test_every_named_proxy_is_in_the_contract(self):
        """A parked query's stand-in must itself hold a contract slot —
        otherwise the park silently loses driver coverage."""
        import re

        import __spark_entry__ as e

        from imitation_learning_data_pipeline_spark.plans.registry import (
            CONTRACT_EXCLUDE,
            QUERIES,
        )

        contract = set(e.queries())
        for parked, rationale in CONTRACT_EXCLUDE.items():
            named = [
                t
                for t in re.findall(r"[a-z0-9_]+", rationale)
                if t in QUERIES
            ]
            assert named, f"{parked}: rationale names no registered query"
            in_contract = [t for t in named if t in contract]
            assert in_contract, (
                f"{parked}: none of its named proxies {named} hold a "
                "contract slot"
            )


class TestMp4PythonProbe:
    """r4 verdict item 4: S9 no longer degrades without ffprobe — the
    pure-Python ISO-BMFF parser reads nb_frames/duration/fps from real
    MP4 box structure."""

    def test_parses_generated_mp4(self, tmp_path):
        from conftest import make_minimal_mp4

        from imitation_learning_data_pipeline_spark.operators.media_probe import (
            probe_mp4_python,
        )

        p = tmp_path / "a.mp4"
        p.write_bytes(make_minimal_mp4(90, 30.0))
        r = probe_mp4_python(str(p))
        assert r["ok"]
        assert r["nb_frames"] == 90
        assert abs(r["avg_fps"] - 30.0) < 1e-9
        assert abs(r["duration"] - 3.0) < 1e-9

    def test_parses_version1_mdhd(self, tmp_path):
        from conftest import make_minimal_mp4

        from imitation_learning_data_pipeline_spark.operators.media_probe import (
            probe_mp4_python,
        )

        p = tmp_path / "v1.mp4"
        p.write_bytes(make_minimal_mp4(61, 29.97, mdhd_v1=True))
        r = probe_mp4_python(str(p))
        assert r["ok"] and r["nb_frames"] == 61
        assert abs(r["avg_fps"] - 29.97) < 0.05

    def test_garbage_is_data_not_crash(self, tmp_path):
        from imitation_learning_data_pipeline_spark.operators.media_probe import (
            probe_mp4_python,
        )

        p = tmp_path / "junk.mp4"
        p.write_bytes(b"\x00fakemp4" * 16)
        r = probe_mp4_python(str(p))
        assert not r["ok"]
        assert "moov" in r["error"]

    def test_validate_check_videos_end_to_end_without_injection(
        self, spark, lerobot_fixture
    ):
        """The full validate(check_videos=True) path runs on the real
        (ffprobe-less) probe: clean episodes pass fps and frames-vs-rows
        checks against the fixture MP4s' actual box metadata."""
        from imitation_learning_data_pipeline_spark.pipeline import validate_episodes
        from imitation_learning_data_pipeline_spark.pipeline.discover import discover

        frames = spark.read.parquet(
            str(lerobot_fixture / "data" / "chunk-000")
        )
        episodes_meta = spark.read.json(
            str(lerobot_fixture / "meta" / "episodes.jsonl")
        )
        manifest = discover(spark, str(lerobot_fixture))
        report = {
            r.episode_index: r
            for r in validate_episodes(
                frames, episodes_meta, manifest=manifest, check_videos=True
            ).collect()
        }
        clean = report[0]
        assert clean.ok and list(clean.issues) == []
        # defect episodes still fail for their *non-video* reasons, and
        # no clean episode picks up a spurious video issue
        assert not report[5].ok
        video_issues = {
            i
            for r in report.values()
            for i in r.issues
            if i.endswith(("_fps", "_frames_vs_rows"))
        }
        assert video_issues == set()


class TestEventsTsUnitSniffing:
    """ADVICE r4: the bare-int64 branch of the events reader must not
    silently misinterpret a millis/nanos column as epoch seconds."""

    def _write_events(self, tmp_path, ts_values):
        import pyarrow as pa
        import pyarrow.parquet as pq

        n = len(ts_values)
        tbl = pa.table(
            {
                "event_id": pa.array(range(n), pa.int64()),
                "ts": pa.array(ts_values, pa.int64()),
                "user_id": pa.array([1] * n, pa.int64()),
                "event_type": pa.array(["view"] * n),
                "value": pa.array([1.0] * n),
                "props": pa.array(["{}"] * n),
            }
        )
        pq.write_table(tbl, str(tmp_path / "events.parquet"))
        return str(tmp_path)

    def test_plausible_epoch_seconds_load(self, spark, tmp_path):
        from imitation_learning_data_pipeline_spark.sources.readers import load_table

        d = self._write_events(tmp_path, [1_700_000_000, 1_700_000_060])
        rows = load_table(spark, d, "events").select("ts").collect()
        assert rows[0].ts.year == 2023

    def test_millis_masquerading_as_int64_raises(self, spark, tmp_path):
        from imitation_learning_data_pipeline_spark.sources.readers import load_table

        d = self._write_events(tmp_path, [1_700_000_000_000, 1_700_000_060_000])
        with pytest.raises(ValueError, match="not plausible epoch SECONDS"):
            load_table(spark, d, "events")

    def test_regenerated_file_resniffs(self, spark, tmp_path):
        """The unit cache keys on mtime: rewriting the file with a
        different physical type must not serve the stale unit."""
        import os

        from imitation_learning_data_pipeline_spark.sources.readers import load_table

        d = self._write_events(tmp_path, [1_700_000_000])
        load_table(spark, d, "events")
        self._write_events(tmp_path, [1_700_000_000_000])
        os.utime(
            tmp_path / "events.parquet",
            (os.path.getmtime(tmp_path / "events.parquet") + 5,) * 2,
        )
        with pytest.raises(ValueError, match="not plausible epoch SECONDS"):
            load_table(spark, d, "events")


class TestManifestUpsert:
    """r4 verdict item 8: incremental discover must rewrite only touched
    chunks of the stored manifest."""

    @staticmethod
    def _tree(root, chunk_eps: dict[str, list[int]]):
        import pandas as pd

        from conftest import make_minimal_mp4

        for chunk, eps in chunk_eps.items():
            d = root / "data" / chunk
            d.mkdir(parents=True, exist_ok=True)
            for ep in eps:
                pd.DataFrame({"frame_index": range(10), "v": [float(ep)] * 10}).to_parquet(
                    d / f"episode_{ep:06d}.parquet", index=False
                )
            for cam in ("cam_front", "cam_wrist"):
                vd = root / "videos" / chunk / cam
                vd.mkdir(parents=True, exist_ok=True)
                for ep in eps:
                    (vd / f"episode_{ep:06d}.mp4").write_bytes(
                        make_minimal_mp4(10, 30.0)
                    )

    @staticmethod
    def _mtimes(out):
        import os

        return {
            os.path.join(dp, f): os.path.getmtime(os.path.join(dp, f))
            for dp, _, fs in os.walk(out)
            for f in fs
            if f.endswith(".parquet")
        }

    def test_untouched_chunk_files_survive_rediscover(self, spark, tmp_path):
        import time

        from pyspark.sql import functions as F

        from imitation_learning_data_pipeline_spark.pipeline.discover import (
            discover,
            upsert_manifest,
        )

        root = tmp_path / "ds"
        self._tree(root, {"chunk-000": [0, 1], "chunk-001": [2]})
        out = str(tmp_path / "manifest")

        m1 = discover(spark, str(root))
        wrote1 = upsert_manifest(m1, out)
        assert set(wrote1) == {"chunk-000", "chunk-001"}  # first run: all NEW
        before = self._mtimes(out)

        time.sleep(1.1)  # mtime granularity
        # touch ONLY chunk-001: change an episode's content
        import pandas as pd

        pd.DataFrame({"frame_index": range(12), "v": [9.0] * 12}).to_parquet(
            root / "data" / "chunk-001" / "episode_000002.parquet", index=False
        )
        prev = spark.read.parquet(out)
        m2 = discover(spark, str(root), prev_manifest=prev)
        wrote2 = upsert_manifest(m2, out)
        assert wrote2 == ["chunk-001"]

        after = self._mtimes(out)
        c0_before = {p: t for p, t in before.items() if "chunk=chunk-000" in p}
        c0_after = {p: t for p, t in after.items() if "chunk=chunk-000" in p}
        assert c0_before == c0_after  # byte-untouched on disk
        assert any(
            "chunk=chunk-001" in p and p not in before or after[p] != before.get(p)
            for p in after
            if "chunk=chunk-001" in p
        )
        # read-back completeness + the changed row is current
        back = spark.read.parquet(out)
        assert back.filter(F.col("chunk") == "chunk-000").count() == 2
        ch = back.filter(F.col("episode_index") == 2).collect()
        assert len(ch) == 1 and ch[0].status == "CHANGED"

    def test_all_unchanged_second_run_writes_nothing(self, spark, tmp_path):
        from imitation_learning_data_pipeline_spark.pipeline.discover import (
            discover,
            upsert_manifest,
        )

        root = tmp_path / "ds2"
        self._tree(root, {"chunk-000": [0]})
        out = str(tmp_path / "manifest2")
        upsert_manifest(discover(spark, str(root)), out)
        before = self._mtimes(out)
        prev = spark.read.parquet(out)
        wrote = upsert_manifest(discover(spark, str(root), prev_manifest=prev), out)
        assert wrote == []
        assert self._mtimes(out) == before


class TestStreamingDedup:
    def test_incremental_arrival_accumulates_duplicate_state(self, spark, tmp_path):
        """Exactly-once incremental dedup: batch 1 plants an in-batch
        duplicate; batch 2 lands a cross-batch duplicate of a batch-1
        doc. The second availableNow run on the SAME checkpoint must
        fold only the new file into state and surface the cross-batch
        group — the property a batch rescan doesn't need and streaming
        state exists for."""
        import pandas as pd

        from imitation_learning_data_pipeline_spark.streaming.incremental import (
            streaming_dedup_exact,
        )

        d = tmp_path / "docs"
        d.mkdir()
        ckpt = str(tmp_path / "ckpt")

        def _write(name, rows):
            pd.DataFrame(
                rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
            ).to_parquet(d / name, index=False)

        # doc_ids chosen % 10 not in {0, 5}: no planted-corpus copies —
        # state comes only from the duplicates we land ourselves.
        _write(
            "documents_b1.parquet",
            [
                (1, "alpha beta gamma", "en", "s", 16),
                (2, "Alpha, beta;; GAMMA", "en", "s", 19),  # in-batch dup of 1
                (3, "delta epsilon zeta", "en", "s", 18),
            ],
        )
        out1 = {
            r.canonical_doc: r.n_copies
            for r in streaming_dedup_exact(spark, str(d), checkpoint=ckpt).collect()
        }
        assert out1 == {1: 2}

        _write(
            "documents_b2.parquet",
            [(11, "delta epsilon ZETA!", "en", "s", 19)],  # cross-batch dup of 3
        )
        out2 = {
            r.canonical_doc: r.n_copies
            for r in streaming_dedup_exact(spark, str(d), checkpoint=ckpt).collect()
        }
        assert out2 == {1: 2, 3: 2}


class TestDedupEndToEnd:
    def test_reduction_stats_are_consistent(self, spark):
        from imitation_learning_data_pipeline_spark.plans.dedup import (
            pipeline_dedup_end_to_end,
        )

        r = pipeline_dedup_end_to_end(spark, SF_DIR).collect()[0]
        assert r.n_kept + r.n_dropped == r.n_docs
        assert r.n_dropped == r.n_dup_members - r.n_clusters
        assert 0 < r.n_clusters <= r.n_dup_members
        # every planted exact copy forms at least a 2-member cluster, so
        # duplicates must actually have been dropped
        assert r.n_dropped > 0


class TestPackSequences:
    def test_offsets_are_contiguous_and_spans_consistent(self, spark):
        from imitation_learning_data_pipeline_spark.plans.sampling import (
            _SEQ_LEN,
            pack_sequences,
        )

        rows = sorted(
            pack_sequences(spark, SF_DIR).collect(),
            key=lambda r: (r.source, r.doc_id),
        )
        expect_off = 0
        for r in rows:
            assert r.start_offset == expect_off  # no gaps, no overlaps
            assert 0 <= r.pos_in_seq < _SEQ_LEN
            assert r.seq_first == r.start_offset // _SEQ_LEN
            end = r.start_offset + max(r.n_tokens, 1) - 1
            assert r.seq_last == end // _SEQ_LEN
            assert r.seq_last >= r.seq_first
            expect_off += r.n_tokens
        # the packed stream covers ceil(total/L) sequences exactly
        total = expect_off
        assert max(r.seq_last for r in rows) == (total - 1) // _SEQ_LEN


class TestEmbeddingCosineLsh:
    def test_label_free_blocking_finds_planted_copies(self, spark):
        """Identical vectors share a bucket by construction → every
        planted exact copy is found without any label column."""
        from imitation_learning_data_pipeline_spark.plans.dedup import (
            dedup_embedding_cosine_lsh,
        )
        from imitation_learning_data_pipeline_spark.sources import load_table

        n = load_table(spark, SF_DIR, "embeddings").count()
        planted = {(v, v + 1000000) for v in range(0, n, 50)}
        pairs = {
            (r.vec_a, r.vec_b): r.cos_sim
            for r in dedup_embedding_cosine_lsh(spark, SF_DIR).collect()
        }
        assert planted <= set(pairs)
        assert all(abs(pairs[p] - 1.0) < 1e-6 for p in planted)


class TestConnectedComponents:
    def test_long_chain_converges_by_pointer_jumping(self, spark):
        """A 1000-edge chain has graph diameter 1000 ≫ max_iters=20;
        one-hop min-label propagation alone could never converge — the
        label-of-label jump must close it in O(log n) rounds."""
        from imitation_learning_data_pipeline_spark.plans.dedup import (
            connected_components,
        )

        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(1000)], "doc_a long, doc_b long"
        )
        out = connected_components(pairs).collect()
        assert len(out) == 1001
        assert all(r.cluster_id == 0 for r in out)
        assert all(r.cluster_size == 1001 for r in out)

    def test_two_components_and_min_labels(self, spark):
        from imitation_learning_data_pipeline_spark.plans.dedup import (
            connected_components,
        )

        pairs = spark.createDataFrame(
            [(5, 9), (9, 7), (100, 200)], "doc_a long, doc_b long"
        )
        got = {
            r.doc_id: (r.cluster_id, r.cluster_size)
            for r in connected_components(pairs).collect()
        }
        assert got == {
            5: (5, 3),
            7: (5, 3),
            9: (5, 3),
            100: (100, 2),
            200: (100, 2),
        }

    @pytest.mark.parametrize("seed", [7, 42, 1337])
    def test_random_graphs_match_union_find_reference(self, spark, seed):
        """Distributed labels == a trivial sequential union-find on
        random sparse graphs (structure-agnostic cross-check)."""
        import numpy as np

        from imitation_learning_data_pipeline_spark.plans.dedup import (
            connected_components,
        )

        rng = np.random.default_rng(seed)
        edges = [
            (int(a), int(b))
            for a, b in rng.integers(0, 60, size=(80, 2))
            if a != b
        ]
        parent = list(range(60))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        touched = {v for e in edges for v in e}
        expected = {}
        comp_min = {}
        for v in sorted(touched):
            comp_min.setdefault(find(v), v)
        for v in touched:
            expected[v] = comp_min[find(v)]
        sizes = {}
        for v in touched:
            sizes[expected[v]] = sizes.get(expected[v], 0) + 1

        pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
        got = {
            r.doc_id: (r.cluster_id, r.cluster_size)
            for r in connected_components(pairs).collect()
        }
        assert got == {v: (expected[v], sizes[expected[v]]) for v in touched}

    def test_nonconvergence_raises_instead_of_silent_partial_labels(self, spark):
        """ADVICE r4: running out of rounds must be loud."""
        from imitation_learning_data_pipeline_spark.plans.dedup import (
            connected_components,
        )

        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(200)], "doc_a long, doc_b long"
        )
        with pytest.raises(RuntimeError, match="did not converge"):
            connected_components(pairs, max_iters=2)


class TestCompaction:
    def test_many_small_files_become_few(self, spark, tmp_path):
        from imitation_learning_data_pipeline_spark.pipeline.compact import compact

        p = str(tmp_path / "t")
        # 40 tiny files via 40-way repartition
        spark.range(0, 4000).repartition(40).write.parquet(p)
        import os

        before = sum(
            f.endswith(".parquet") for f in os.listdir(p)
        )
        assert before == 40
        r = compact(spark, p, target_bytes=1 << 30)
        assert r["files_before"] == 40
        assert r["files_after"] == 1
        back = spark.read.parquet(p)
        assert back.count() == 4000
        assert back.agg({"id": "sum"}).collect()[0][0] == 4000 * 3999 // 2

    def test_partitioned_layout_survives(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from imitation_learning_data_pipeline_spark.pipeline.compact import compact

        p = str(tmp_path / "pt")
        (
            spark.range(0, 1000)
            .withColumn("part", (F.col("id") % 2).cast("string"))
            .repartition(20)
            .write.partitionBy("part")
            .parquet(p)
        )
        r = compact(spark, p, target_bytes=1 << 30, partition_col="part")
        assert r["files_after"] < r["files_before"]
        import os

        assert sorted(
            d for d in os.listdir(p) if d.startswith("part=")
        ) == ["part=0", "part=1"]
        assert spark.read.parquet(p).count() == 1000


class TestCountMinSketch:
    def test_never_underestimates_and_bounded_overestimate(self, spark):
        from imitation_learning_data_pipeline_spark.plans.relational2 import (
            _CMS_W,
            sketch_count_min,
        )

        rows = sketch_count_min(spark, SF_DIR).collect()
        assert rows
        total = sum(r.n_true for r in rows)
        for r in rows:
            assert r.n_cms >= r.n_true  # CMS can only overestimate
            # classic bound: overestimate ≤ ε·N with ε ≈ e/w, here with
            # generous slack (d=4 rows make the min tight)
            assert r.n_cms - r.n_true <= max(1, 3 * total // _CMS_W)
