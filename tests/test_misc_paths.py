"""Coverage for small previously-untested paths: spread() sizing, video
link modes, the fixed (non-parity) reindex ordering."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


class TestSpreadSizing:
    def test_small_file_gets_few_partitions(self, spark):
        from imitation_learning_data_pipeline_spark.sources.readers import (
            load_table,
            spread,
        )

        docs = load_table(spark, SF_DIR, "documents")  # ~tens of KB
        parts = spread(docs).rdd.getNumPartitions()
        # sized by bytes (32 KiB/task), never the full defaultParallelism
        assert 1 <= parts < spark.sparkContext.defaultParallelism

    def test_cap_at_default_parallelism(self, spark):
        from imitation_learning_data_pipeline_spark.sources.readers import (
            load_table,
            spread,
        )

        docs = load_table(spark, SF_DIR, "documents")
        parts = spread(docs, bytes_per_task=1).rdd.getNumPartitions()
        assert parts == spark.sparkContext.defaultParallelism

    def test_non_file_frame_falls_back_to_cap(self, spark):
        from imitation_learning_data_pipeline_spark.sources.readers import spread

        df = spark.range(10)
        assert (
            spread(df).rdd.getNumPartitions()
            == spark.sparkContext.defaultParallelism
        )


class TestLinkVideos:
    @pytest.fixture()
    def placed_index(self, spark, lerobot_fixture, tmp_path):
        from imitation_learning_data_pipeline_spark.pipeline import (
            align_transform,
            materialize,
        )

        frames = spark.read.parquet(str(lerobot_fixture / "data" / "chunk-000"))
        aligned = align_transform(frames)
        index = materialize(aligned, str(tmp_path / "out"))
        return index.collect(), str(lerobot_fixture / "videos"), str(tmp_path / "out")

    @pytest.mark.parametrize("mode", ["symlink", "hardlink", "copy", "manifest"])
    def test_link_modes(self, placed_index, tmp_path, mode):
        from imitation_learning_data_pipeline_spark.pipeline.materialize import link_videos

        rows, vroot, out = placed_index
        dest = str(tmp_path / f"dest_{mode}")
        placed = link_videos(rows, vroot, dest, mode=mode)
        assert placed  # episodes with videos exist
        src, arrow, dst = placed[0].partition(" -> ")
        assert os.path.exists(src)
        if mode == "manifest":
            assert not os.path.exists(dst)  # manifest-only places nothing
        else:
            assert os.path.exists(dst)
            if mode == "symlink":
                assert os.path.islink(dst)
            elif mode == "hardlink":
                assert os.stat(dst).st_ino == os.stat(src).st_ino
            else:  # copy
                assert not os.path.islink(dst)
                assert os.path.getsize(dst) == os.path.getsize(src)


class TestSplitStability:
    def test_splits_never_move_when_data_grows(self, spark):
        """The F5 contract: split is a pure function of (key, seed), so
        re-running materialize on a grown dataset never moves an existing
        episode between splits (unlike randomSplit)."""
        from imitation_learning_data_pipeline_spark.functions.hashing import split_assign

        small = spark.range(1000).select("id", split_assign("id").alias("s"))
        grown = spark.range(5000).select("id", split_assign("id").alias("s"))
        moved = (
            small.alias("a")
            .join(grown.alias("b"), "id")
            .filter(F.col("a.s") != F.col("b.s"))
            .count()
        )
        assert moved == 0


class TestAudioAndResize:
    def test_audio_features_match_numpy(self, spark):
        """The windowed RMS/ZCR math is real DSP — verify one document's
        features against a direct numpy computation."""
        import numpy as np

        from imitation_learning_data_pipeline_spark.operators.multimodal import (
            attach_payload,
            extract_audio_features,
        )
        from imitation_learning_data_pipeline_spark.sources.readers import load_table

        docs = load_table(spark, SF_DIR, "documents").limit(20)
        media = attach_payload(docs)
        feats = extract_audio_features(media, window=64, fake_decode=True)
        got = {
            (r.doc_id, r.window_idx): (r.rms, r.zcr, r.n_samples)
            for r in feats.collect()
        }
        assert got

        row = media.select("doc_id", "payload").first()
        pcm = np.frombuffer(bytes(row.payload), dtype=np.int8).astype(np.float64)
        pcm -= pcm.mean()
        seg = pcm[:64]
        want_rms = round(float(np.sqrt(np.mean(seg**2))), 4)
        assert got[(row.doc_id, 0)][0] == pytest.approx(want_rms, abs=1e-9)

    def test_audio_requires_fake_decode_flag(self, spark):
        from imitation_learning_data_pipeline_spark.operators.multimodal import (
            attach_payload,
            extract_audio_features,
        )
        from imitation_learning_data_pipeline_spark.sources.readers import load_table

        media = attach_payload(load_table(spark, SF_DIR, "documents").limit(2))
        with pytest.raises(Exception, match="NotImplementedError|decode"):
            extract_audio_features(media).collect()

    def test_resize_plan_preserves_aspect_and_fits(self, spark):
        from imitation_learning_data_pipeline_spark.operators.multimodal import (
            attach_payload,
            decode_media,
            plan_resize,
        )
        from imitation_learning_data_pipeline_spark.sources.readers import load_table

        docs = load_table(spark, SF_DIR, "documents").limit(50)
        decoded = decode_media(attach_payload(docs), fake_decode=True)
        plan = plan_resize(decoded, 224, 224).collect()
        assert plan
        for r in plan:
            assert r.out_w <= 224 and r.out_h <= 224
            assert max(r.out_w, r.out_h) in (224, 223)  # fits the long side
            # aspect preserved within floor-rounding error (small dims
            # can shift the ratio by ~1/out_h)
            assert abs(r.out_w / r.out_h - r.width / r.height) < 0.05
            assert r.pad_x >= 0 and r.pad_y >= 0


class TestReindexModes:
    def test_reindex_after_clean_has_no_gaps(self, spark, frames):
        """reindex_after_clean=True is the FIXED behaviour (null-drop
        before reindex): frame_index is gap-free. Parity mode (default)
        reindexes first, so the NaN-timestamp drop in ep 5 leaves a gap
        (SURVEY §8.3)."""
        from imitation_learning_data_pipeline_spark.pipeline import align_transform

        ep5 = F.col("episode_index") == 5

        fixed = (
            align_transform(frames, reindex_after_clean=True)
            .filter(ep5)
            .select("frame_index")
            .orderBy("frame_index")
            .collect()
        )
        fixed_idx = [r.frame_index for r in fixed]
        assert fixed_idx == list(range(len(fixed_idx)))  # contiguous

        parity = (
            align_transform(frames)
            .filter(ep5)
            .select("frame_index")
            .orderBy("frame_index")
            .collect()
        )
        parity_idx = [r.frame_index for r in parity]
        assert len(parity_idx) == len(fixed_idx)
        assert parity_idx != list(range(len(parity_idx)))  # the gap survives
