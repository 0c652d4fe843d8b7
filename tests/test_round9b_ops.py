"""Round-9 bloom sidecar (pipeline/bloom.py): per-file bloom filters
for point-lookup data skipping — build/probe parity, no-false-negative
guarantee, combined range+bloom pruning, and freshness through every
table-mutating path (DML commit deltas, journal recovery, compaction,
layout overwrites). Complements the manifest min/max stats tests
(test_scale_patterns.py), which cover the range-skipping half."""

from __future__ import annotations

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from imitation_learning_data_pipeline_spark.pipeline.bloom import (
    BLOOM_REL,
    apply_bloom_deltas,
    bloom_might_contain,
    build_file_blooms,
    has_blooms,
    probe_hashes,
    prune_files_bloom,
    read_bloom_sidecar,
    write_blooms,
)
from imitation_learning_data_pipeline_spark.pipeline.manifest import (
    extract_point_sets,
    extract_range_bounds,
    manifest_col_bounds,
    prune_files_combined,
    read_manifest_entries,
    read_where,
    write_manifest,
)
from imitation_learning_data_pipeline_spark.pipeline.merge import (
    cluster_write,
    delete_from,
    insert_into,
    merge_into,
)

N_FILES = 6


def _mk_table(spark, path, n=3000):
    """doc_id hash-scattered across N_FILES files: every file's
    [min, max] on doc_id spans ~the whole key space, so range stats
    CANNOT prune a point lookup — the bloom's job."""
    df = spark.range(n).select(
        F.concat(F.lit("doc-"), F.col("id")).alias("doc_id"),
        (F.col("id") % 40).alias("grp"),
        (F.col("id") * 2).alias("val"),
    )
    df.repartition(N_FILES, "doc_id").write.parquet(path)
    write_manifest(spark, path, stats_cols=["grp"])
    write_blooms(spark, path, ["doc_id"])


@pytest.fixture()
def table(spark, tmp_path):
    path = str(tmp_path / "tbl")
    _mk_table(spark, path)
    return path


def _file_of(spark, path, doc_id):
    """The relpath actually holding doc_id (ground truth via _metadata)."""
    fp = (
        spark.read.parquet(path)
        .filter(F.col("doc_id") == doc_id)
        .select(F.col("_metadata.file_path"))
        .collect()[0][0]
    )
    return fp.rsplit("/", 1)[-1]


class TestBloomPrune:
    def test_no_false_negative_and_skips(self, spark, table):
        """Every present key's true file is kept (no false negatives —
        the correctness half), and pruning skips files (the point)."""
        skipped_total = 0
        for i in (0, 7, 555, 2024, 2999):
            doc = f"doc-{i}"
            pr = prune_files_bloom(spark, table, {"doc_id": doc})
            assert pr is not None and pr["n_total"] == N_FILES
            truth = _file_of(spark, table, doc)
            assert any(rel.endswith(truth) for rel in pr["kept"]), doc
            skipped_total += pr["n_skipped"]
        # ~3k distinct over 6 files × 32k bits ⇒ fpp ≪ 1; near-perfect
        # skipping expected, but only a conservative floor is asserted
        assert skipped_total >= 5 * (N_FILES - 2)

    def test_absent_key_skips_everything(self, spark, table):
        pr = prune_files_bloom(spark, table, {"doc_id": "doc-nope"})
        # each file may false-positive independently (p ≪ 0.01 here)
        assert pr["n_skipped"] >= N_FILES - 1

    def test_unbloomed_column_falls_back(self, spark, table):
        assert prune_files_bloom(spark, table, {"val": 10}) is None

    def test_probe_hash_type_independence(self, spark, table):
        """Build casts to string; probing an int key with the int
        literal must match the build of an int column."""
        # val is a LongType column; bloom it and probe with Python int
        write_blooms(spark, table, ["val"])
        pr = prune_files_bloom(spark, table, {"val": 4048})
        truth = _file_of(spark, table, "doc-2024")  # val = 2*2024
        assert any(rel.endswith(truth) for rel in pr["kept"])

    def test_combined_range_and_bloom(self, spark, table):
        bounds = extract_range_bounds("grp >= 10 AND doc_id = 'doc-555'")
        pr = prune_files_combined(spark, table, bounds)
        assert pr is not None and pr["n_skipped"] >= N_FILES - 2
        truth = _file_of(spark, table, "doc-555")
        assert any(rel.endswith(truth) for rel in pr["kept"])


class TestReadWhereBloom:
    def test_equality_read_matches_plain(self, spark, table):
        for where in (
            "doc_id = 'doc-123'",
            "doc_id = 'doc-123' AND grp >= 0",
            "doc_id = 'doc-none-such'",
        ):
            got = sorted(
                (r["doc_id"], r["val"])
                for r in read_where(spark, table, where).collect()
            )
            want = sorted(
                (r["doc_id"], r["val"])
                for r in spark.read.parquet(table).filter(where).collect()
            )
            assert got == want, where

    def test_membership_proof(self, spark, table):
        """bloom_might_contain is True for every value actually built
        in, via the probe-hash path (build/probe parity end to end)."""
        side = read_bloom_sidecar(spark, table)
        rel = _file_of(spark, table, "doc-42")
        key = next(r for r in side["blooms"] if r.endswith(rel))
        (h,) = probe_hashes(spark, ["doc-42"])
        assert bloom_might_contain(side["blooms"][key]["doc_id"], h, side["k"])

    def test_timestamp_bloom_parity(self, spark, tmp_path):
        """ADVICE r9 (medium): the build hashes cast(ts AS STRING)
        ('2026-01-01 00:00:00', a space), but _parse_literal renders
        timestamp literals in ISO 'T' form — probing the raw string
        guaranteed a false negative, silently skipping EVERY matching
        file for `ts = timestamp'...'` on a bloomed timestamp column.
        The sidecar now records column types and the probe casts
        through them."""
        path = str(tmp_path / "tstbl")
        df = spark.range(3000).select(
            F.concat(F.lit("doc-"), F.col("id")).alias("doc_id"),
            F.to_timestamp(
                F.concat(
                    F.lit("2026-01-"),
                    F.lpad((F.col("id") % 28 + 1).cast("string"), 2, "0"),
                    F.lit(" 12:00:00"),
                )
            ).alias("ts"),
            (F.col("id") * 2).alias("val"),
        )
        df.repartition(N_FILES, "doc_id").write.parquet(path)
        write_manifest(spark, path)
        write_blooms(spark, path, ["ts"])
        side = read_bloom_sidecar(spark, path)
        assert side["types"]["ts"].startswith("timestamp")
        where = "ts = timestamp'2026-01-05 12:00:00'"
        got = read_where(spark, path, where).count()
        want = spark.read.parquet(path).filter(where).count()
        assert want > 0 and got == want
        # the prune itself keeps exactly the files that hold the value
        pts = extract_point_sets(where)
        pr = prune_files_bloom(spark, path, pts)
        assert pr is not None and len(pr["kept"]) >= 1
        truth = {
            p.rsplit("/", 1)[-1]
            for p in spark.read.parquet(path)
            .filter(where)
            .select("_metadata.file_path")
            .distinct()
            .toPandas()["file_path"]
        }
        kept_names = {rel.rsplit("/", 1)[-1] for rel in pr["kept"]}
        assert truth <= kept_names
        # a probe under a DIFFERENT session timezone must degrade to
        # always-keep (no pruning) instead of risking false negatives
        tz = spark.conf.get("spark.sql.session.timeZone")
        try:
            spark.conf.set(
                "spark.sql.session.timeZone",
                "America/Los_Angeles" if tz != "America/Los_Angeles" else "UTC",
            )
            assert prune_files_bloom(spark, path, pts) is None
        finally:
            spark.conf.set("spark.sql.session.timeZone", tz)


class TestBloomFreshness:
    def test_delete_point_lookup_touches_one_file(self, spark, table):
        res = delete_from(spark, table, "doc_id = 'doc-1500'")
        assert res == {
            "files_touched": 1,
            "files_added": 1,
            "rows_deleted": 1,
        }
        # sidecar folded the delta: rewritten file probes correctly for
        # a surviving neighbour key, and the dead rel is gone
        side = read_bloom_sidecar(spark, table)
        live = {r for r, _b in read_manifest_entries(spark, table)["files"]}
        assert set(side["blooms"]) == live
        assert read_where(spark, table, "doc_id = 'doc-1500'").count() == 0
        assert read_where(spark, table, "doc_id = 'doc-1501'").count() == 1

    def test_merge_keeps_blooms_fresh(self, spark, table):
        ups = spark.createDataFrame(
            [("doc-77", 7, 7000), ("doc-brandnew", 39, 1)],
            "doc_id string, grp int, val long",
        )
        merge_into(spark, table, ups, key="doc_id")
        assert read_where(spark, table, "doc_id = 'doc-brandnew'").count() == 1
        got = read_where(spark, table, "doc_id = 'doc-77'").collect()
        assert [(r["doc_id"], r["val"]) for r in got] == [("doc-77", 7000)]
        pr = prune_files_bloom(spark, table, {"doc_id": "doc-brandnew"})
        assert pr["n_skipped"] >= 1  # fresh file bloomed, others skip

    def test_insert_blooms_added_files(self, spark, table):
        insert_into(
            spark,
            table,
            spark.createDataFrame(
                [("doc-ins-1", 5, 10)], "doc_id string, grp int, val long"
            ),
        )
        pr = prune_files_bloom(spark, table, {"doc_id": "doc-ins-1"})
        assert pr is not None
        assert pr["n_skipped"] >= pr["n_total"] - 2
        assert read_where(spark, table, "doc_id = 'doc-ins-1'").count() == 1

    def test_cluster_write_restores_bloom_optin(self, spark, table):
        df = spark.read.parquet(table)
        cluster_write(df, table, by="doc_id", n_files=4)
        assert has_blooms(spark, table)
        side = read_bloom_sidecar(spark, table)
        assert side["cols"] == ["doc_id"]
        live = {r for r, _b in read_manifest_entries(spark, table)["files"]}
        assert set(side["blooms"]) == live
        assert read_where(spark, table, "doc_id = 'doc-9'").count() == 1

    def test_compact_rebuilds_blooms(self, spark, table):
        from imitation_learning_data_pipeline_spark.pipeline.compact import (
            compact,
        )

        compact(spark, table, target_bytes=1 << 30)
        side = read_bloom_sidecar(spark, table)
        live = {r for r, _b in read_manifest_entries(spark, table)["files"]}
        assert set(side["blooms"]) == live
        assert read_where(spark, table, "doc_id = 'doc-2222'").count() == 1

    def test_journal_recovery_rebuilds_blooms(self, spark, table):
        """A crash between commit and sidecar fold leaves stale blooms;
        recovery refreshes them wholesale (same rule as the manifest)."""
        from imitation_learning_data_pipeline_spark.pipeline.merge import (
            recover,
        )

        # corrupt the sidecar to a visibly-stale state, then plant an
        # empty pending journal the way the merge-journal tests do
        side_p = os.path.join(table, BLOOM_REL)
        side = json.load(open(side_p))
        side["blooms"] = {}
        json.dump(side, open(side_p, "w"))
        # hand-editing bypasses Hadoop's checksummed LocalFileSystem —
        # drop the stale sidecar crc or the next fs.open raises
        crc = os.path.join(table, "_manifest", ".blooms.json.crc")
        if os.path.exists(crc):
            os.remove(crc)
        pend = os.path.join(table, "__merge_pending.json")
        json.dump({"add": [], "delete": []}, open(pend, "w"))
        assert recover(spark, table)
        side2 = read_bloom_sidecar(spark, table)
        live = {r for r, _b in read_manifest_entries(spark, table)["files"]}
        assert set(side2["blooms"]) == live

    def test_delta_failure_degrades_to_keep(self, spark, table, tmp_path):
        """A bloom build failure for added files must not fail the
        commit: the rels stay bloom-less and pruning keeps them."""
        apply_bloom_deltas(
            spark, table, add=[("no-such-file.parquet", 1)], delete=[]
        )
        side = read_bloom_sidecar(spark, table)
        assert "no-such-file.parquet" not in side["blooms"]
        # prune treats the manifest-listed-but-bloomless rel as keep —
        # simulate by injecting it into the manifest copy
        pr = prune_files_bloom(spark, table, {"doc_id": "doc-1"})
        assert pr is not None  # probing still works on the rest


class TestPredicateShapes:
    """IN-list and LIKE-prefix conjuncts prune through the same
    machinery: IN folds to a [min, max] range AND a bloom point-set,
    LIKE 'p%' folds to the prefix string range."""

    def test_extract_in_list(self):
        assert extract_range_bounds("grp IN (7, 3, 5)") == {"grp": (3, 7)}
        assert extract_point_sets("grp IN (7, 3, 5)") == {"grp": [7, 3, 5]}
        assert extract_point_sets("doc_id = 'a'") == {"doc_id": ["a"]}
        # quoted comma must not split; non-literal members disable
        assert extract_point_sets("s IN ('a,b', 'c')") == {"s": ["a,b", "c"]}
        assert extract_point_sets("s IN (lower('A'), 'c')") == {}
        # NOT IN must contribute nothing
        assert extract_point_sets("grp NOT IN (1, 2)") == {}
        assert extract_range_bounds("grp NOT IN (1, 2)") == {}

    def test_between_mask_is_quote_aware(self):
        # ADVICE r9: the old mask rewrote "and" INSIDE string literals,
        # corrupting the point value ('between 1 \x00 2') and making
        # bloom/stats pruning skip files that contain the real value.
        assert extract_point_sets("name = 'between 1 and 2'") == {
            "name": ["between 1 and 2"]
        }
        assert extract_range_bounds("name = 'between 1 and 2'") == {
            "name": ("between 1 and 2", "between 1 and 2")
        }
        # a literal containing BETWEEN-ish text followed by a REAL
        # top-level AND still splits into two conjuncts
        assert extract_point_sets("name = 'between x' and id = 7") == {
            "name": ["between x"],
            "id": [7],
        }
        # genuine BETWEEN still masks — numeric and string bounds
        assert extract_range_bounds("id between 10 and 90") == {
            "id": (10, 90)
        }
        assert extract_range_bounds("s between 'a' and 'm'") == {
            "s": ("a", "m")
        }
        assert extract_range_bounds(
            "a between 1 and 2 and b between 3 and 4"
        ) == {"a": (1, 2), "b": (3, 4)}
        # NOT BETWEEN and paren-wrapped BETWEEN contribute nothing
        # (kept-superset safe), and don't derail later conjuncts
        assert extract_range_bounds("a not between 1 and 2") == {}
        assert extract_range_bounds("(a between 1 and 2) and c >= 9") == {
            "c": (9, None)
        }

    def test_extract_like_prefix(self):
        assert extract_range_bounds("s LIKE 'abc%'") == {
            "s": ("abc", "abd")
        }
        # non-prefix patterns contribute nothing
        for p in ("'%abc'", "'a%c'", "'a_c%'", "'%'"):
            assert extract_range_bounds(f"s LIKE {p}") == {}, p
        assert extract_range_bounds("s NOT LIKE 'abc%'") == {}

    def test_in_list_bloom_prune(self, spark, table):
        pr = prune_files_bloom(
            spark, table, {"doc_id": ["doc-5", "doc-777", "doc-2900"]}
        )
        assert pr["n_skipped"] >= 1
        for doc in ("doc-5", "doc-777", "doc-2900"):
            truth = _file_of(spark, table, doc)
            assert any(rel.endswith(truth) for rel in pr["kept"]), doc

    def test_read_where_in_and_like(self, spark, table):
        for where in (
            "doc_id IN ('doc-5', 'doc-777', 'doc-nope')",
            "doc_id LIKE 'doc-29%' AND grp <= 39",
            "doc_id IN ('doc-8') AND grp >= 0",
        ):
            got = sorted(
                r["doc_id"]
                for r in read_where(spark, table, where).collect()
            )
            want = sorted(
                r["doc_id"]
                for r in spark.read.parquet(table).filter(where).collect()
            )
            assert got == want, where

    def test_dml_in_list_prunes(self, spark, table):
        res = delete_from(
            spark, table, "doc_id IN ('doc-100', 'doc-200', 'doc-300')"
        )
        assert res["rows_deleted"] == 3
        assert res["files_touched"] <= 3
        assert (
            spark.read.parquet(table)
            .filter("doc_id IN ('doc-100', 'doc-200', 'doc-300')")
            .count()
            == 0
        )


class TestManifestColBounds:
    def test_metadata_only_min_max(self, spark, table):
        got = manifest_col_bounds(spark, table, "grp")
        assert got == (0, 39)

    def test_unknown_cases_return_none(self, spark, table):
        assert manifest_col_bounds(spark, table, "doc_id") is None  # no stats
        assert manifest_col_bounds(spark, str(table) + "x", "grp") is None

    def test_fresh_through_dml(self, spark, table):
        insert_into(
            spark,
            table,
            spark.createDataFrame(
                [("doc-hi", 99, 0)], "doc_id string, grp int, val long"
            ),
        )
        assert manifest_col_bounds(spark, table, "grp") == (0, 99)
