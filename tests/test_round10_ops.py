"""Round-10 ops: pluggable lock backends (pipeline/locks.py) — the
double-grant defense for object stores (r9 verdict item 5).

The fake filesystem here simulates the object-store failure mode the
default backend warns about: ``create(path, overwrite=False)``
implemented as check-then-PUT, so it NEVER refuses — two contenders
both "win". The election backend must refuse the second writer
deterministically on exactly that store.
"""

from __future__ import annotations

import json

import pytest

from imitation_learning_data_pipeline_spark.pipeline.locks import (
    CreateExclusiveBackend,
    ElectionBackend,
    ExternalCASBackend,
    LockConflict,
    get_lock_backend,
    set_lock_backend,
)


class FakePath:
    def __init__(self, s):
        self.s = str(s)

    def getParent(self):
        return FakePath(self.s.rsplit("/", 1)[0])

    def getName(self):
        return self.s.rsplit("/", 1)[-1]

    def toString(self):
        return self.s


class _FakeStream:
    def __init__(self, fs, path):
        self.fs, self.path, self.buf = fs, path, b""

    def write(self, data):
        self.buf += bytes(data)

    def close(self):
        self.fs.files[self.path] = (self.buf, self.fs.clock)


class DoubleGrantFS:
    """The hostile store: create(overwrite=False) always succeeds —
    a second creator silently clobbers the first (s3a-style
    check-then-PUT). LIST/exists are strongly consistent, as on real
    S3 since 2020."""

    def __init__(self):
        import time

        self.files: dict[str, tuple[bytes, float]] = {}
        # real wall-clock mtimes: candidate TTL expiry compares against
        # time.time(), so planted files must look freshly written
        self.clock = time.time()

    def exists(self, p):
        return p.s in self.files or any(
            k.startswith(p.s.rstrip("/") + "/") for k in self.files
        )

    def delete(self, p, recursive=False):
        return self.files.pop(p.s, None) is not None

    def create(self, p, overwrite):
        # the double grant: overwrite=False is NOT honored
        return _FakeStream(self, p.s)

    def getFileStatus(self, p):
        fs = self

        class St:
            def getPath(self):
                return p

            def getModificationTime(self):
                return fs.files[p.s][1] * 1000.0

        return St()

    def listStatus(self, parent):
        out = []
        prefix = parent.s.rstrip("/") + "/"
        for path, (_, mtime) in list(self.files.items()):
            if path.startswith(prefix) and "/" not in path[len(prefix):]:
                fp, mt = FakePath(path), mtime

                class St:
                    def __init__(self, fp, mt):
                        self._fp, self._mt = fp, mt

                    def getPath(self):
                        return self._fp

                    def getModificationTime(self):
                        return self._mt * 1000.0

                out.append(St(fp, mt))
        return out


class _FakeFsElection(ElectionBackend):
    """Election over the fake store: reads the lock token straight out
    of the dict (the real backend reads through commons-io)."""

    @staticmethod
    def _read_lock_token(spark, fs, lp):
        try:
            return json.loads(fs.files[lp.s][0].decode()).get("token")
        except Exception:
            return None


LOCK = "/tbl/data__maintenance_lock"


class TestLockBackends:
    def test_default_backend_double_grants_on_fake_store(self):
        # the documented hole, demonstrated: both writers acquire
        fs = DoubleGrantFS()
        b = CreateExclusiveBackend()
        b.acquire(None, fs, FakePath, LOCK, "merge", None)
        b.acquire(None, fs, FakePath, LOCK, "merge", None)  # no error!
        assert LOCK in fs.files

    def test_election_refuses_second_writer(self):
        fs = DoubleGrantFS()
        b = _FakeFsElection(settle_s=0)
        b.acquire(None, fs, FakePath, LOCK, "merge", None)
        assert LOCK in fs.files
        with pytest.raises(LockConflict):
            b.acquire(None, fs, FakePath, LOCK, "compact", None)
        # loser cleaned up its candidate
        assert [k for k in fs.files if "__cand." in k] == []
        b.release(fs, FakePath, LOCK)
        assert LOCK not in fs.files
        b.acquire(None, fs, FakePath, LOCK, "merge", None)  # reacquirable

    def test_election_concurrent_rival_smaller_token_loses_us(self):
        # both candidates land before either lists: rival's smaller
        # token wins the total order, our contender backs off without
        # ever creating the lock
        fs = DoubleGrantFS()
        b = _FakeFsElection(settle_s=0)
        fs.files[LOCK + "__cand.0000000000.rival"] = (b"{}", fs.clock)
        with pytest.raises(LockConflict):
            b.acquire(None, fs, FakePath, LOCK, "merge", None)
        assert LOCK not in fs.files
        # our candidate removed; the rival's is not ours to delete
        assert list(fs.files) == [LOCK + "__cand.0000000000.rival"]

    def test_election_concurrent_rival_larger_token_we_win(self):
        fs = DoubleGrantFS()
        b = _FakeFsElection(settle_s=0)
        rival = LOCK + "__cand.9999999999999.999.rival"
        fs.files[rival] = (b"{}", fs.clock)
        b.acquire(None, fs, FakePath, LOCK, "merge", None)
        assert LOCK in fs.files
        assert [k for k in fs.files if "__cand." in k] == [rival]

    def test_election_yields_to_pause_straddling_rival(self):
        # the residual lease-free window: a smaller token arrives AFTER
        # our election list but BEFORE our create — post-create
        # verification must tear our lock back down and back off
        fs = DoubleGrantFS()

        class Racy(_FakeFsElection):
            calls = 0

            def _list_candidates(self, fs_, jvm_path, lock_file):
                toks = super()._list_candidates(fs_, jvm_path, lock_file)
                Racy.calls += 1
                if Racy.calls == 2:  # the post-create verification list
                    toks = toks + ["0000000000.rival"]
                return toks

        with pytest.raises(LockConflict):
            Racy(settle_s=0).acquire(None, fs, FakePath, LOCK, "merge", None)
        assert LOCK not in fs.files  # own lock removed, not left dangling
        assert [k for k in fs.files if "__cand." in k] == []

    def test_election_stale_candidate_expires(self):
        fs = DoubleGrantFS()
        b = _FakeFsElection(settle_s=0, cand_ttl_s=60)
        # a crashed contender's 2-minute-old minimal candidate
        fs.files[LOCK + "__cand.0000000000.dead"] = (b"{}", fs.clock - 120)
        b.acquire(None, fs, FakePath, LOCK, "merge", None)  # not wedged
        assert LOCK in fs.files
        assert [k for k in fs.files if "__cand." in k] == []

    def test_external_cas_backend(self):
        store: dict[str, bytes] = {}
        ages: dict[str, float] = {}

        def put_if_absent(key, payload):
            if key in store:
                return False
            store[key] = payload
            ages[key] = 0.0
            return True

        b = ExternalCASBackend(
            put_if_absent, lambda k: store.pop(k, None), ages.get
        )
        b.acquire(None, None, FakePath, LOCK, "merge", None)
        with pytest.raises(LockConflict):
            b.acquire(None, None, FakePath, LOCK, "merge", None)
        b.release(None, FakePath, LOCK)
        b.acquire(None, None, FakePath, LOCK, "merge", None)
        # stale takeover through the service's age callable
        ages[LOCK] = 999.0
        b.acquire(None, None, FakePath, LOCK, "merge", stale_lock_s=60)
        # no age callable → takeover must refuse loudly, not guess
        b2 = ExternalCASBackend(put_if_absent, lambda k: store.pop(k, None))
        with pytest.raises(ValueError, match="age_s"):
            b2.acquire(None, None, FakePath, LOCK, "x", stale_lock_s=60)

    def test_backend_wired_through_real_ops(self, spark, tmp_path):
        # end-to-end on the real Hadoop local FS: with the election
        # backend installed process-wide, _acquire_lock/release_lock
        # (the choke points every DML/maintenance op uses) go through
        # the election protocol
        from imitation_learning_data_pipeline_spark.pipeline.compact import (
            ConcurrentMaintenanceError,
            _acquire_lock,
            _fs,
            release_lock,
        )

        tbl = str(tmp_path / "tbl")
        fs, _ = _fs(spark, tbl)
        jvm_path = spark.sparkContext._jvm.org.apache.hadoop.fs.Path
        set_lock_backend(ElectionBackend(settle_s=0.0))
        try:
            _acquire_lock(spark, fs, jvm_path, tbl, "merge")
            with pytest.raises(ConcurrentMaintenanceError):
                _acquire_lock(spark, fs, jvm_path, tbl, "compact")
            assert release_lock(spark, tbl) is True
            _acquire_lock(spark, fs, jvm_path, tbl, "merge")
            # stale takeover still works through the backend
            _acquire_lock(spark, fs, jvm_path, tbl, "merge", stale_lock_s=0.0)
            assert release_lock(spark, tbl) is True
        finally:
            set_lock_backend(None)
        assert type(get_lock_backend()) is CreateExclusiveBackend


# --- alter_matview: spec evolution without full recompute -------------------


def _alter_rows(spark, lo, hi):
    from pyspark.sql import functions as F

    return spark.range(lo, hi).select(
        F.concat(F.lit("doc-"), F.col("id")).alias("doc_id"),
        (F.col("id") % 4).alias("grp"),
        (F.col("id") % 100 / 2.0).alias("v"),
        (F.col("id") % 7).cast("double").alias("w"),
    )


def _mv_rows_dict(spark, path, cols):
    from imitation_learning_data_pipeline_spark.pipeline.matview import (
        read_matview,
    )

    out = {}
    for r in read_matview(spark, path).collect():
        out[r["grp"]] = tuple(
            round(r[c], 6) if isinstance(r[c], float) else r[c] for c in cols
        )
    return out


class TestAlterMatview:
    CMP = ["n_rows", "v_n", "v_sum", "w_n", "w_sum", "w_var",
           "doc_id_distinct_est", "w_p50", "w_p95"]

    @pytest.fixture()
    def base(self, spark, tmp_path):
        p = str(tmp_path / "base")
        _alter_rows(spark, 0, 4000).repartition(4).write.parquet(p)
        return p

    def _create_small(self, spark, base, path):
        from imitation_learning_data_pipeline_spark.pipeline.matview import (
            create_matview,
        )

        create_matview(spark, base, path, ["grp"], ["v"])

    def _create_full(self, spark, base, path):
        from imitation_learning_data_pipeline_spark.pipeline.matview import (
            create_matview,
        )

        # n_bins left at the default: alter's backfill must reuse the
        # ORIGINAL spec's bin count (histograms with mismatched bins
        # can never merge), so the reference view matches it too
        create_matview(
            spark,
            base,
            path,
            ["grp"],
            ["v", "w"],
            distinct_cols=["doc_id"],
            quantile_cols={"w": (0.0, 7.0)},
        )

    def test_altered_equals_rebuilt(self, spark, tmp_path, base):
        from imitation_learning_data_pipeline_spark.pipeline.matview import (
            alter_matview,
        )

        mv, mv2 = str(tmp_path / "mv"), str(tmp_path / "mv2")
        self._create_small(spark, base, mv)
        res = alter_matview(
            spark,
            mv,
            add_metrics=["w"],
            add_distinct=["doc_id"],
            add_quantiles={"w": (0.0, 7.0)},
        )
        assert res["added"] == ["w", "doc_id", "w"]
        # the pruning claim, enforced by construction: the backfill scan
        # projects ONLY group + new columns — the old metric v is absent
        assert res["backfill_columns"] == ["doc_id", "grp", "w"]
        self._create_full(spark, base, mv2)
        assert _mv_rows_dict(spark, mv, self.CMP) == _mv_rows_dict(
            spark, mv2, self.CMP
        )

    def test_refresh_after_alter_stays_incremental(self, spark, tmp_path, base):
        import os

        from imitation_learning_data_pipeline_spark.pipeline import matview as m
        from imitation_learning_data_pipeline_spark.pipeline.matview import (
            alter_matview,
            refresh_matview,
        )
        from imitation_learning_data_pipeline_spark.pipeline.merge import (
            insert_into,
        )

        mv, mv2 = str(tmp_path / "mv"), str(tmp_path / "mv2")
        self._create_small(spark, base, mv)
        alter_matview(
            spark,
            mv,
            add_metrics=["w"],
            add_distinct=["doc_id"],
            add_quantiles={"w": (0.0, 7.0)},
        )
        before = set(os.listdir(base))
        insert_into(spark, base, _alter_rows(spark, 4000, 4500))
        new_files = {
            f
            for f in os.listdir(base)
            if f.endswith(".parquet") and f not in before
        }
        seen = {}
        orig = m._partials

        def spy(spark_, spec, df):
            seen["files"] = {p.rsplit("/", 1)[-1] for p in df.inputFiles()}
            return orig(spark_, spec, df)

        m._partials = spy
        try:
            r = refresh_matview(spark, mv)
        finally:
            m._partials = orig
        # refresh folds the GROWN spec but reads only the appended files
        assert r["files_new"] == len(new_files) and not r["rebuilt"]
        assert seen["files"] == new_files
        self._create_full(spark, base, mv2)
        # exact stats match bit-for-bit; the HLL estimate is compared
        # with tolerance (a union of sketches is not bit-identical to a
        # one-shot sketch over the same items, by design)
        exact = [c for c in self.CMP if c != "doc_id_distinct_est"]
        assert _mv_rows_dict(spark, mv, exact) == _mv_rows_dict(
            spark, mv2, exact
        )
        from imitation_learning_data_pipeline_spark.pipeline.matview import (
            read_matview,
        )

        for row in read_matview(spark, mv).collect():
            assert abs(row["doc_id_distinct_est"] - 1125) / 1125 < 0.05

    def test_alter_guards(self, spark, tmp_path, base):
        from imitation_learning_data_pipeline_spark.pipeline.matview import (
            BaseMutatedError,
            alter_matview,
        )

        mv = str(tmp_path / "mv")
        self._create_small(spark, base, mv)
        with pytest.raises(ValueError, match="nothing to add"):
            alter_matview(spark, mv)
        with pytest.raises(ValueError, match="already in the spec"):
            alter_matview(spark, mv, add_metrics=["v"])
        with pytest.raises(ValueError, match="already in the spec"):
            alter_matview(spark, mv, add_metrics=["grp"])
        # quantile state for an EXISTING metric column is legal (the
        # r9 verdict scenario) — partial names differ by suffix
        res = alter_matview(spark, mv, add_quantiles={"v": (0.0, 50.0)})
        assert res["backfill_columns"] == ["grp", "v"]
        from imitation_learning_data_pipeline_spark.pipeline.matview import (
            read_matview,
        )

        row = read_matview(spark, mv).first()
        assert row["v_p50"] is not None and 0.0 <= row["v_p50"] <= 50.0

    def test_alter_refuses_mutated_base(self, spark, tmp_path, base):
        from imitation_learning_data_pipeline_spark.pipeline.matview import (
            BaseMutatedError,
            alter_matview,
        )
        from imitation_learning_data_pipeline_spark.pipeline.merge import (
            delete_from,
        )

        mv = str(tmp_path / "mv")
        self._create_small(spark, base, mv)
        delete_from(spark, base, "grp = 1")  # COW rewrite under the view
        with pytest.raises(BaseMutatedError):
            alter_matview(spark, mv, add_metrics=["w"])
