"""Round-9 iterative graph ops (plans/graph.py): PageRank closed forms,
mass conservation, dangling redistribution, argument guards."""

from __future__ import annotations

import pytest

from imitation_learning_data_pipeline_spark.plans.graph import pagerank


def _pr(spark, edge_list, **kw):
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    return {
        r["node"]: r["rank"] for r in pagerank(edges, **kw).collect()
    }


class TestPagerank:
    def test_cycle_is_uniform(self, spark):
        # directed 5-cycle: perfectly symmetric, rank stays 1/5 exactly
        n = 5
        got = _pr(spark, [(i, (i + 1) % n) for i in range(n)], iters=7)
        for v in got.values():
            assert v == pytest.approx(1 / n, abs=1e-12)

    def test_mass_conserved(self, spark):
        got = _pr(
            spark,
            [(0, 1), (1, 2), (2, 0), (3, 0), (4, 0), (0, 3)],
            iters=9,
        )
        assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)

    def test_hub_attracts_rank(self, spark):
        # every node links to 0; 0 links back to 1 only. The 0<->1
        # 2-cycle makes the power method oscillate with period 2, so
        # convergence to the analytic fixed point (r0 ≈ .473 > r1 ≈
        # .427) needs the d^t envelope to decay — run it down.
        edges = [(i, 0) for i in range(1, 6)] + [(0, 1)]
        got = _pr(spark, edges, iters=60)
        assert got[0] == max(got.values())
        assert got[0] == pytest.approx(0.13125 / 0.2775, abs=1e-4)
        assert got[0] > 3 * got[5]

    def test_dangling_matches_reference_loop(self, spark):
        # a -> b, b dangling: compare against a tiny driver-side
        # reference implementation of the same fixed-point recurrence
        d, iters = 0.85, 6
        ra = rb = 0.5
        for _ in range(iters):
            dang = rb
            ra, rb = (
                (1 - d) / 2 + d * (dang / 2),
                (1 - d) / 2 + d * (ra + dang / 2),
            )
        got = _pr(spark, [(0, 1)], damping=d, iters=iters)
        assert got[0] == pytest.approx(ra, abs=1e-12)
        assert got[1] == pytest.approx(rb, abs=1e-12)
        assert sum(got.values()) == pytest.approx(1.0, abs=1e-12)

    def test_personalized_concentrates_on_seeds(self, spark):
        # two disjoint 3-cycles; seeding in one leaves the other at
        # EXACTLY zero (no teleport there, no path in)
        cyc = lambda b: [(b + i, b + (i + 1) % 3) for i in range(3)]
        edges = spark.createDataFrame(
            cyc(0) + cyc(10), "src long, dst long"
        )
        seeds = spark.createDataFrame([(0,)], "node long")
        got = {
            r["node"]: r["rank"]
            for r in pagerank(edges, iters=20, seeds=seeds).collect()
        }
        assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
        assert all(got[n] == 0.0 for n in (10, 11, 12))
        assert got[0] == max(got.values())  # the seed keeps the most

    def test_personalized_seed_guard(self, spark):
        edges = spark.createDataFrame([(0, 1)], "src long, dst long")
        seeds = spark.createDataFrame([(99,)], "node long")
        with pytest.raises(ValueError, match="no seed"):
            pagerank(edges, seeds=seeds)

    def test_cli_pagerank(self, spark, tmp_path, capsys):
        import json

        from imitation_learning_data_pipeline_spark.cli import main

        p = str(tmp_path / "edges")
        spark.createDataFrame(
            [(i, 0) for i in range(1, 6)] + [(0, 1)], "src long, dst long"
        ).write.parquet(p)
        rc = main(["graph", "--edges", p, "--iters", "20", "--top", "3"])
        rows = [
            json.loads(line)
            for line in capsys.readouterr().out.strip().splitlines()
        ]
        assert rc == 0 and len(rows) == 3
        assert rows[0]["node"] in (0, 1)  # the hub pair dominates

    def test_guards(self, spark):
        edges = spark.createDataFrame([(0, 1)], "src long, dst long")
        with pytest.raises(ValueError, match="iters"):
            pagerank(edges, iters=0)
        with pytest.raises(ValueError, match="damping"):
            pagerank(edges, damping=1.5)
        with pytest.raises(ValueError, match="empty"):
            pagerank(edges.filter("src < 0"))

    def test_one_exchange_per_iteration(self, spark):
        # the r10 partition-reuse claim, asserted: with the edge frame
        # pre-partitioned by src and AQE scoped off, each iteration's
        # only shuffle is the contribution aggregation — the |E|-sized
        # rank-join and node-side exchanges are elided by the preserved
        # checkpoint layouts (4 exchanges/iter without this)
        from imitation_learning_data_pipeline_spark.plans import graph

        n = 500
        edges = spark.range(n).selectExpr(
            "id AS src", f"(id * 31 + 7) % {n} AS dst"
        )
        probe: list[int] = []
        graph._iteration_exchange_probe = probe
        try:
            pagerank(edges, iters=3)
        finally:
            graph._iteration_exchange_probe = None
        assert probe == [1, 1, 1]

    def test_aqe_conf_restored(self, spark):
        before = spark.conf.get("spark.sql.adaptive.enabled")
        edges = spark.createDataFrame([(0, 1)], "src long, dst long")
        pagerank(edges, iters=2)
        assert spark.conf.get("spark.sql.adaptive.enabled") == before
        # error path restores too
        with pytest.raises(ValueError, match="no seed"):
            pagerank(
                edges, seeds=spark.createDataFrame([(99,)], "node long")
            )
        assert spark.conf.get("spark.sql.adaptive.enabled") == before
