"""Round-15 surfaces: RFC 9309 percent-escape normalization, the
zero-shuffle robots verdict plan, the query-only URL path fix, and the
row-preservation guarantee the r14 groupBy shape could not give."""

import pytest


class TestBenchCalibration:
    """bench.py host-calibration + like-for-like helpers (VERDICT r14
    #1) — pure functions, no Spark session."""

    def test_parse_prev_bench_prefers_parsed(self):
        from bench import parse_prev_bench

        rec = {
            "parsed": {"queries": {"a": 1.0}, "calibration_s": 2.0},
            "tail": '{"queries": {"b": 9.9}}',
        }
        assert parse_prev_bench(rec)["queries"] == {"a": 1.0}

    def test_parse_prev_bench_tail_fallback(self):
        from bench import parse_prev_bench

        # truncated first line (driver keeps only the END of stdout),
        # complete final line — the real r14 artifact shape
        rec = {
            "parsed": None,
            "tail": 'zscore": 0.6, "x": 1}}\n'
            '{"metric": "headline_cold_task_cpu_total", '
            '"queries": {"q1": 0.4}, "calibration_s": 0.5}\n',
        }
        got = parse_prev_bench(rec)
        assert got["queries"] == {"q1": 0.4}
        assert parse_prev_bench({"tail": "garbage\nnot json"}) is None

    def test_latest_bench_file_real_repo(self):
        import re

        from bench import latest_bench_file

        got = latest_bench_file("/root/repo")
        assert got is not None
        assert re.search(r"BENCH_r\d+[a-z]?\.json$", got)
        # r14 is the highest at the time this test was written; any
        # later round may only move it FORWARD
        n = int(re.search(r"BENCH_r(\d+)", got).group(1))
        assert n >= 14

    def test_like_for_like_normalization(self):
        from bench import like_for_like

        prev = {
            "queries": {"a": 1.0, "b": 2.0, "c": 4.0},
            "calibration_s": 0.5,
        }
        # uniform 1.2x drift, calibration drifted the same way →
        # normalized median collapses to 1.0
        cur = {"a": 1.2, "b": 2.4, "c": 4.8, "new_query": 9.9}
        got = like_for_like(cur, 0.6, prev, "/x/BENCH_r14.json")
        assert got["n_common"] == 3
        assert got["median_warm_ratio"] == 1.2
        assert got["calibration_ratio"] == 1.2
        assert got["median_normalized_ratio"] == 1.0
        assert got["prev"] == "BENCH_r14.json"
        # prev without a calibration row: raw ratios only
        got2 = like_for_like(cur, 0.6, {"queries": prev["queries"]}, None)
        assert got2["calibration_ratio"] is None
        assert got2["median_normalized_ratio"] is None
        assert like_for_like(cur, 0.6, None, None) is None
        assert like_for_like({}, 0.6, prev, None) is None


RUSSIAN = (
    "Комиссия рассмотрела все предложения и решила, что результаты "
    "должны быть опубликованы, потому что сообщество ждет ответа о "
    "правилах и о том, как они будут применяться к делам, которые "
    "открыты с начала года."
)
DUTCH = (
    "De commissie heeft alle voorstellen bekeken en besloten dat de "
    "resultaten moeten worden gepubliceerd omdat de gemeenschap wacht "
    "op een antwoord over het beleid en hoe het zal worden toegepast "
    "op de zaken die sinds het begin van het jaar open zijn."
)
POLISH = (
    "Komisja rozpatrzyła wszystkie wnioski i zdecydowała, że wyniki "
    "muszą zostać opublikowane, ponieważ społeczność czeka na "
    "odpowiedź w sprawie polityki i tego, jak będzie ona stosowana do "
    "spraw, które są otwarte od początku roku."
)


class TestMainContentNewLanguages:
    """VERDICT r14 #6: nl/pl/ru function-word lists — same per-page
    pick + retention contract as the r14 six."""

    def _extract(self, paras, **kw):
        from imitation_learning_data_pipeline_spark.operators.html_text import (
            extract_main_text,
        )
        from tests.test_round14_ops import _page

        return extract_main_text(_page(paras), **kw)

    @pytest.mark.parametrize(
        "lang,para,opening",
        [
            ("ru", RUSSIAN, "Комиссия"),
            ("nl", DUTCH, "De commissie"),
            ("pl", POLISH, "Komisja"),
        ],
    )
    def test_prose_retained(self, lang, para, opening):
        out = self._extract([para, para])
        assert out["stopword_lang"] == lang
        assert out["no_stopword_signal"] is False
        assert out["n_good_blocks"] == 2
        assert opening in out["main_text"]
        assert "home" not in out["main_text"]
        assert "©" not in out["main_text"]

    def test_pinned_russian_applies(self):
        out = self._extract([RUSSIAN, RUSSIAN], lang="ru")
        assert out["stopword_lang"] == "ru"
        assert out["no_stopword_signal"] is False

    def test_earlier_languages_not_shadowed(self):
        """The new lists share words with the old ones (nl/de overlap
        heavily) — German prose must still pick 'de'."""
        from tests.test_round14_ops import GERMAN

        out = self._extract([GERMAN, GERMAN])
        assert out["stopword_lang"] == "de"


class TestCdxPlanNormalizedExclude:
    """ADVICE r14 (medium): --exclude-docs against a corpus ingested
    with --normalize-urls must anti-join on normalized keys or every
    already-held capture is silently re-planned and re-fetched."""

    def test_normalized_corpus_matches(self, spark, tmp_path, capsys):
        import json

        from imitation_learning_data_pipeline_spark.cli import main
        from tests.test_round14_ops import TestCdxPlan

        line = TestCdxPlan()._line
        idx = tmp_path / "idx"
        idx.mkdir()
        (idx / "p.cdxj").write_text(
            # raw CDX form: uppercase host, :80, tracking param — the
            # normalized corpus stores http://a.com/old
            line("com,a)/old", "20260101000000",
                 "http://A.COM:80/old?utm_source=x")
            + "\n"
            + line("com,a)/new", "20260101000000", "http://a.com/new")
            + "\n"
        )
        docs = str(tmp_path / "docs")
        spark.createDataFrame(
            [(1, "http://a.com/old", "already ingested")],
            "doc_id long, url string, text string",
        ).write.parquet(docs)

        # WITHOUT the flag the raw url never matches: both captures
        # planned (the ADVICE failure mode, now an explicit choice)
        out_raw = str(tmp_path / "plan_raw")
        assert main([
            "cdx-plan", "--input", str(idx), "--out", out_raw,
            "--exclude-docs", docs,
        ]) == 0
        assert json.loads(
            capsys.readouterr().out.strip().splitlines()[-1]
        )["captures"] == 2

        # WITH --normalize-urls the held capture drops, and the
        # manifest keeps the RAW url (fetcher needs exact coordinates)
        out = str(tmp_path / "plan")
        assert main([
            "cdx-plan", "--input", str(idx), "--out", out,
            "--exclude-docs", docs, "--normalize-urls",
        ]) == 0
        assert json.loads(
            capsys.readouterr().out.strip().splitlines()[-1]
        )["captures"] == 1
        rows = spark.read.parquet(out).collect()
        assert [r["url"] for r in rows] == ["http://a.com/new"]
        assert "__k" not in spark.read.parquet(out).columns


class TestRangedFetchOpener:
    """read_warc_ranges' opener seam: one open per consecutive file
    run, every read bounded by a manifest length — the contract an
    object-store client relies on."""

    def test_counting_opener(self, spark, tmp_path):
        import os

        from imitation_learning_data_pipeline_spark.plans.web import (
            build_warc_corpus,
        )
        from imitation_learning_data_pipeline_spark.sources.cdx import (
            read_cdxj,
        )
        from imitation_learning_data_pipeline_spark.sources.warc import (
            read_warc_ranges,
        )

        corpus = build_warc_corpus(
            "/root/testdata/sf0.001", out_root=str(tmp_path / "w"),
            n_files=2, index=True,
        )
        idx = read_cdxj(spark, os.path.join(corpus, "index.cdxj"))
        manifest = idx.filter("status = 200").select(
            "filename", "offset", "length"
        )
        man_rows = manifest.collect()
        n_files = len({r["filename"] for r in man_rows})
        max_len = max(r["length"] for r in man_rows)
        assert n_files == 2 and len(man_rows) > n_files

        log = str(tmp_path / "opener.log")

        # test double defined INSIDE the test so cloudpickle ships it
        # by value (the tests package is not importable on workers):
        # append-log every open and read to a shared file while
        # delegating to the local filesystem
        def opener(path, _log=log):
            fh = open(path, "rb")
            with open(_log, "a") as lg:
                lg.write(f"open\t{path}\n")

            class _Wrapped:
                def seek(self, *a):
                    return fh.seek(*a)

                def read(self, n=-1):
                    with open(_log, "a") as lg:
                        lg.write(f"read\t{n}\n")
                    return fh.read(n)

                def close(self):
                    return fh.close()

            return _Wrapped()

        got = read_warc_ranges(spark, manifest, opener=opener).count()
        assert got == len(man_rows)

        events = [
            line.split("\t")
            for line in open(log).read().splitlines() if line
        ]
        opens = [e[1] for e in events if e[0] == "open"]
        reads = [int(e[1]) for e in events if e[0] == "read"]
        # one open per file run: the manifest is filename-partitioned
        # and offset-sorted, so each file opens exactly once
        assert len(opens) == n_files
        assert len(set(opens)) == n_files
        # every read is range-bounded: exactly one read per capture,
        # never a whole-file (-1 / oversized) read
        assert len(reads) == len(man_rows)
        assert all(0 < n <= max_len for n in reads)


class TestLineDedup:
    """plans/dedup.py::line_dedup — CCNet cross-document paragraph
    dedup (the contract row dedup_line_ccnet hash-checks the bulk
    pipeline; these pin the operator semantics directly)."""

    def _dd(self, spark, rows, **kw):
        from imitation_learning_data_pipeline_spark.plans.dedup import (
            line_dedup,
        )

        df = spark.createDataFrame(rows, "doc_id long, text string")
        return {
            r["doc_id"]: r for r in line_dedup(df, **kw).collect()
        }

    def test_keep_first_winner_and_order(self, spark):
        got = self._dd(
            spark,
            [
                (1, "shared line\nunique to one\nshared line"),
                (2, "first of two\nshared line"),
                (3, "unique to three"),
            ],
        )
        # corpus-wide first occurrence is (doc 1, pos 0); the repeat
        # at (1, 2) and the copy at (2, 1) both drop
        assert got[1]["clean_text"] == "shared line\nunique to one"
        assert got[2]["clean_text"] == "first of two"
        assert got[3]["clean_text"] == "unique to three"
        assert got[1]["n_lines"] == 3 and got[1]["n_kept_lines"] == 2
        assert got[2]["n_lines"] == 2 and got[2]["n_kept_lines"] == 1

    def test_normalization_matches_ccnet(self, spark):
        """Case/digit/punct variants are the SAME line; the kept copy
        is the raw ORIGINAL text of the first occurrence."""
        got = self._dd(
            spark,
            [
                (1, "Accept cookies to continue."),
                (2, "ACCEPT   COOKIES to continue!!! 2026"),
                (3, "accept cookies to continue"),
            ],
        )
        assert got[1]["clean_text"] == "Accept cookies to continue."
        assert got[2]["clean_text"] == ""
        assert got[3]["clean_text"] == ""
        assert got[2]["n_kept_lines"] == 0

    def test_empty_norm_lines_always_kept(self, spark):
        """Pure digit/punct/whitespace lines carry no linguistic
        identity — never deduped, never collapsed together."""
        got = self._dd(
            spark,
            [(1, "123\n---\nreal text here"), (2, "123\n---")],
        )
        assert got[1]["clean_text"] == "123\n---\nreal text here"
        assert got[2]["clean_text"] == "123\n---"

    def test_frequent_mode_purges_everywhere(self, spark):
        # bodies must differ in LETTERS: digits strip in normalization
        # (an 'Article {i}' suffix would make all five lines identical
        # — which is precisely the CCNet point)
        words = ["alpha", "beta", "gamma", "delta", "epsilon"]
        rows = [
            (i, f"Subscribe to our newsletter!\nArticle {words[i]} here.")
            for i in range(5)
        ]
        got = self._dd(spark, rows, mode="frequent", min_docs=3)
        for i in range(5):
            # the boilerplate line drops from EVERY doc (not keep-one)
            assert got[i]["clean_text"] == f"Article {words[i]} here."
        # below threshold nothing drops
        got2 = self._dd(spark, rows, mode="frequent", min_docs=6)
        assert got2[0]["clean_text"].startswith("Subscribe")

    def test_row_preservation_and_validation(self, spark):
        import pytest as _pytest

        from imitation_learning_data_pipeline_spark.plans.dedup import (
            line_dedup,
        )

        got = self._dd(spark, [(1, "a b c"), (2, "")])
        assert set(got) == {1, 2}
        assert got[2]["clean_text"] == "" and got[2]["n_kept_lines"] in (0, 1)
        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        with _pytest.raises(ValueError, match="unknown mode"):
            line_dedup(df, mode="bogus")
        with _pytest.raises(ValueError, match="requires min_docs"):
            line_dedup(df, mode="frequent")


class TestLineDedupCli:
    def test_both_modes(self, spark, tmp_path, capsys):
        import json

        from imitation_learning_data_pipeline_spark.cli import main

        src = str(tmp_path / "docs")
        spark.createDataFrame(
            [
                (1, "Accept cookies to continue.\nStory alpha text."),
                (2, "Accept cookies to continue.\nStory beta text."),
                (3, "Accept cookies to continue.\nStory gamma text."),
            ],
            "doc_id long, text string",
        ).write.parquet(src)
        out = str(tmp_path / "kept")
        assert main(["line-dedup", "--input", src, "--out", out]) == 0
        summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert summary["mode"] == "keep_first"
        assert summary["lines_in"] == 6 and summary["lines_kept"] == 4
        rows = {r["doc_id"]: r for r in spark.read.parquet(out).collect()}
        assert rows[1]["clean_text"].startswith("Accept cookies")
        assert rows[2]["clean_text"] == "Story beta text."

        out2 = str(tmp_path / "purged")
        assert main([
            "line-dedup", "--input", src, "--out", out2, "--min-docs", "3",
        ]) == 0
        summary2 = json.loads(
            capsys.readouterr().out.strip().splitlines()[-1]
        )
        assert summary2["mode"] == "frequent"
        rows2 = {r["doc_id"]: r for r in spark.read.parquet(out2).collect()}
        # purge mode drops the banner EVERYWHERE, doc 1 included
        assert rows2[1]["clean_text"] == "Story alpha text."

    def test_column_guard(self, spark, tmp_path):
        import pytest as _pytest

        from imitation_learning_data_pipeline_spark.cli import main

        src = str(tmp_path / "bad")
        spark.createDataFrame([(1,)], "x long").write.parquet(src)
        with _pytest.raises(SystemExit, match="column"):
            main(["line-dedup", "--input", src, "--out", str(tmp_path / "o")])


class TestLineDedupFunnelStage:
    """curation_funnel 'linededup' stage (opt-in, placed early per
    CCNet) — report and one-plan arms, plus the CLI composition."""

    def _docs(self, spark):
        rows = [
            (1, "Accept cookies to continue.\n"
                "the committee reviewed all of the proposals and decided "
                "that they would publish the findings for the community"),
            (2, "Accept cookies to continue.\n"
                "the council examined every submission and agreed that "
                "the results should be shared with the public at once"),
            (3, "Accept cookies to continue."),  # all-boilerplate doc
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_stage_in_funnel(self, spark):
        from imitation_learning_data_pipeline_spark.plans.curation import (
            curation_funnel,
        )

        curated, report = curation_funnel(
            self._docs(spark), stages=("linededup",), report=True
        )
        rows = {r["doc_id"]: r["text"] for r in curated.collect()}
        # doc 1 keeps the banner (first occurrence); docs 2 loses it;
        # doc 3 becomes empty and DROPS
        assert rows[1].startswith("Accept cookies")
        assert rows[2].startswith("the council")
        assert 3 not in rows
        assert report == [
            {"stage": "linededup", "rows_in": 3, "rows_out": 2}
        ]
        # one-plan production arm agrees
        curated2, rep2 = curation_funnel(
            self._docs(spark), stages=("linededup", "gopher"), report=False
        )
        assert rep2 == []
        assert {r["doc_id"] for r in curated2.collect()} <= {1, 2}

    def test_cli_stage(self, spark, tmp_path, capsys):
        import json

        from imitation_learning_data_pipeline_spark.cli import main

        src = str(tmp_path / "docs")
        self._docs(spark).write.parquet(src)
        out = str(tmp_path / "curated")
        assert main([
            "curate", "--path", src, "--out", out,
            "--stages", "linededup,pii,dedup",
            "--line-dedup-min-docs", "3",
        ]) == 0
        summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        stages = [f["stage"] for f in summary["funnel"]]
        assert stages == ["linededup", "pii", "dedup"]
        # purge mode: the banner drops from EVERY doc, so doc 3 empties
        assert summary["funnel"][0]["rows_out"] == 2
        rows = {r["doc_id"]: r["text"] for r in spark.read.parquet(out).collect()}
        assert not rows[1].startswith("Accept")

    def test_unknown_stage_still_refused(self, spark):
        import pytest as _pytest

        from imitation_learning_data_pipeline_spark.plans.curation import (
            curation_funnel,
        )

        with _pytest.raises(ValueError, match="unknown stages"):
            curation_funnel(self._docs(spark), stages=("line_dedup",))


class TestPctNormalize:
    """operators/robots.py::pct_normalize — the Python arm, plus JVM
    twin parity (the two MUST stay bit-identical: patterns are
    normalized in Python at parse time, page paths in the JVM plan)."""

    CASES = [
        ("/a%7Eb", "/a~b"),              # unreserved → decoded
        ("/a%7eb", "/a~b"),              # lowercase hex too
        ("/%61%42%30%2D%2E%5F", "/aB0-._"),
        ("/a%2Fb", "/a%2F" + "b"),       # reserved slash stays encoded
        ("/a%2fb", "/a%2Fb"),            # ... with uppercased hex
        ("/q%3Fx%3D1", "/q%3Fx%3D1"),    # reserved ? = stay encoded
        ("/50%off", "/50%off"),          # invalid escape passes through
        ("/end%", "/end%"),              # truncated escape
        ("/end%4", "/end%4"),
        ("/%C3%A9", "/%C3%A9"),          # non-ASCII octets stay encoded
        ("/a%2Ab", "/a%2Ab"),            # %2A never becomes a wildcard
        ("", ""),
        ("%41", "A"),                    # leading escape
    ]

    def test_python_arm(self):
        from imitation_learning_data_pipeline_spark.operators.robots import (
            pct_normalize,
        )

        for raw, want in self.CASES:
            assert pct_normalize(raw) == want, raw

    def test_jvm_twin_parity(self, spark):
        from pyspark.sql import functions as F

        from imitation_learning_data_pipeline_spark.operators.robots import (
            _pct_normalize_col,
            pct_normalize,
        )

        raws = [c[0] for c in self.CASES] + [
            "/path/with/many/segments?q=%7Ea&r=%2F",
            "/%zz%41%zz",
            "%%41%",
        ]
        df = spark.createDataFrame([(s,) for s in raws], "s string")
        got = {
            r["s"]: r["n"]
            for r in df.select(
                "s", _pct_normalize_col(F.col("s")).alias("n")
            ).collect()
        }
        for s in raws:
            assert got[s] == pct_normalize(s), s


class TestRobotsFilterR15:
    RULES_SCHEMA = (
        "host string, agent string, allow boolean, pattern string, "
        "raw_len int"
    )

    def _filter(self, spark, pages_rows, rules_rows, **kw):
        from imitation_learning_data_pipeline_spark.operators.robots import (
            robots_filter,
        )

        pages = spark.createDataFrame(pages_rows, "doc_id long, url string")
        rules = spark.createDataFrame(rules_rows, self.RULES_SCHEMA)
        return {
            r["doc_id"]: r["robots_disallowed"]
            for r in robots_filter(pages, rules, **kw).collect()
        }

    def test_percent_equivalence_and_2f_exception(self, spark):
        """A '/a~b' rule (however written) matches both '/a~b' and
        '/a%7Eb' URLs; an encoded slash never matches a literal one."""
        from imitation_learning_data_pipeline_spark.operators.robots import (
            _like_pattern,
            pct_normalize,
        )

        def rule(raw, allow=False):
            norm = pct_normalize(raw)
            core = norm[:-1] if norm.endswith("$") else norm
            return ("h.test", "*", allow, _like_pattern(norm), len(core))

        got = self._filter(
            spark,
            [
                (1, "http://h.test/a~b/x"),
                (2, "http://h.test/a%7Eb/x"),
                (3, "http://h.test/a%7eb/x"),
                (4, "http://h.test/ab/x"),
                (5, "http://h.test/c/d"),      # literal slash path
                (6, "http://h.test/c%2Fd"),    # encoded slash path
            ],
            [rule("/a%7Eb"), rule("/c/d")],
        )
        assert got == {
            1: True, 2: True, 3: True, 4: False,
            5: True,
            6: False,  # %2F exception: encoded slash ≠ literal slash
        }
        # and the mirror: an encoded-slash RULE only hits encoded URLs
        got2 = self._filter(
            spark,
            [(1, "http://h.test/c/d"), (2, "http://h.test/c%2fd")],
            [rule("/c%2Fd")],
        )
        assert got2 == {1: False, 2: True}

    def test_query_only_url_keeps_query(self, spark):
        """ADVICE r14: 'http://h?q=1' must expose '/?q=1' to matching,
        not a bare '/'."""
        got = self._filter(
            spark,
            [
                (1, "http://h.test?q=1"),
                (2, "http://h.test/?q=1"),
                (3, "http://h.test?other=1"),
                (4, "http://h.test"),
            ],
            [("h.test", "*", False, "/?q=%", 4)],
        )
        assert got == {1: True, 2: True, 3: False, 4: False}

    def test_duplicate_rows_preserved(self, spark):
        """r15 zero-shuffle shape annotates row-for-row: fully
        identical input rows no longer collapse."""
        from imitation_learning_data_pipeline_spark.operators.robots import (
            robots_filter,
        )

        pages = spark.createDataFrame(
            [(1, "http://h.test/x")] * 3 + [(2, "http://h.test/y")],
            "doc_id long, url string",
        )
        rules = spark.createDataFrame(
            [("h.test", "*", False, "/x%", 2)], self.RULES_SCHEMA
        )
        out = robots_filter(pages, rules).collect()
        assert len(out) == 4
        assert sorted(r["doc_id"] for r in out) == [1, 1, 1, 2]

    def test_no_page_side_exchange(self, spark):
        """The physical plan must not shuffle the corpus: rules side
        broadcasts, and the only Exchanges sit under the broadcast
        (rules) subtree — the pages scan flows straight into the
        BroadcastHashJoin + projection."""
        from pyspark.sql import functions as F

        from imitation_learning_data_pipeline_spark.operators.robots import (
            robots_filter,
        )

        pages = spark.range(1000).select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.lit("http://h"), F.col("id") % 7, F.lit(".test/p/"),
                F.col("id"),
            ).alias("url"),
        )
        rules = spark.createDataFrame(
            [(f"h{i}.test", "*", False, "/p%", 2) for i in range(7)],
            self.RULES_SCHEMA,
        )
        plan = robots_filter(pages, rules)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        # every remaining Exchange must live on the rules side (they
        # all key on the __rhost working column — the groupBy/argmax
        # feeding the broadcast); an exchange on anything else means
        # the corpus shuffled
        for line in plan.splitlines():
            if (
                "Exchange" in line
                and "BroadcastExchange" not in line
                and "__rhost" not in line
            ):
                raise AssertionError(f"corpus-side exchange: {line}")
        assert "SortMergeJoin" not in plan and "Window" not in plan
