"""Round-10 ops #2: exact heavy-hitter n-grams (plans/text.py).

The exactness claim is the whole point: the Misra-Gries candidate pass
+ broadcast exact-verify recount must equal the naive full GROUP BY on
EVERY corpus, including adversarial ones built to sit exactly on the
threshold or to overflow the per-partition counter budget.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from imitation_learning_data_pipeline_spark.functions.text import (
    clean_words,
    shingles_of_words,
)
from imitation_learning_data_pipeline_spark.plans.text import (
    heavy_hitter_ngrams,
    misra_gries_candidates,
)


def _brute(df, n, min_frac):
    grams = df.select(
        F.explode(shingles_of_words(clean_words(F.col("text")), n)).alias("gram")
    )
    total = grams.count()
    thr = -(-min_frac * total // 1)
    return {
        (r.gram, r.n_occurrences)
        for r in grams.groupBy("gram")
        .agg(F.count("*").alias("n_occurrences"))
        .filter(F.col("n_occurrences") >= F.lit(int(thr)))
        .collect()
    }


def _hh(df, n, min_frac, **kw):
    return {
        (r.gram, r.n_occurrences)
        for r in heavy_hitter_ngrams(
            df, text_col="text", n=n, min_frac=min_frac, **kw
        ).collect()
    }


class TestHeavyHitters:
    def test_planted_hitters_exact(self, spark):
        # 40 docs of unique filler + boilerplate planted in half of them:
        # the boilerplate bigrams are heavy, the filler is not
        rows = []
        for i in range(40):
            filler = " ".join(f"w{i}x{j}" for j in range(30))
            boiler = "all rights reserved worldwide" if i % 2 == 0 else ""
            rows.append((i, f"{filler} {boiler}"))
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = _hh(df, 2, 0.01)
        want = _brute(df, 2, 0.01)
        assert got == want and want  # nonempty and exact
        assert {"all rights", "rights reserved", "reserved worldwide"} <= {
            g for g, _ in got
        }

    def test_threshold_boundary_ties(self, spark):
        # every bigram appears exactly the same number of times -> ALL
        # of them sit exactly on the threshold; exactness means the
        # plan returns every one (ceil semantics, >= comparison)
        df = spark.createDataFrame(
            [(i, "alpha beta gamma") for i in range(10)],
            "doc_id long, text string",
        )
        # 20 bigram occurrences, each distinct bigram has count 10;
        # min_frac=0.5 -> threshold ceil(10)=10 -> both survive
        got = _hh(df, 2, 0.5)
        assert got == {("alpha beta", 10), ("beta gamma", 10)}
        # nudge above the boundary -> nothing survives
        assert _hh(df, 2, 0.51) == set()

    def test_counter_overflow_still_exact(self, spark):
        # vocabulary far larger than k forces constant MG evictions;
        # a single repeated bigram must still surface exactly
        rows = [(i, " ".join(f"u{i}v{j}" for j in range(50))) for i in range(64)]
        rows += [(1000 + i, "needle in haystack") for i in range(40)]
        df = spark.createDataFrame(
            rows, "doc_id long, text string"
        ).repartition(8)
        got = _hh(df, 2, 0.01)
        want = _brute(df, 2, 0.01)
        assert got == want
        assert {g for g, _ in got} == {"needle in", "in haystack"}

    def test_unigrams_and_trigrams(self, spark):
        df = spark.createDataFrame(
            [(i, "spark spark spark rapid fire drill") for i in range(12)],
            "doc_id long, text string",
        )
        for n in (1, 3):
            assert _hh(df, n, 0.1) == _brute(df, n, 0.1)

    def test_candidate_bound_guard(self, spark):
        df = spark.createDataFrame(
            [(1, "a b c")], "doc_id long, text string"
        )
        with pytest.raises(ValueError, match="candidate bound"):
            heavy_hitter_ngrams(df, n=2, min_frac=1e-6, max_candidates=100)
        with pytest.raises(ValueError, match="min_frac"):
            heavy_hitter_ngrams(df, n=2, min_frac=1.5)

    def test_empty_corpus(self, spark):
        df = spark.createDataFrame([(1, "")], "doc_id long, text string")
        out = heavy_hitter_ngrams(df, n=2, min_frac=0.1)
        assert out.count() == 0
        assert out.columns == ["gram", "n_occurrences"]

    def test_mg_summary_guarantee(self, spark):
        # the candidate pass alone (before verify) must contain every
        # item whose partition-relative frequency exceeds 1/(k+1) —
        # checked on a single-partition stream with a known skew
        df = spark.createDataFrame(
            [(i, "hot pair " * 10 + f"cold{i} one") for i in range(20)],
            "doc_id long, text string",
        ).coalesce(1)
        grams = df.select(
            F.explode(
                shingles_of_words(clean_words(F.col("text")), 2)
            ).alias("gram")
        )
        cands = {
            r.gram
            for r in misra_gries_candidates(grams, k=11).collect()
            if r.gram is not None
        }
        # 'hot pair'/'pair hot' dominate the stream -> must be present
        assert "hot pair" in cands and "pair hot" in cands
        # and the per-partition total row equals the real stream length
        totals = [
            r.weight
            for r in misra_gries_candidates(grams, k=11).collect()
            if r.gram is None
        ]
        assert sum(totals) == grams.count()


# --- BPE trainer/encoder parity ------------------------------------------------
#
# The reference implementation below is written directly from the
# published algorithm (Sennrich et al. 2016): count symbol pairs over a
# word-frequency dict, merge the argmax left-to-right, repeat. The
# Spark trainer must reproduce the EXACT merge sequence (same
# count-desc, pair-lexicographic tiebreak) and the encoder the exact
# token arrays.

from collections import Counter

from imitation_learning_data_pipeline_spark.plans.tokenize import (
    EOW,
    bpe_encode_words,
    bpe_token_counts,
    bpe_train,
    word_frequency_table,
)


def _ref_word_counts(texts):
    import re

    c = Counter()
    for t in texts:
        for w in re.split(r"[^a-z0-9]+", t.lower()):
            if w:
                c[w] += 1
    return c


def _ref_bpe_train(texts, n_merges, min_pair_count=2):
    vocab = {
        tuple(list(w) + [EOW]): n for w, n in _ref_word_counts(texts).items()
    }
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for syms, n in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), cnt = best
        if cnt < min_pair_count:
            break
        merges.append((l, r, cnt))
        new_vocab = {}
        for syms, n in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = n
        vocab = new_vocab
    return merges, vocab


_CORPUS = [
    "the lowest lower low",
    "newest newer new news",
    "the newest widest wide",
    "low lower lowest wide wider widest",
    "the the the news new",
]


class TestBpe:
    def test_train_matches_reference(self, spark):
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(_CORPUS)], "doc_id long, text string"
        )
        got, words = bpe_train(df, n_merges=12)
        want, ref_vocab = _ref_bpe_train(_CORPUS, 12)
        assert got == want
        # and the trained segmentation of every word agrees
        spark_vocab = {
            tuple(r.symbols): r.n_occurrences for r in words.collect()
        }
        assert spark_vocab == {k: v for k, v in ref_vocab.items()}

    def test_encode_matches_training_segmentation(self, spark):
        # encoding a word with the learned merges must reproduce the
        # segmentation the trainer left it with — the classic BPE
        # invariant tying encode to train
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(_CORPUS)], "doc_id long, text string"
        )
        merges, words = bpe_train(df, n_merges=12)
        enc = {
            r.word: tuple(r.tokens)
            for r in bpe_encode_words(
                words.select("word"), merges
            ).collect()
        }
        trained = {r.word: tuple(r.symbols) for r in words.collect()}
        assert enc == trained

    def test_encode_unseen_word(self, spark):
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(_CORPUS)], "doc_id long, text string"
        )
        merges, _ = bpe_train(df, n_merges=12)
        unseen = spark.createDataFrame([("lowering",)], "word string")
        (row,) = bpe_encode_words(unseen, merges).collect()
        # applies learned merges greedily by rank, leaves the rest as chars
        assert "".join(row.tokens) == "lowering" + EOW
        assert len(row.tokens) < len("lowering") + 1  # something merged

    def test_token_counts_sum_over_occurrences(self, spark):
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(_CORPUS)], "doc_id long, text string"
        )
        merges, _ = bpe_train(df, n_merges=12)
        got = {r.doc_id: r.n_tokens for r in bpe_token_counts(df, merges).collect()}
        # brute force: encode every occurrence independently
        import re

        ranks = {(l, r): i for i, (l, r, _c) in enumerate(merges)}

        def enc(w):
            syms = list(w) + [EOW]
            while True:
                pairs = [
                    (syms[i], syms[i + 1]) for i in range(len(syms) - 1)
                ]
                cand = min(
                    (p for p in pairs if p in ranks),
                    key=lambda p: ranks[p],
                    default=None,
                )
                if cand is None:
                    return syms
                l, r = cand
                out, i = [], 0
                while i < len(syms):
                    if (
                        i + 1 < len(syms)
                        and syms[i] == l
                        and syms[i + 1] == r
                    ):
                        out.append(l + r)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out

        want = {
            i: sum(
                len(enc(w))
                for w in re.split(r"[^a-z0-9]+", t.lower())
                if w
            )
            for i, t in enumerate(_CORPUS)
        }
        assert got == want

    def test_min_pair_count_stops(self, spark):
        # every word unique, every pair count 1 -> no merge survives
        df = spark.createDataFrame(
            [(1, "abc def ghi")], "doc_id long, text string"
        )
        merges, _ = bpe_train(df, n_merges=10, min_pair_count=2)
        assert merges == []

    def test_word_frequency_table(self, spark):
        df = spark.createDataFrame(
            [(1, "a b a"), (2, "A, b!")], "doc_id long, text string"
        )
        got = {
            r.word: r.n_occurrences
            for r in word_frequency_table(df).collect()
        }
        assert got == {"a": 3, "b": 2}


class TestIncrementalHeavyHitters:
    def test_two_batch_fold_and_bounds(self, spark, tmp_path):
        import pandas as pd
        from pyspark.sql import types as T

        from imitation_learning_data_pipeline_spark.streaming.incremental import (
            read_heavyhitter_store,
            run_incremental_heavyhitter_stream,
        )

        ingest = tmp_path / "in"
        ingest.mkdir()
        store = str(tmp_path / "store")
        ckpt = str(tmp_path / "ckpt")
        schema = T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("text", T.StringType()),
            ]
        )

        def _run():
            stream = spark.readStream.schema(schema).parquet(str(ingest))
            run_incremental_heavyhitter_stream(
                stream, store, ckpt, n=2, k=101
            )

        # batch 1: boilerplate planted in half the docs
        b1 = pd.DataFrame(
            {
                "doc_id": range(40),
                "text": [
                    (
                        " ".join(f"a{i}b{j}" for j in range(10))
                        + (" click here now" if i % 2 == 0 else "")
                    )
                    for i in range(40)
                ],
            }
        )
        b1.to_parquet(ingest / "b1.parquet", index=False)
        _run()
        r1 = {r.gram: r for r in read_heavyhitter_store(spark, store, 0.02).collect()}
        assert "click here" in r1 and "here now" in r1
        assert r1["click here"].certain and r1["click here"].n_lower == 20

        # batch 2: same boilerplate again + new filler
        b2 = pd.DataFrame(
            {
                "doc_id": range(100, 140),
                "text": [
                    (
                        " ".join(f"c{i}d{j}" for j in range(10))
                        + (" click here now" if i % 2 == 0 else "")
                    )
                    for i in range(40)
                ],
            }
        )
        b2.to_parquet(ingest / "b2.parquet", index=False)
        _run()
        r2 = {r.gram: r for r in read_heavyhitter_store(spark, store, 0.02).collect()}
        # exact across both batches: candidate in both -> n_lower exact
        assert r2["click here"].n_lower == 40
        assert r2["click here"].n_upper == 40  # present in every batch: no slack
        assert r2["click here"].certain

        # replay with no new data: store unchanged (exactly-once)
        _run()
        r3 = {r.gram: r for r in read_heavyhitter_store(spark, store, 0.02).collect()}
        assert r3["click here"].n_lower == 40

    def test_absence_slack_bounds_true_count(self, spark, tmp_path):
        import pandas as pd
        from pyspark.sql import types as T

        from imitation_learning_data_pipeline_spark.streaming.incremental import (
            read_heavyhitter_store,
            run_incremental_heavyhitter_stream,
        )

        ingest = tmp_path / "in"
        ingest.mkdir()
        store = str(tmp_path / "store")
        ckpt = str(tmp_path / "ckpt")
        schema = T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("text", T.StringType()),
            ]
        )

        def _run():
            stream = spark.readStream.schema(schema).parquet(str(ingest))
            # tiny k so batch 2's filler CAN evict the planted gram
            run_incremental_heavyhitter_stream(stream, store, ckpt, n=2, k=5)

        # batch 1: planted heavy gram
        pd.DataFrame(
            {"doc_id": [1], "text": ["hot pair " * 30]}
        ).to_parquet(ingest / "b1.parquet", index=False)
        _run()
        # batch 2: pure noise, planted gram absent
        pd.DataFrame(
            {"doc_id": [2], "text": [" ".join(f"n{j} m{j}" for j in range(40))]}
        ).to_parquet(ingest / "b2.parquet", index=False)
        _run()
        rows = {
            r.gram: r
            for r in read_heavyhitter_store(spark, store, 0.2).collect()
        }
        hp = rows["hot pair"]
        # true corpus count of 'hot pair' is 30; the interval must hold it
        assert hp.n_lower <= 30 <= hp.n_upper
        # and the slack came only from the batch it was missing in
        assert hp.n_upper > hp.n_lower


# --- bigram LM scorer -----------------------------------------------------------

import math

from imitation_learning_data_pipeline_spark.plans.lm import (
    score_bigram_nll,
    train_bigram_lm,
)


class TestBigramLm:
    def test_hand_computed_probabilities(self, spark):
        # corpus: "a b a b" + "a c" -> bigrams: (a b)x2, (b a)x1, (a c)x1
        # contexts: a->3, b->1 ; vocab V=3 ; alpha=0.5
        df = spark.createDataFrame(
            [(1, "a b a b"), (2, "a c")], "doc_id long, text string"
        )
        big, ctx, v = train_bigram_lm(df)
        assert v == 3
        bmap = {r.gram: r.c_ab for r in big.collect()}
        cmap = {r.left: r.c_a for r in ctx.collect()}
        assert bmap == {"a b": 2, "b a": 1, "a c": 1}
        assert cmap == {"a": 3, "b": 1}
        got = {
            r.doc_id: (r.n_bigrams, r.avg_nll)
            for r in score_bigram_nll(df, big, ctx, v).collect()
        }

        def p(cab, ca):
            return (cab + 0.5) / (ca + 0.5 * 3)

        # doc 1: (a b), (b a), (a b)
        nlls1 = [
            round(-math.log(p(2, 3)) * 1e6)
            for _ in range(2)
        ] + [round(-math.log(p(1, 1)) * 1e6)]
        want1 = round(sum(nlls1) / 1e6 / 3 * 1e4) / 1e4
        # doc 2: (a c)
        want2 = round(round(-math.log(p(1, 3)) * 1e6) / 1e6 / 1 * 1e4) / 1e4
        assert got[1] == (3, want1)
        assert got[2] == (1, want2)

    def test_unseen_bigram_and_context_smoothed(self, spark):
        train = spark.createDataFrame(
            [(1, "a b a b")], "doc_id long, text string"
        )
        big, ctx, v = train_bigram_lm(train)  # V=2
        new = spark.createDataFrame(
            [(9, "a z")], "doc_id long, text string"
        )
        (row,) = score_bigram_nll(new, big, ctx, v).collect()
        # unseen bigram (a z), seen context a (c_a=2):
        # p = 0.5 / (2 + 0.5*2) = 1/6
        want = round(round(-math.log(0.5 / 3.0) * 1e6) / 1e6 * 1e4) / 1e4
        assert (row.n_bigrams, row.avg_nll) == (1, want)
        # fully unseen context: p = 0.5/(0.5*V) = 1/V
        new2 = spark.createDataFrame(
            [(10, "z q")], "doc_id long, text string"
        )
        (row2,) = score_bigram_nll(new2, big, ctx, v).collect()
        want2 = round(round(-math.log(1.0 / 2.0) * 1e6) / 1e6 * 1e4) / 1e4
        assert row2.avg_nll == want2

    def test_short_docs_omitted(self, spark):
        df = spark.createDataFrame(
            [(1, "hello"), (2, ""), (3, "two words")],
            "doc_id long, text string",
        )
        big, ctx, v = train_bigram_lm(df)
        got = {r.doc_id for r in score_bigram_nll(df, big, ctx, v).collect()}
        assert got == {3}

    def test_boilerplate_scores_lower_than_noise(self, spark):
        # the data-selection property: a doc made of corpus-frequent
        # bigrams must score LOWER avg_nll than a doc of rare ones
        rows = [(i, "the quick brown fox jumps") for i in range(50)]
        rows += [(100 + i, f"x{i}y z{i}w q{i}v") for i in range(10)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        big, ctx, v = train_bigram_lm(df)
        scores = {
            r.doc_id: r.avg_nll
            for r in score_bigram_nll(df, big, ctx, v).collect()
        }
        assert scores[0] < scores[100]


class TestLmPerplexityBuckets:
    def test_buckets_thin_extremes(self, spark):
        from imitation_learning_data_pipeline_spark.plans.lm import (
            lm_perplexity_buckets,
        )

        # 200 fluent docs (shared phrasing) + 200 noise docs (unique
        # bigrams): fluent land in low buckets, noise in high ones
        rows = [(i, "the quick brown fox jumps over the lazy dog")
                for i in range(200)]
        rows += [(1000 + i, f"r{i}s t{i}u v{i}w x{i}y") for i in range(200)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        kept = lm_perplexity_buckets(
            df, n_buckets=4, keep_rates=[0.0, 1.0, 1.0, 0.0]
        ).collect()
        kept_ids = {r.doc_id for r in kept}
        # rate-0 buckets are empty by construction
        assert all(r.bucket in (1, 2) for r in kept)
        # the fluent docs all share one score -> one bucket; they fill
        # the distribution's low half, noise the high half
        fluent_buckets = {r.bucket for r in kept if r.doc_id < 1000}
        noise_buckets = {r.bucket for r in kept if r.doc_id >= 1000}
        assert fluent_buckets <= {1} or fluent_buckets == set()
        assert noise_buckets <= {2} or noise_buckets == set()
        assert kept_ids  # something survives the middle

    def test_keep_all_returns_every_scored_doc(self, spark):
        from imitation_learning_data_pipeline_spark.plans.lm import (
            lm_perplexity_buckets,
        )

        df = spark.createDataFrame(
            [(i, f"alpha beta w{i}") for i in range(30)],
            "doc_id long, text string",
        )
        kept = lm_perplexity_buckets(
            df, n_buckets=2, keep_rates=[1.0, 1.0]
        )
        assert kept.count() == 30
        assert set(kept.columns) == {"doc_id", "bucket", "avg_nll"}

    def test_rate_length_guard(self, spark):
        from imitation_learning_data_pipeline_spark.plans.lm import (
            lm_perplexity_buckets,
        )

        df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
        import pytest as _pytest

        with _pytest.raises(ValueError, match="keep_rates"):
            lm_perplexity_buckets(df, n_buckets=3, keep_rates=[1.0])


class TestRound10Cli:
    def test_hitters_bpe_lmscore_verbs(self, spark, tmp_path, capsys):
        import json as _json

        from imitation_learning_data_pipeline_spark.cli import main

        src = str(tmp_path / "docs")
        rows = [(i, "terms of service apply " + f"u{i} v{i}") for i in range(30)]
        spark.createDataFrame(rows, "doc_id long, text string").write.parquet(src)

        # hitters: stdout top-k
        assert main(["hitters", "--input", src, "--min-frac", "0.05"]) == 0
        lines = [
            _json.loads(ln)
            for ln in capsys.readouterr().out.strip().splitlines()
            if ln.startswith("{")
        ]
        grams = {d["gram"] for d in lines}
        assert {"terms of", "of service", "service apply"} <= grams

        # bpe: merge table + counts
        mout = str(tmp_path / "merges")
        cout = str(tmp_path / "counts")
        assert (
            main(
                ["bpe", "--input", src, "--merges", "10",
                 "--merges-out", mout, "--counts-out", cout]
            )
            == 0
        )
        m = spark.read.parquet(mout)
        assert m.count() == 10 and set(m.columns) == {
            "rank", "left", "right", "pair_count"
        }
        c = spark.read.parquet(cout)
        assert c.count() == 30 and c.filter("n_tokens <= 0").count() == 0

        # lm-score: raw scores, then bucket sampling
        sout = str(tmp_path / "scores")
        assert main(["lm-score", "--input", src, "--out", sout]) == 0
        s = spark.read.parquet(sout)
        assert s.count() == 30 and "avg_nll" in s.columns
        bout = str(tmp_path / "buckets")
        assert (
            main(
                ["lm-score", "--input", src, "--keep-rates", "1.0,1.0",
                 "--out", bout]
            )
            == 0
        )
        b = spark.read.parquet(bout)
        assert b.count() == 30 and set(b.columns) == {
            "doc_id", "bucket", "avg_nll"
        }
