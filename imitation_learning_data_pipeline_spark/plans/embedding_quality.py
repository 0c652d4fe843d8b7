"""Embedding-space quality filtering: flag vectors that don't belong to
the corpus distribution (broken encoders, corrupted inputs, wrong-modal
rows) BEFORE they poison ANN indexes, SemDeDup cells, or k-means
mixtures.

Two detectors, both standard practice in embedding-curation pipelines:

- **Global centroid z-score** (default): distance to the corpus mean
  vector, z-scored against the corpus distance distribution. In high
  dimension the distances of in-distribution vectors concentrate
  tightly (measure concentration), so scale/offset corruptions stand
  out by many σ. Entirely aggregate-based — one mean-vector aggregate,
  one distance projection, one (mean, std) aggregate, all map-side
  combinable; nothing here needs MLlib.
- **Per-cell z-score** (``k`` set): KMeans cells localize the test so a
  multi-modal corpus doesn't hide mode-relative outliers. Known
  failure mode, handled explicitly: k-means|| seeds centroids
  proportional to distance², so an extreme point can capture its OWN
  tiny cell and z-score to 0 — cells smaller than ``min_cell`` are
  therefore flagged wholesale (a cell the quantizer spent on < min_cell
  vectors is itself the anomaly).

Scale shape (100 TB): the global mode is two aggregates and a
projection (no shuffle of embeddings beyond the partial aggregates);
the cell mode adds one KMeans fit (sampled in practice) and a k-row
broadcast join. Output is one row per vector — feed ``is_outlier`` to
the curation funnel as a drop predicate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vector import as_double
from ..session import ensure_utc
from ..sources import load_table
from .registry import register

_EPS = 1e-12


def _dist_to(center_col: str):
    return F.sqrt(
        F.aggregate(
            F.zip_with("v", center_col, lambda x, c: (x - c) * (x - c)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def embedding_outliers(
    vecs: DataFrame,
    k: int | None = None,
    z_threshold: float = 3.0,
    min_cell: int = 4,
    seed: int = 42,
    robust: bool = False,
) -> DataFrame:
    """(vec_id, v: array<double>) → (vec_id, cell_id, dist, z,
    is_outlier). ``cell_id`` is -1 in global mode.

    CONTAMINATION BOUND (r10 ADVICE): the default mean/stddev_pop
    baseline is computed over the full corpus INCLUDING the outliers,
    so it holds only at low contamination — at ~2% (the planted test
    rate) extreme vectors barely move mu/sd, but past roughly 10-20%
    they inflate both and mask each other (z of a genuine outlier
    drops below the threshold). ``robust=True`` swaps the baseline for
    median + 1.4826·MAD (normal-consistent), which keeps a ~50%
    breakdown point at the cost of one extra aggregate pass
    (percentile_approx twice: the location, then the scaled deviation
    median). The per-cell mode shares the same bound inside each cell
    above ``min_cell``."""
    vecs = vecs.select("vec_id", as_double("v").alias("v"))
    if k is None:
        # Mean vector via posexplode → per-dimension avg (map-side
        # combinable; dim rows → ONE array row, ordered by struct sort,
        # not by collect order, which aggregates don't guarantee).
        per_dim = (
            vecs.select(F.posexplode("v").alias("i", "x"))
            .groupBy("i")
            .agg(F.avg("x").alias("m"))
            .agg(F.array_sort(F.collect_list(F.struct("i", "m"))).alias("cm"))
            .select(F.transform("cm", lambda s: s["m"]).alias("center"))
        )
        assigned = vecs.crossJoin(F.broadcast(per_dim)).select(
            "vec_id", F.lit(-1).alias("cell_id"), "v", "center"
        )
    else:
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        feats = vecs.withColumn("features", array_to_vector("v"))
        km = KMeans(
            k=k, seed=seed, maxIter=10, featuresCol="features", predictionCol="cell_id"
        )
        model = km.fit(feats)
        centers = feats.sparkSession.createDataFrame(
            [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
            "cell_id int, center array<double>",
        )
        assigned = (
            model.transform(feats)
            .select("vec_id", "cell_id", "v")
            .join(F.broadcast(centers), "cell_id")
        )
    with_dist = assigned.select("vec_id", "cell_id", _dist_to("center").alias("dist"))
    if robust:
        # Median + MAD: two vocabulary-of-cells-bounded aggregates
        # (percentile_approx is a mergeable sketch — map-side partials,
        # k-row result). 1.4826 makes MAD estimate sigma under
        # normality, so z_threshold keeps its usual meaning.
        loc = with_dist.groupBy("cell_id").agg(
            F.percentile_approx("dist", 0.5, 10000).alias("mu"),
            F.count("*").alias("cell_n"),
        )
        stats = (
            with_dist.join(F.broadcast(loc), "cell_id")
            .groupBy("cell_id")
            .agg(
                F.percentile_approx(
                    F.abs(F.col("dist") - F.col("mu")), 0.5, 10000
                ).alias("mad"),
                F.first("mu").alias("mu"),
                F.first("cell_n").alias("cell_n"),
            )
            .select(
                "cell_id", "mu", (F.col("mad") * 1.4826).alias("sd"), "cell_n"
            )
        )
    else:
        stats = with_dist.groupBy("cell_id").agg(
            F.avg("dist").alias("mu"),
            F.stddev_pop("dist").alias("sd"),
            F.count("*").alias("cell_n"),
        )
    z = (F.col("dist") - F.col("mu")) / F.greatest(F.col("sd"), F.lit(_EPS))
    flagged = F.when(F.col("cell_n") < min_cell, F.lit(True)).otherwise(
        z > z_threshold
    )
    return with_dist.join(F.broadcast(stats), "cell_id").select(
        "vec_id",
        "cell_id",
        "dist",
        z.alias("z"),
        flagged.alias("is_outlier"),
    )


@register(
    "embedding_outlier_check",
    oracle="""
SELECT CAST(count(*) + count(*) FILTER (vec_id % 50 = 0) AS BIGINT) AS n_vecs,
       TRUE AS planted_all_flagged,
       TRUE AS base_rate_low
FROM embeddings
""",
)
def embedding_outlier_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Invariant check (global mode) on a planted corpus: every
    ``vec_id % 50 == 0`` embedding reappears at +1000000 scaled ×10 —
    a corrupted-encoder stand-in. All planted rows must flag as
    outliers; the base false-flag rate must stay under 5%; the row
    count is the SQL-exact fact."""
    from ..sources.readers import spread

    ensure_utc(spark)
    emb = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", as_double("embedding").alias("v")
    )
    planted = emb.filter(F.col("vec_id") % 50 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform("v", lambda x: x * 10.0).alias("v"),
    )
    out = embedding_outliers(emb.unionByName(planted))
    agg = out.agg(
        F.count("*").cast("long").alias("n_vecs"),
        (
            F.sum(
                F.when((F.col("vec_id") >= 1000000) & ~F.col("is_outlier"), 1).otherwise(0)
            )
            == 0
        ).alias("planted_all_flagged"),
        (
            F.sum(F.when((F.col("vec_id") < 1000000) & F.col("is_outlier"), 1).otherwise(0))
            <= 0.05 * F.sum(F.when(F.col("vec_id") < 1000000, 1).otherwise(0))
        ).alias("base_rate_low"),
    )
    return agg


@register(
    "embedding_outlier_robust",
    oracle="""
SELECT CAST(count(*) + count(*) FILTER (vec_id % 5 = 0) AS BIGINT) AS n_vecs,
       TRUE AS planted_all_flagged,
       TRUE AS base_rate_low,
       TRUE AS nonrobust_would_mask
FROM embeddings
""",
)
def embedding_outlier_robust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Invariant check for the MEDIAN+MAD baseline at HIGH
    contamination (the r10 ADVICE masking case): every ``vec_id % 5 ==
    0`` embedding (20% of the corpus) reappears at +1000000 scaled ×10.
    At that rate the mean/stddev baseline inflates until the planted
    rows read as inliers (``nonrobust_would_mask`` asserts at least one
    planted row slips past it), while the robust baseline — a 50%
    breakdown point — must still flag every planted row and keep the
    base false-flag rate under 5%. Row count is the SQL-exact fact.
    """
    from ..sources.readers import spread

    ensure_utc(spark)
    emb = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", as_double("embedding").alias("v")
    )
    planted = emb.filter(F.col("vec_id") % 5 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform("v", lambda x: x * 10.0).alias("v"),
    )
    corpus = emb.unionByName(planted)
    robust = embedding_outliers(corpus, robust=True)
    naive = embedding_outliers(corpus, robust=False).select(
        "vec_id", F.col("is_outlier").alias("naive_outlier")
    )
    joined = robust.join(naive, "vec_id")
    is_planted = F.col("vec_id") >= 1000000
    return joined.agg(
        F.count("*").cast("long").alias("n_vecs"),
        (
            F.sum(F.when(is_planted & ~F.col("is_outlier"), 1).otherwise(0)) == 0
        ).alias("planted_all_flagged"),
        (
            F.sum(F.when(~is_planted & F.col("is_outlier"), 1).otherwise(0))
            <= 0.05 * F.sum(F.when(~is_planted, 1).otherwise(0))
        ).alias("base_rate_low"),
        (
            F.sum(F.when(is_planted & ~F.col("naive_outlier"), 1).otherwise(0)) > 0
        ).alias("nonrobust_would_mask"),
    )
