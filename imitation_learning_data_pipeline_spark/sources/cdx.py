"""CDX(J) capture-index source — Common Crawl's per-crawl URL index.

Before anyone downloads a 100 TB crawl, they query its CAPTURE INDEX:
one line per fetched URL in CDXJ form (the `cc-index` layout) —

    ``<SURT key> <14-digit timestamp> <JSON payload>``

e.g. ``org,example)/path?q=1 20260101123000 {"url": "http://example.org/
path?q=1", "mime": "text/html", "status": "200", "digest": "sha1:...",
"length": "12345", "offset": "4567", "filename": "seg/warc/...warc.gz"}``.

Pipelines use the index to PLAN ingestion — which WARC files/offsets
hold the 200-status text/html captures for an allowlisted domain set —
so the index reader is scan-bound by design: ``spark.read.text`` over
the (gzipped or plain) index shards, then pure JVM expressions
(``split`` limit-3, ``get_json_object``, casts) per line. Zero Python
in the row path; Spark's text source handles .gz transparently.

SURT keys (Sort-friendly URI Reordering Transform — the public
convention: host labels reversed and comma-joined, ``)`` terminating
the authority) sort all captures of a domain contiguously; this module
also provides the inverse (``surt_host``) so index analytics can group
by ordinary host/domain without touching the JSON payload.

Malformed lines (no three fields, non-numeric timestamp, broken JSON)
yield NULL columns rather than failing the scan — an index shard with
a corrupt tail should surface as null-count metrics, not a dead job —
EXCEPT via ``read_cdxj(strict=True)`` which counts nulls and refuses.

Reference parity: the reference repo has no index reader; this is the
100 TB ingestion-planning surface BASELINE.md's web-pipeline mandate
implies (the WARC reader's upstream).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# the JSON payload fields the cc-index convention carries; status/
# length/offset arrive as JSON STRINGS in the wild ("status": "200") —
# cast explicitly, nulls propagate
_JSON_FIELDS = (
    ("url", "string"),
    ("mime", "string"),
    ("status", "int"),
    ("digest", "string"),
    ("length", "bigint"),
    ("offset", "bigint"),
    ("filename", "string"),
)


def cdxj_columns(line: Column) -> dict[str, Column]:
    """Parse ONE CDXJ line into its typed columns (pure expressions —
    usable on any string column, which is how the oracle-checked
    library row drives in-plan-synthesized lines through the REAL
    parser). Keys: surt_key, ts (timestamp), plus the JSON payload
    fields. Malformed parts null out individually."""
    # split with limit 3: the JSON payload contains spaces
    parts = F.split(line, " ", 3)
    n = F.size(parts)
    surt = F.when(n >= 3, parts[0])
    ts_raw = F.when(n >= 3, parts[1])
    js = F.when(n >= 3, parts[2])
    out: dict[str, Column] = {
        "surt_key": surt,
        # 14-digit GMT timestamp → proper timestamp; non-conforming
        # strings null out (to_timestamp returns null on parse failure)
        "ts": F.to_timestamp(
            F.when(ts_raw.rlike("^[0-9]{14}$"), ts_raw), "yyyyMMddHHmmss"
        ),
    }
    for name, typ in _JSON_FIELDS:
        out[name] = F.get_json_object(js, f"$.{name}").cast(typ)
    return out


def surt_host(surt_key: Column | str) -> Column:
    """SURT authority → ordinary host: ``org,example)/path`` →
    ``example.org``. Pure expressions: take the part before ``)``,
    drop a ``:port`` suffix if present, split on commas, reverse,
    dot-join. Null for keys without a ``)`` terminator."""
    col = F.col(surt_key) if isinstance(surt_key, str) else surt_key
    auth = F.when(
        col.contains(")"), F.substring_index(col, ")", 1)
    )
    auth = F.substring_index(auth, ":", 1)  # strip SURT port suffix
    return F.array_join(F.reverse(F.split(auth, ",")), ".")


def read_cdxj(
    spark: SparkSession, path_glob: str, strict: bool = False
) -> DataFrame:
    """CDXJ index shards → typed DataFrame (surt_key, ts, url, mime,
    status, digest, length, offset, filename, host). ``spark.read.text``
    handles .gz shards transparently and splits plain-text shards by
    line across tasks. ``strict=True`` refuses (driver-side count — one
    scan, only run when asked) if any non-empty line failed to parse a
    surt_key; default is the crawl posture — malformed lines flow as
    nulls for the caller's null-metrics."""
    lines = spark.read.text(path_glob).filter(F.length(F.trim("value")) > 0)
    cols = cdxj_columns(F.col("value"))
    out = lines.select(
        *[c.alias(name) for name, c in cols.items()]
    ).withColumn("host", surt_host(F.col("surt_key")))
    if strict:
        bad = out.filter(F.col("surt_key").isNull()).count()
        if bad:
            raise ValueError(
                f"read_cdxj: {bad} unparseable line(s) under {path_glob} "
                "(strict=True); re-run without strict to flow them as "
                "nulls"
            )
    return out
