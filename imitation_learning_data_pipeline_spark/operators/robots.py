"""robots.txt parsing + URL exclusion — the crawl-compliance gate.

A curation pipeline that republishes crawl-derived text must be able
to answer "was this URL disallowed by its host's robots.txt?" (Common
Crawl ships the fetched robots files as their own WARC subset for
exactly this). Two halves with different runtimes:

- ``parse_robots_rules``: robots.txt RESPONSE records → one rule row
  per (host, user_agent, allow/disallow, path pattern). Text parsing
  is per-document Python (stdlib, Arrow-batched mapInPandas — same
  posture as the HTML extractor); robots files are tiny and one per
  host, so this side is never the scale axis.
- ``robots_filter``: pages × rules → per-page verdict, PURE JVM: an
  equi-join on host, a LIKE-pattern match per candidate rule, and a
  longest-match struct-max — one exchange for the join, one for the
  argmax. This side scales with the corpus and contains no Python.

Matching implements the RFC 9309 core as a DOCUMENTED subset:
``*`` wildcards and the ``$`` end anchor are supported (compiled to
SQL LIKE — expressible identically in Spark and DuckDB, which is what
lets `web_robots_filter` hash-check the verdict logic end to end);
rule precedence is longest-pattern-wins with allow beating disallow on
ties (the published Google semantics); the agent group is chosen per
host — the caller's agent's own group when one exists, else the ``*``
group. Percent-decoding of rule paths and the ``crawl-delay``/
``sitemap`` directives are out of scope and say so here.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

RULES_SCHEMA = (
    "host string, agent string, allow boolean, pattern string, "
    "raw_len int"
)


def parse_robots_text(text: str) -> list[tuple[str, bool, str]]:
    """One robots.txt body → [(agent, allow, raw_path)] rows. Pure
    function (unit-testable without Spark). Group semantics per RFC
    9309: consecutive ``User-agent`` lines open a group that the
    following allow/disallow lines join; a rule line before any
    user-agent line is ignored; empty-path ``Disallow:`` (allow all)
    contributes no rule. Comments (#) strip; directive names are
    case-insensitive."""
    out: list[tuple[str, bool, str]] = []
    agents: list[str] = []
    collecting_agents = True
    for raw in (text or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if not collecting_agents:
                agents = []
                collecting_agents = True
            if val:
                agents.append(val.lower())
        elif key in ("allow", "disallow"):
            collecting_agents = False
            if not agents or not val:
                continue
            for a in agents:
                out.append((a, key == "allow", val))
        else:
            # crawl-delay, sitemap, unknown directives: close the
            # agent-line run but carry no rule
            collecting_agents = False
    return out


def _like_pattern(raw: str) -> str:
    """robots path → SQL LIKE pattern: escape LIKE metacharacters,
    ``*`` → ``%``, trailing ``$`` anchors (no trailing ``%``)."""
    anchored = raw.endswith("$")
    body = raw[:-1] if anchored else raw
    esc = (
        body.replace("\\", "\\\\").replace("%", "\\%").replace("_", "\\_")
    )
    pat = esc.replace("*", "%")
    if anchored or pat.endswith("%") and not pat.endswith("\\%"):
        # already open-ended (trailing *) or explicitly anchored ($)
        return pat
    return pat + "%"


def parse_robots_rules(records: DataFrame) -> DataFrame:
    """WARC robots.txt responses → rules frame (host, agent, allow,
    pattern, raw_len). ``records`` is any warc_records-shaped frame
    (``target_uri``, binary ``payload``); non-200 / undecodable rows
    should be filtered by the caller (same contract as the ingest).
    ``pattern`` is the LIKE-compiled form `robots_filter` consumes;
    ``raw_len`` is the RFC specificity (pattern length before
    compilation, ``$`` excluded)."""
    import pandas as pd

    from ..functions.url import url_host

    src = records.select(
        url_host(F.col("target_uri")).alias("host"),
        F.col("payload").alias("payload"),
    )

    def _run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for host, payload in zip(pdf["host"], pdf["payload"]):
                if payload is None:
                    continue
                text = bytes(payload).decode("utf-8", "replace")
                for agent, allow, raw in parse_robots_text(text):
                    raw_core = raw[:-1] if raw.endswith("$") else raw
                    rows.append(
                        {
                            "host": host,
                            "agent": agent,
                            "allow": allow,
                            "pattern": _like_pattern(raw),
                            "raw_len": len(raw_core),
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=["host", "agent", "allow", "pattern", "raw_len"],
            )

    return src.mapInPandas(_run, RULES_SCHEMA)


def robots_filter(
    pages: DataFrame,
    rules: DataFrame,
    agent: str = "*",
    url_col: str = "url",
) -> DataFrame:
    """Annotate ``pages`` with ``robots_disallowed`` (boolean) under
    ``rules`` for ``agent`` — pure JVM: host equi-join, LIKE match,
    longest-match struct-max (allow wins ties), no-rule/no-host →
    allowed. Keeps every input column. The rules side is per-host
    robots content — small next to the corpus; Spark's optimizer
    broadcasts it when stats allow (AQE), and the argmax never sorts.

    Agent-group choice per RFC 9309: if the host has ANY rules for
    ``agent`` (exact, lowercased), only that group applies; else the
    ``*`` group.

    Contract notes: ``pages`` rows identical across ALL columns
    collapse to one output row (the verdict is computed by a groupBy
    over the page columns — call on keyed frames, which every ingest
    output is); the rule working-columns are reserved and refused on
    the pages side."""
    from ..functions.url import url_host

    reserved = {"allow", "pattern", "raw_len", "__host", "__path",
                "__rhost", "__best"}
    clash = reserved & set(pages.columns)
    if clash:
        raise ValueError(
            f"robots_filter: pages columns {sorted(clash)} collide with "
            "the rule working columns — rename them first"
        )

    a = agent.lower()
    r = rules.filter(F.lower(F.col("agent")).isin(a, "*")).select(
        F.col("host").alias("__rhost"),
        (F.lower(F.col("agent")) == a).cast("int").alias("__specific"),
        "allow", "pattern", "raw_len",
    )
    # keep only the most specific agent group present per host
    grp = r.groupBy("__rhost").agg(F.max("__specific").alias("__grp"))
    r = r.join(grp, "__rhost").filter(
        F.col("__specific") == F.col("__grp")
    ).drop("__specific", "__grp")

    host = url_host(F.col(url_col))
    path = _url_path(F.col(url_col))
    keyed = pages.withColumn("__host", host).withColumn("__path", path)
    joined = keyed.join(r, keyed["__host"] == r["__rhost"], "left")
    # expression form — Column.like() only takes a literal pattern;
    # Spark's LIKE escape char is backslash, matching _like_pattern
    matched = F.col("pattern").isNotNull() & F.expr(
        "`__path` LIKE `pattern`"
    )
    # verdict per page: among matching rules, longest raw_len wins;
    # allow breaks ties (struct-max orders by (raw_len, allow))
    verdict = F.max(
        F.when(matched, F.struct(F.col("raw_len"), F.col("allow")))
    ).alias("__best")
    group_cols = [F.col(c) for c in pages.columns]
    out = (
        joined.groupBy(*group_cols, F.col("__host"), F.col("__path"))
        .agg(verdict)
        .withColumn(
            "robots_disallowed",
            F.coalesce(~F.col("__best.allow"), F.lit(False)),
        )
        .drop("__best", "__host", "__path")
    )
    return out


def _url_path(url: Column) -> Column:
    """URL → path+query for robots matching (no fragment; ``/`` when
    the URL has no path)."""
    no_frag = F.substring_index(url, "#", 1)
    after = F.regexp_replace(no_frag, "^[a-zA-Z][a-zA-Z0-9+.-]*://", "")
    idx = F.instr(after, "/")
    return F.when(idx > 0, after.substr(idx, F.lit(1 << 30))).otherwise(
        F.lit("/")
    )
