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
- ``robots_filter``: pages × rules → per-page verdict with ZERO
  page-side exchange (r15, was a full-corpus groupBy keyed on every
  page column): the per-host rules collapse to ONE array-of-structs
  row per host (tiny side), broadcast-join onto the pages, and the
  longest-match argmax is a per-row higher-order expression
  (``array_max(transform(filter(...)))``) — no shuffle touches the
  corpus, no sort, and page rows are never collapsed or reordered.
  This side scales with the corpus and contains no Python.

Matching implements the RFC 9309 core as a DOCUMENTED subset:
``*`` wildcards and the ``$`` end anchor are supported (compiled to
SQL LIKE — expressible identically in Spark and DuckDB, which is what
lets `web_robots_filter` hash-check the verdict logic end to end);
rule precedence is longest-pattern-wins with allow beating disallow on
ties (the published Google semantics); the agent group is chosen per
host — the caller's agent's own group when one exists, else the ``*``
group. Percent-escape normalization (r15, RFC 9309 §2.2.2): BOTH the
page path and the rule path are canonicalized before comparison —
escapes of UNRESERVED octets (RFC 3986 §2.3: ALPHA / DIGIT / ``-``
``.`` ``_`` ``~``) are decoded (``%7E`` ≡ ``~``), every other escape
is kept encoded with UPPERCASED hex (``%2f`` ≡ ``%2F``), and the
``%2F`` exception falls out naturally: ``/`` is reserved, so an
encoded slash never matches a literal one. Decoding reserved or
non-ASCII escapes is deliberately NOT done (matching the reference
Google parser's behavior of comparing encoded octets); ``%2A`` stays
literal and can never inject a wildcard. ``crawl-delay``/``sitemap``
directives carry no rule.
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


_UNRESERVED = frozenset(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
)
_HEX = frozenset("0123456789abcdefABCDEF")


def pct_normalize(s: str) -> str:
    """RFC 9309 §2.2.2 percent-escape canonicalization (Python arm —
    must stay bit-identical to `_pct_normalize_col`): decode ``%XX``
    for UNRESERVED octets, uppercase the hex of every other valid
    escape, pass invalid escapes (bad/missing hex) through untouched.
    ``%2F`` therefore stays ``%2F`` and never matches a literal
    slash."""
    out: list[str] = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if (
            c == "%"
            and i + 2 < n
            and s[i + 1] in _HEX
            and s[i + 2] in _HEX
        ):
            ch = chr(int(s[i + 1 : i + 3], 16))
            out.append(ch if ch in _UNRESERVED
                       else "%" + s[i + 1 : i + 3].upper())
            i += 3
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _pct_normalize_col(col: Column) -> Column:
    """JVM twin of `pct_normalize` — one pure projection, no Python:
    lookahead-split on ``%``, then per-fragment decode-or-uppercase
    via `transform`. Octet decode is ``chr(conv(hex,16,10))``; the
    unreserved test is the RFC 3986 §2.3 codepoint ranges."""

    def _frag(p: Column) -> Column:
        code = F.conv(F.substring(p, 2, 2), 16, 10).cast("int")
        is_esc = p.rlike("^%[0-9A-Fa-f]{2}")
        unreserved = (
            code.between(48, 57)
            | code.between(65, 90)
            | code.between(97, 122)
            | code.isin(45, 46, 95, 126)
        )
        rest = F.substring(p, 4, 1 << 30)
        return (
            F.when(is_esc & unreserved, F.concat(F.char(code), rest))
            .when(
                is_esc,
                F.concat(
                    F.lit("%"), F.upper(F.substring(p, 2, 2)), rest
                ),
            )
            .otherwise(p)
        )

    return F.array_join(F.transform(F.split(col, "(?=%)"), _frag), "")


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
                    # r15: canonicalize escapes BEFORE compiling, so
                    # '/a%7Eb' and '/a~b' produce the same pattern and
                    # the same specificity (octet length of the
                    # normalized form, '$' excluded)
                    norm = pct_normalize(raw)
                    raw_core = norm[:-1] if norm.endswith("$") else norm
                    rows.append(
                        {
                            "host": host,
                            "agent": agent,
                            "allow": allow,
                            "pattern": _like_pattern(norm),
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
    ``rules`` for ``agent`` — pure JVM with ZERO page-side exchange
    (r15): the per-host rules collapse to one array-of-structs row,
    BROADCAST-join onto the pages by host, and the verdict is a
    per-row higher-order expression — ``array_max`` over the LIKE-
    matching rules ordered by (raw_len, allow), so longest pattern
    wins and allow beats disallow on ties; no-rule/no-host → allowed.
    Keeps every input column, preserves every input row (duplicates
    included — the r14 all-columns-groupBy collapse caveat is gone),
    and normalizes percent-escapes on the page path per RFC 9309
    §2.2.2 (see module docstring; the rules side is normalized at
    parse time by `parse_robots_rules`).

    Agent-group choice per RFC 9309: if the host has ANY rules for
    ``agent`` (exact, lowercased), only that group applies; else the
    ``*`` group.

    The rule working-columns are reserved and refused on the pages
    side."""
    from ..functions.url import url_host

    reserved = {"allow", "pattern", "raw_len", "__host", "__path",
                "__rhost", "__best", "__rules"}
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
    # keep only the most specific agent group present per host, then
    # collapse each host's rules to ONE array row — every exchange in
    # this plan is on the tiny rules side
    grp = r.groupBy("__rhost").agg(F.max("__specific").alias("__grp"))
    r = r.join(F.broadcast(grp), "__rhost").filter(
        F.col("__specific") == F.col("__grp")
    ).drop("__specific", "__grp")
    rules_arr = r.groupBy("__rhost").agg(
        F.collect_list(
            F.struct("raw_len", "allow", "pattern")
        ).alias("__rules")
    )

    host = url_host(F.col(url_col))
    path = _pct_normalize_col(_url_path(F.col(url_col)))
    keyed = pages.withColumn("__host", host).withColumn("__path", path)
    joined = keyed.join(
        F.broadcast(rules_arr),
        keyed["__host"] == rules_arr["__rhost"],
        "left",
    )
    # LIKE with a per-element (non-literal) pattern; escape char is
    # backslash, matching _like_pattern. array_max on structs orders
    # field-by-field: (raw_len, allow) — the RFC precedence. NULL
    # __rules (no-rule host) and empty match sets both yield NULL.
    best = F.expr(
        "array_max(transform("
        "  filter(__rules, r -> __path LIKE r.pattern),"
        "  r -> struct(r.raw_len AS raw_len, r.allow AS allow)))"
    )
    return (
        joined.withColumn("__best", best)
        .withColumn(
            "robots_disallowed",
            F.coalesce(~F.col("__best.allow"), F.lit(False)),
        )
        .drop("__best", "__host", "__path", "__rhost", "__rules")
    )


def _url_path(url: Column) -> Column:
    """URL → path+query for robots matching (no fragment; ``/`` when
    the URL has no path — including the query-only form
    ``http://h?q=1``, which keeps its query as ``/?q=1`` rather than
    silently dropping it)."""
    no_frag = F.substring_index(url, "#", 1)
    after = F.regexp_replace(no_frag, "^[a-zA-Z][a-zA-Z0-9+.-]*://", "")
    slash = F.instr(after, "/")
    q = F.instr(after, "?")
    big = F.lit(1 << 30)
    return (
        F.when((slash > 0) & ((q == 0) | (slash < q)),
               after.substr(slash, big))
        .when(q > 0, F.concat(F.lit("/"), after.substr(q, big)))
        .otherwise(F.lit("/"))
    )
