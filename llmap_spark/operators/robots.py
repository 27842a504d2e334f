"""robots.txt (RFC 9309 Robots Exclusion Protocol) gate for crawl URLs.

The crawl-politeness sibling of the links.py host blocklist: instead of a
hand-maintained list, the per-host robots.txt bodies a crawler already
fetched decide which URLs may be processed. Same kernel discipline as the
other parsers (total, deterministic, stdlib-only, shared by pytest and
the Spark operator):

  parse_robots(body, agent)  robots.txt text -> combined rule list of ALL
                             user-agent groups at the winning specificity
                             (RFC 9309 group merge)
  is_allowed(rules, path)    RFC 9309 longest-match decision (allow wins
                             length ties; no matching rule -> allowed)
  filter_robots_disallowed   Spark operator: urls x (host, robots body)
                             -> the allowed subset

Scale shape: robots bodies are parsed ONCE per host into a compact rule
array (one row per host — orders of magnitude smaller than the URL
corpus), then equi-joined to the URLs on the host key (AQE broadcasts
the rules frame when it is small; at full scale both sides shuffle on
host, the same key the link-graph family already uses). The per-URL
longest-match runs in an Arrow-batched pandas UDF with a per-batch memo
— '*'/'$' wildcard patterns need real matching, done by an iterative
non-backtracking walk (hostile patterns cannot wedge an executor).

Correctness: RFC 9309 semantics are pinned in pytest against the RFC's
own examples (longest match wins, allow wins ties, most-specific agent
group, wildcard '*' and anchor '$'); the driver-hashed planted query uses
wildcard-free rules so the expected decision collapses to prefix
arithmetic a SQL oracle can replay.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

MAX_ROBOTS_BYTES = 512_000   # RFC 9309 parse limit (500 KiB); total on more
MAX_RULES_PER_HOST = 5_000   # defensive cap on pathological bodies


def _agent_groups(body: str | None):
    """robots.txt text -> [(agents, rules, delay_ms)] per RFC 9309 group
    semantics: consecutive user-agent lines share the rule block that
    follows; unknown lines neither end an agent run nor split groups;
    rules before any user-agent line are ignored. Crawl-delay (the de
    facto extension) is captured per group as integer MILLISECONDS
    (first valid value wins within a group; garbage ignored) without
    ending an agent run, so the pinned shared-run semantics hold. The
    SINGLE group walk parse_robots and crawl_delay_ms both consume."""
    if not body:
        return []
    body = body[:MAX_ROBOTS_BYTES]
    groups: list[tuple[list[str], list[tuple[int, str]], int | None]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[int, str]] = []
    cur_delay: int | None = None
    in_agent_run = False
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if not in_agent_run:
                if cur_agents:
                    groups.append((cur_agents, cur_rules, cur_delay))
                cur_agents, cur_rules, cur_delay = [], [], None
                in_agent_run = True
            cur_agents.append(val.lower())
        elif key in ("allow", "disallow"):
            in_agent_run = False
            if cur_agents and len(cur_rules) < MAX_RULES_PER_HOST:
                # empty Disallow means "allow everything" — no rule
                if val:
                    cur_rules.append((1 if key == "allow" else 0, val))
        elif key == "crawl-delay":
            # does NOT end the agent run (pinned: unknown/extension
            # lines never split 'User-agent: a / ... / User-agent: b')
            if cur_agents and cur_delay is None:
                try:
                    d = float(val)
                    if 0 <= d <= 3600:
                        cur_delay = int(d * 1000)
                except ValueError:
                    pass
        # any other line (sitemap, unknown) is IGNORED per RFC 9309
        # §2.2.3 — it neither ends an agent run nor separates groups
    if cur_agents:
        groups.append((cur_agents, cur_rules, cur_delay))
    return groups


def _winning_groups(groups, agent: str):
    """ALL groups at the winning agent specificity (longest matching
    agent token; '*' is the fallback at score 0) — RFC 9309 §2.2.1."""
    agent_l = agent.lower()
    best_score = -1
    for agents, _, _ in groups:
        for a in agents:
            if a == "*":
                best_score = max(best_score, 0)
            elif a and a in agent_l:
                best_score = max(best_score, len(a))
    if best_score < 0:
        return []
    out = []
    for agents, rules, delay in groups:
        score = max((0 if a == "*" else len(a)) for a in agents
                    if a == "*" or (a and a in agent_l)) \
            if any(a == "*" or (a and a in agent_l) for a in agents) else -1
        if score == best_score:
            out.append((agents, rules, delay))
    return out


def parse_robots(body: str | None, agent: str = "*") -> list[tuple[int, str]]:
    """robots.txt text -> [(is_allow, pattern)] for the most specific
    user-agent group that matches `agent` (longest agent token that is a
    case-insensitive substring match wins; '*' group is the fallback).
    Total: None/garbage yields [] (no rules = everything allowed).
    Group semantics live in _agent_groups/_winning_groups (shared with
    crawl_delay_ms — one walk, no drift)."""
    merged: list[tuple[int, str]] = []
    for _, rules, _ in _winning_groups(_agent_groups(body), agent):
        merged.extend(rules)
    return merged[:MAX_RULES_PER_HOST]


def crawl_delay_ms(body: str | None, agent: str = "*") -> int | None:
    """Crawl-delay for `agent` in integer milliseconds, from the SAME
    winning-specificity groups as parse_robots; when several winning
    groups declare one, the MAXIMUM wins (the polite reading of an
    ambiguous file). None when absent. Total."""
    delays = [d for _, _, d in
              _winning_groups(_agent_groups(body), agent) if d is not None]
    return max(delays) if delays else None


def _url_host(url_col: str):
    """Normalized authority of a URL column — the scheme-aware host key
    both the gate and the scheduler join on (one definition; case-
    insensitive scheme, userinfo stripped, the SCHEME'S default port
    stripped per _norm_host)."""
    scheme_of = F.lower(F.regexp_extract(
        F.col(url_col), r"(?i)^([a-z][a-z0-9+.-]*)://", 1))
    return _norm_host(F.regexp_extract(
        F.col(url_col), r"(?i)^[a-z][a-z0-9+.-]*://([^/?#]+)", 1),
        scheme_col=scheme_of)


def fetch_schedule(urls_df: DataFrame, robots_df: DataFrame,
                   agent: str = "*", default_delay_ms: int = 1000,
                   max_per_host: int = 10_000, url_col: str = "url",
                   host_col: str = "host",
                   body_col: str = "body") -> DataFrame:
    """Deterministic per-host politeness schedule — the planning half of
    Crawl-delay: each host's URLs take slots 0..max_per_host-1 in URL
    order and eta_ms = slot * the host's Crawl-delay (crawl_delay_ms;
    `default_delay_ms` when the host declares none). Returns the input
    columns + (fetch_host, slot, delay_ms, eta_ms); URLs beyond
    max_per_host per host are DROPPED (a politeness budget, not a skew
    accident — at delay 1s the default cap is ~3 hours of one host's
    fetch time).

    Compose AFTER filter_robots_disallowed — this operator schedules,
    it does not re-check rules. Scale shape: the per-host delay frame is
    one thin row per host (AQE-broadcastable); the slot assignment is a
    rank-filtered window partitioned by host, which Spark's window-
    group-limit pushes into per-partition partial sorts, bounding what a
    hot host can buffer to max_per_host rows per task. The per-host
    SERIALIZATION the slots express is inherent to politeness — the
    point is that fetch order is deterministic and rate-bounded."""
    from pyspark.sql import Window
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def delay_of(bodies: pd.Series) -> pd.Series:
        return pd.Series([crawl_delay_ms(b, agent) for b in bodies],
                         dtype="object")

    delays = (_one_per_host(robots_df, host_col, body_col)
              .select("host", delay_of(F.col("__robots_body"))
                      .alias("__delay_ms")))
    with_host = urls_df.withColumn("fetch_host", _url_host(url_col))
    joined = (with_host.join(
        delays, with_host["fetch_host"] == delays["host"], "left")
        .drop(delays["host"]))
    w = Window.partitionBy("fetch_host").orderBy(F.col(url_col).asc())
    # filter the RAW row_number before any arithmetic: Spark's
    # WindowGroupLimit rule pattern-matches `row_number() <= k` filters
    # and pushes the limit into per-partition partial sorts (bounding a
    # hot host's buffering); `(rn - 1) < k` does NOT match the rule
    # (verified in the physical plan)
    return (joined
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= max_per_host)
            .withColumn("slot", (F.col("__rn") - 1).cast("int"))
            .withColumn("delay_ms", F.coalesce(
                F.col("__delay_ms"), F.lit(int(default_delay_ms))))
            .withColumn("eta_ms",
                        (F.col("slot") * F.col("delay_ms")).cast("long"))
            .drop("__delay_ms", "__rn"))


MAX_SITEMAPS_PER_HOST = 100  # defensive cap on pathological bodies


def sitemap_urls(body: str | None) -> list[str]:
    """'Sitemap:' directive URLs of a robots.txt body — the discovery
    link between the robots gate and the sitemap frontier (robots.txt
    advertises sitemaps; sitemap.expand_frontier follows them). Per RFC
    9309 §2.3 / sitemaps.org the directive is GLOBAL scope (not part of
    any user-agent group), case-insensitive key, absolute URL value.
    Total, order-preserving, deduplicated, capped. Same kernel
    discipline as parse_robots (shared by pytest and the Spark op)."""
    if not body:
        return []
    out: list[str] = []
    seen: set[str] = set()
    for raw in body[:MAX_ROBOTS_BYTES].splitlines():
        line = raw.split("#", 1)[0].strip()
        if ":" not in line:
            continue
        key, _, val = line.partition(":")
        if key.strip().lower() != "sitemap":
            continue
        u = val.strip()
        if u and u not in seen:
            seen.add(u)
            out.append(u)
            if len(out) >= MAX_SITEMAPS_PER_HOST:
                break
    return out


def _one_per_host(robots_df: DataFrame, host_col: str,
                  body_col: str) -> DataFrame:
    """Normalize the host key and ENFORCE one row per normalized host
    (min body: deterministic; duplicate fetches carry identical bodies
    anyway) — the shared reduction both robots_rules and
    robots_sitemaps build on, so their dedup rule cannot diverge."""
    return (robots_df.select(
        _norm_host(F.col(host_col)).alias("host"),
        F.col(body_col).alias("__robots_body"))
        .groupBy("host").agg(F.min("__robots_body").alias("__robots_body")))


def robots_sitemaps(robots_df: DataFrame, host_col: str = "host",
                    body_col: str = "body") -> DataFrame:
    """(host, robots body) -> (host, loc): one row per advertised
    sitemap URL — the seeds frame sitemap.expand_frontier consumes.
    Host normalization and one-row-per-host dedup are shared with
    robots_rules (_one_per_host); the extraction is an Arrow-batched
    call of the SAME sitemap_urls kernel."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def extract(bodies: pd.Series) -> pd.Series:
        return pd.Series([sitemap_urls(b) for b in bodies])

    # deterministic; the flag only blocks InferFiltersFromGenerate from
    # CLONING the UDF into a pre-explode filter (CLAUDE.md rule — the
    # extraction would otherwise run twice per host row)
    extract = extract.asNondeterministic()
    return (_one_per_host(robots_df, host_col, body_col)
            .select("host", extract(F.col("__robots_body")).alias("_locs"))
            .select("host", F.explode("_locs").alias("loc")))


def _match_pattern(pattern: str, path: str) -> bool:
    """Anchored-at-start wildcard match: '*' matches any run, a trailing
    '$' anchors the end, everything else is literal. ITERATIVE two-pointer
    walk, O(len(path) * segments) worst case with NO backtracking —
    robots.txt is arbitrary third-party input, and the regex translation
    this replaces ('*' -> '.*') let one hostile 'Disallow: /*a*a*a...$'
    pattern wedge an executor in exponential backtracking."""
    anchored = pattern.endswith("$")
    core = pattern[:-1] if anchored else pattern
    parts = core.split("*")
    if not path.startswith(parts[0]):
        return False
    if len(parts) == 1:
        return path == core if anchored else True
    pos = len(parts[0])
    for part in parts[1:-1]:
        idx = path.find(part, pos)
        if idx < 0:
            return False
        pos = idx + len(part)
    last = parts[-1]
    if anchored:
        return path.endswith(last) and len(path) - len(last) >= pos
    return path.find(last, pos) >= 0


def _decide(rules: list[tuple[int, str]], path: str) -> bool:
    """RFC 9309 decision: the matching rule with the LONGEST pattern wins;
    on equal length, allow wins; no match -> allowed. Empty path means
    '/'. THE single decision implementation — the Spark UDF calls this
    same function (a second inline copy is how twins drift)."""
    path = path or "/"
    best_len = -1
    best_allow = True
    for allow, pattern in rules:
        if _match_pattern(pattern, path):
            ln = len(pattern)
            if ln > best_len or (ln == best_len and allow and not best_allow):
                best_len = ln
                best_allow = bool(allow)
    return best_allow


def is_allowed(rules: list[tuple[int, str]], path: str) -> bool:
    """Public alias of the single decision implementation."""
    return _decide(rules, path)


def _norm_host(col, scheme_col=None):
    """Authority normalization for the rules join: lowercase, strip
    userinfo, strip the DEFAULT port. With `scheme_col` (the URL side,
    where the scheme is known) only that scheme's default is stripped —
    :80 for http, :443 for https — so http://host:443 keys as 'host:443'
    and does NOT pick up host's (https-origin) robots rules; an unmatched
    non-default port fails OPEN (no rules -> allowed), never cross-origin.
    Without `scheme_col` (the robots side is a bare host string with no
    scheme) both defaults strip — the documented approximation: a bare
    'host:443' robots row covers the default-port origins of 'host'.
    Normalization stays symmetric for every default-port authority, which
    is what keeps the join from failing open on case/userinfo noise."""
    h = F.lower(col)
    h = F.regexp_replace(h, r"^[^@]*@", "")
    if scheme_col is None:
        return F.regexp_replace(h, r":(80|443)$", "")
    return (F.when(scheme_col == "http", F.regexp_replace(h, r":80$", ""))
            .when(scheme_col == "https", F.regexp_replace(h, r":443$", ""))
            .otherwise(h))


def robots_rules(robots_df: DataFrame, agent: str = "*",
                 host_col: str = "host", body_col: str = "body") -> DataFrame:
    """(host, robots.txt body) -> (host, rules array<struct<allow,pattern>>):
    parse once per host, driver-free. The output is ENFORCED one row per
    NORMALIZED host — two raw hosts that normalize to the same key
    ('r5.example' and 'R5.example:443'), or duplicate fetches of one
    host, would otherwise fan out the left join in
    filter_robots_disallowed and duplicate every kept URL row for that
    host. Ties collapse to min(body): deterministic, and for the common
    duplicate-fetch case the bodies are identical anyway. The groupBy is
    a shuffle of (host, robots body) rows only — a few KB per distinct
    host, never the URL corpus."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<struct<allow: int, pattern: string>>")
    def parse(bodies: pd.Series) -> pd.Series:
        return pd.Series([parse_robots(b, agent) for b in bodies])

    return _one_per_host(robots_df, host_col, body_col).select(
        "host", parse(F.col("__robots_body")).alias("rules"))


def filter_robots_disallowed(urls_df: DataFrame, robots_df: DataFrame,
                             agent: str = "*", url_col: str = "url",
                             host_col: str = "host",
                             body_col: str = "body") -> DataFrame:
    """Keep only URLs their host's robots.txt allows for `agent`.

    A host with no robots row allows everything (the crawl convention for
    404 robots). Join is an equi-join on the normalized authority key
    (case-insensitive scheme/host, userinfo and default ports stripped on
    BOTH sides — see _norm_host); the decision UDF is Arrow-batched, memo
    keyed by the rules tuple, and calls the SAME _decide as
    is_allowed/pytest. Internal join columns use __robots_-prefixed names
    and the rules-side host is dropped BY REFERENCE so caller columns
    named host/rules survive untouched."""
    from urllib.parse import urlparse

    from pyspark.sql.functions import pandas_udf

    rules = robots_rules(robots_df, agent, host_col, body_col) \
        .withColumnRenamed("rules", "__robots_rules")
    with_host = urls_df.withColumn("__robots_host", _url_host(url_col))
    joined = with_host.join(
        rules, with_host["__robots_host"] == rules["host"], "left") \
        .drop(rules["host"])

    @pandas_udf("boolean")
    def allowed(urls: pd.Series, rules_col: pd.Series) -> pd.Series:
        memo: dict[tuple, bool] = {}
        out = []
        for u, rl in zip(urls, rules_col):
            if rl is None or len(rl) == 0:
                out.append(True)
                continue
            rules_t = tuple((r["allow"], r["pattern"]) for r in rl)
            p = urlparse(u or "")
            path = (p.path or "/") + (("?" + p.query) if p.query else "")
            key = (rules_t, path)
            v = memo.get(key)
            if v is None:
                v = _decide(list(rules_t), path)
                memo[key] = v
            out.append(v)
        return pd.Series(out)

    return (joined.filter(allowed(F.col(url_col), F.col("__robots_rules")))
            .drop("__robots_host", "__robots_rules"))
