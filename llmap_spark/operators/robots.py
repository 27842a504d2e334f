"""robots.txt (RFC 9309 Robots Exclusion Protocol) gate for crawl URLs.

The crawl-politeness sibling of the links.py host blocklist: instead of a
hand-maintained list, the per-host robots.txt bodies a crawler already
fetched decide which URLs may be processed. Same kernel discipline as the
other parsers (total, deterministic, stdlib-only, shared by pytest and
the Spark operator):

  parse_robots(body, agent)  robots.txt text -> ranked rule list for the
                             most specific matching user-agent group
  is_allowed(rules, path)    RFC 9309 longest-match decision (allow wins
                             length ties; no matching rule -> allowed)
  filter_robots_disallowed   Spark operator: urls x (host, robots body)
                             -> the allowed subset

Scale shape: robots bodies are parsed ONCE per host into a compact rule
array (one row per host — orders of magnitude smaller than the URL
corpus), then equi-joined to the URLs on the host key (AQE broadcasts
the rules frame when it is small; at full scale both sides shuffle on
host, the same key the link-graph family already uses). The per-URL
longest-match runs in an Arrow-batched pandas UDF with a compiled-regex
memo per host — rules with '*'/'$' wildcards need real pattern matching,
which no JVM expression expresses without regex translation anyway.

Correctness: RFC 9309 semantics are pinned in pytest against the RFC's
own examples (longest match wins, allow wins ties, most-specific agent
group, wildcard '*' and anchor '$'); the driver-hashed planted query uses
wildcard-free rules so the expected decision collapses to prefix
arithmetic a SQL oracle can replay.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, functions as F

MAX_ROBOTS_BYTES = 512_000   # RFC 9309 parse limit (500 KiB); total on more
MAX_RULES_PER_HOST = 5_000   # defensive cap on pathological bodies


def parse_robots(body: str | None, agent: str = "*") -> list[tuple[int, str]]:
    """robots.txt text -> [(is_allow, pattern)] for the most specific
    user-agent group that matches `agent` (longest agent token that is a
    case-insensitive substring match wins; '*' group is the fallback).
    Total: None/garbage yields [] (no rules = everything allowed).

    Group semantics per RFC 9309: consecutive user-agent lines share the
    rule block that follows; rules before any user-agent line are ignored.
    Only the selected group's rules are returned.
    """
    if not body:
        return []
    body = body[:MAX_ROBOTS_BYTES]
    agent_l = agent.lower()
    groups: list[tuple[list[str], list[tuple[int, str]]]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[int, str]] = []
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
                    groups.append((cur_agents, cur_rules))
                cur_agents, cur_rules = [], []
                in_agent_run = True
            cur_agents.append(val.lower())
        elif key in ("allow", "disallow"):
            in_agent_run = False
            if cur_agents and len(cur_rules) < MAX_RULES_PER_HOST:
                # empty Disallow means "allow everything" — no rule
                if val:
                    cur_rules.append((1 if key == "allow" else 0, val))
        else:
            in_agent_run = False  # sitemap/crawl-delay end an agent run
    if cur_agents:
        groups.append((cur_agents, cur_rules))
    best: tuple[int, list[tuple[int, str]]] | None = None
    for agents, rules in groups:
        for a in agents:
            if a == "*":
                score = 0
            elif a and a in agent_l:
                score = len(a)
            else:
                continue
            if best is None or score > best[0]:
                best = (score, rules)
    return best[1] if best else []


def _pattern_re(pattern: str) -> re.Pattern:
    """Rule pattern -> anchored regex: '*' matches any run, trailing '$'
    anchors the end; everything else is literal."""
    anchored = pattern.endswith("$")
    core = pattern[:-1] if anchored else pattern
    rx = "".join(".*" if c == "*" else re.escape(c) for c in core)
    return re.compile("^" + rx + ("$" if anchored else ""))


def is_allowed(rules: list[tuple[int, str]], path: str) -> bool:
    """RFC 9309 decision: the matching rule with the LONGEST pattern wins;
    on equal length, allow wins; no match -> allowed. Empty path means '/'."""
    path = path or "/"
    best_len = -1
    best_allow = True
    for allow, pattern in rules:
        if _pattern_re(pattern).match(path):
            ln = len(pattern)
            if ln > best_len or (ln == best_len and allow and not best_allow):
                best_len = ln
                best_allow = bool(allow)
    return best_allow


def robots_rules(robots_df: DataFrame, agent: str = "*",
                 host_col: str = "host", body_col: str = "body") -> DataFrame:
    """(host, robots.txt body) -> (host, rules array<struct<allow,pattern>>):
    parse once per host, driver-free. The output is one compact row per
    host — the frame the URL join consumes."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<struct<allow: int, pattern: string>>")
    def parse(bodies: pd.Series) -> pd.Series:
        return pd.Series([parse_robots(b, agent) for b in bodies])

    return robots_df.select(
        F.col(host_col).alias("host"),
        parse(F.col(body_col)).alias("rules"))


def filter_robots_disallowed(urls_df: DataFrame, robots_df: DataFrame,
                             agent: str = "*", url_col: str = "url",
                             host_col: str = "host",
                             body_col: str = "body") -> DataFrame:
    """Keep only URLs their host's robots.txt allows for `agent`.

    A host with no robots row allows everything (the crawl convention for
    404 robots). Join is an equi-join on the host key; the decision UDF
    compiles each host's patterns once per batch (regex memo keyed by the
    rules tuple) and is Arrow-batched."""
    from urllib.parse import urlparse

    from pyspark.sql.functions import pandas_udf

    rules = robots_rules(robots_df, agent, host_col, body_col)
    host_of = F.lower(F.regexp_extract(F.col(url_col),
                                       r"^[a-z][a-z0-9+.-]*://([^/?#]+)", 1))
    with_host = urls_df.withColumn("_host", host_of)
    joined = with_host.join(rules, with_host["_host"] == rules["host"],
                            "left").drop("host")

    @pandas_udf("boolean")
    def allowed(urls: pd.Series, rules_col: pd.Series) -> pd.Series:
        memo: dict[tuple, list] = {}
        out = []
        for u, rl in zip(urls, rules_col):
            if rl is None or len(rl) == 0:
                out.append(True)
                continue
            key = tuple((r["allow"], r["pattern"]) for r in rl)
            compiled = memo.get(key)
            if compiled is None:
                compiled = [(a, p, _pattern_re(p)) for a, p in key]
                memo[key] = compiled
            p = urlparse(u or "")
            path = (p.path or "/") + (("?" + p.query) if p.query else "")
            best_len, best_allow = -1, True
            for a, pat, rx in compiled:
                if rx.match(path):
                    ln = len(pat)
                    if ln > best_len or (ln == best_len and a
                                         and not best_allow):
                        best_len, best_allow = ln, bool(a)
            out.append(best_allow)
        return pd.Series(out)

    return (joined.filter(allowed(F.col(url_col), F.col("rules")))
            .drop("_host", "rules"))
