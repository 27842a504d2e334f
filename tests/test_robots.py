"""robots.txt operator (operators/robots.py): RFC 9309 semantics pinned
against the spec's own examples, totality, and the Spark gate end-to-end
vs a pure-python oracle."""

from __future__ import annotations

from llmap_spark.operators.robots import (filter_robots_disallowed,
                                          is_allowed, parse_robots)


def _decide(body, agent, path):
    return is_allowed(parse_robots(body, agent), path)


def test_rfc9309_longest_match_wins():
    body = "User-Agent: *\nDisallow: /example\nAllow: /example/page/"
    assert not _decide(body, "bot", "/example")
    assert not _decide(body, "bot", "/example/other")
    assert _decide(body, "bot", "/example/page/")
    assert _decide(body, "bot", "/example/page/x")


def test_rfc9309_allow_wins_equal_length():
    # RFC 9309 5.2: equivalent rules -> allow used
    body = "User-Agent: *\nDisallow: /example/page/\nAllow: /example/page/"
    assert _decide(body, "bot", "/example/page/")


def test_wildcards_and_anchor():
    body = ("User-Agent: *\n"
            "Disallow: /*.gif$\n"
            "Disallow: /private*/\n")
    assert not _decide(body, "bot", "/pics/cat.gif")
    assert _decide(body, "bot", "/pics/cat.gif?v=1")  # $ anchors the end
    assert not _decide(body, "bot", "/private-stuff/x")
    assert _decide(body, "bot", "/private")  # no trailing /


def test_agent_group_selection_most_specific():
    body = ("User-Agent: *\nDisallow: /all/\n"
            "User-Agent: examplebot\nDisallow: /eb/\n")
    # the specific group REPLACES the * group, not adds to it
    assert _decide(body, "ExampleBot/1.0", "/all/x")
    assert not _decide(body, "ExampleBot/1.0", "/eb/x")
    assert not _decide(body, "otherbot", "/all/x")
    assert _decide(body, "otherbot", "/eb/x")


def test_shared_agent_run_and_comments():
    body = ("# politeness\n"
            "User-Agent: a\n"
            "User-Agent: b\n"
            "Disallow: /shared/  # trailing comment\n")
    assert not _decide(body, "a", "/shared/x")
    assert not _decide(body, "b", "/shared/x")
    assert _decide(body, "c", "/shared/x")  # no * group -> allowed


def test_empty_disallow_and_default_allow():
    assert _decide("User-Agent: *\nDisallow:", "bot", "/anything")
    assert _decide(None, "bot", "/x")
    assert _decide("totally not robots \x00bytes", "bot", "/x")
    # rules before any user-agent line are ignored
    assert _decide("Disallow: /orphan/\nUser-Agent: *\nAllow: /", "b",
                   "/orphan/x")


def test_spark_gate_matches_python(spark):
    import random

    rng = random.Random(7)
    hosts = [f"h{i}.example" for i in range(6)]
    bodies = {
        "h0.example": "User-Agent: *\nDisallow: /priv/\nAllow: /priv/ok/",
        "h1.example": "User-Agent: *\nDisallow: /*.bin$",
        "h2.example": "User-Agent: mybot\nDisallow: /\nUser-Agent: *\nAllow: /",
        "h3.example": None,          # empty body -> allow all
        "h4.example": "User-Agent: *\nDisallow:",
        # h5 has NO robots row at all -> allow all
    }
    paths = ["/", "/priv/x", "/priv/ok/y", "/a/b.bin", "/a/b.bin?x=1",
             "/anything"]
    urls = [(f"https://{h}{p}",) for h in hosts for p in paths]
    rng.shuffle(urls)
    urls_df = spark.createDataFrame(urls, "url string")
    robots_df = spark.createDataFrame(
        [(h, b) for h, b in bodies.items()], "host string, body string")
    got = {r.url for r in filter_robots_disallowed(
        urls_df, robots_df, agent="MyBot/2.1").collect()}
    from urllib.parse import urlparse

    want = set()
    for (u,) in urls:
        p = urlparse(u)
        rules = parse_robots(bodies.get(p.netloc), "mybot/2.1")
        if is_allowed(rules, p.path + (("?" + p.query) if p.query else "")):
            want.add(u)
    assert got == want
    # sanity on the semantics themselves
    assert "https://h0.example/priv/ok/y" in got
    assert "https://h0.example/priv/x" not in got
    assert "https://h2.example/anything" not in got  # mybot fully banned
    assert "https://h5.example/anything" in got      # no robots -> allowed


def test_repeated_star_groups_are_combined():
    """RFC 9309 group merge: ALL groups at the winning specificity apply —
    a later 'User-agent: *' block must not be silently dropped."""
    body = ("User-agent: *\nDisallow: /a/\n\n"
            "User-agent: other\nDisallow: /o/\n\n"
            "User-agent: *\nDisallow: /c/\n")
    assert not _decide(body, "bot", "/a/x")
    assert not _decide(body, "bot", "/c/x")   # from the SECOND * group
    assert _decide(body, "bot", "/o/x")       # other agent's rule ignored


def test_unknown_lines_do_not_split_agent_runs():
    """Crawl-delay/sitemap/unknown lines are ignored entirely: agents on
    both sides of one still share the rule block that follows."""
    body = ("User-agent: a\nCrawl-delay: 10\nUser-agent: b\n"
            "Disallow: /x/\nSitemap: https://e.example/s.xml\n")
    assert not _decide(body, "a", "/x/1")
    assert not _decide(body, "b", "/x/1")


def test_hostile_wildcard_pattern_terminates_fast():
    """The matcher is non-backtracking: a pathological '*a*a*a...$'
    pattern must decide in linear-ish time, not hang the executor."""
    import time

    body = "User-agent: *\nDisallow: /" + "*a" * 12 + "$\n"
    t = time.time()
    _decide(body, "bot", "/" + "a" * 40 + "b")
    _decide(body, "bot", "/" + "a" * 24)  # this one matches
    assert time.time() - t < 1.0
    assert not _decide(body, "bot", "/" + "a" * 24)


def test_host_normalization_is_symmetric(spark):
    """Uppercase scheme, userinfo, default ports, and a mixed-case robots
    host key must all still hit the rules — asymmetric normalization
    fails OPEN (disallowed URLs pass)."""
    robots_df = spark.createDataFrame(
        [("R5.Example", "User-Agent: *\nDisallow: /priv/")],
        "host string, body string")
    urls = spark.createDataFrame(
        [("HTTPS://r5.example/priv/x",),
         ("https://user:pw@r5.example/priv/y",),
         ("https://r5.example:443/priv/z",),
         ("https://r5.example/open",)], "url string")
    got = {r.url for r in filter_robots_disallowed(urls, robots_df).collect()}
    assert got == {"https://r5.example/open"}


def test_duplicate_robots_rows_do_not_fan_out_urls(spark):
    """Two robots rows whose raw hosts normalize to the SAME key (plus a
    straight duplicate fetch) must collapse to one rules row — otherwise
    the left join duplicates every kept URL row for that host."""
    robots_df = spark.createDataFrame(
        [("r5.example", "User-Agent: *\nDisallow: /priv/"),
         ("R5.example:443", "User-Agent: *\nDisallow: /priv/"),
         ("r5.example", "User-Agent: *\nDisallow: /priv/")],
        "host string, body string")
    urls = spark.createDataFrame(
        [("https://r5.example/open",), ("https://r5.example/priv/x",)],
        "url string")
    rows = filter_robots_disallowed(urls, robots_df).collect()
    assert [r.url for r in rows] == ["https://r5.example/open"]


def test_conflicting_duplicate_robots_rows_pick_one_verdict(spark):
    """Same normalized host, DIFFERENT bodies: the verdict must be one
    deterministic choice (min body), never both applied inconsistently."""
    robots_df = spark.createDataFrame(
        [("dup.example", "User-Agent: *\nDisallow: /a/"),
         ("DUP.example", "User-Agent: *\nDisallow: /b/")],
        "host string, body string")
    urls = spark.createDataFrame(
        [("https://dup.example/a/x",), ("https://dup.example/b/x",),
         ("https://dup.example/c/x",)], "url string")
    got = sorted(r.url for r in
                 filter_robots_disallowed(urls, robots_df).collect())
    # min(body) picks the 'Disallow: /a/' ruleset (lexicographic tie-break
    # on identical 'User-Agent: *\n' prefixes: '/a/' < '/b/')
    assert got == ["https://dup.example/b/x", "https://dup.example/c/x"]


def test_non_default_port_does_not_steal_host_rules(spark):
    """http://host:443 is a DIFFERENT origin than https://host: it must
    not pick up host's rules (fails open), while each scheme's true
    default port still normalizes away."""
    robots_df = spark.createDataFrame(
        [("p9.example", "User-Agent: *\nDisallow: /priv/")],
        "host string, body string")
    urls = spark.createDataFrame(
        [("http://p9.example:443/priv/x",),   # non-default for http: open
         ("https://p9.example:80/priv/x",),   # non-default for https: open
         ("http://p9.example:80/priv/x",),    # default: rules apply
         ("https://p9.example:443/priv/x",),  # default: rules apply
         ("https://p9.example/priv/x",)], "url string")
    got = {r.url for r in filter_robots_disallowed(urls, robots_df).collect()}
    assert got == {"http://p9.example:443/priv/x",
                   "https://p9.example:80/priv/x"}


def test_caller_host_and_rules_columns_survive(spark):
    robots_df = spark.createDataFrame(
        [("h.example", "User-Agent: *\nDisallow: /no/")],
        "host string, body string")
    urls = spark.createDataFrame(
        [("https://h.example/ok", "h.example", "keep-me"),
         ("https://h.example/no/x", "h.example", "keep-me")],
        "url string, host string, rules string")
    out = filter_robots_disallowed(urls, robots_df)
    assert set(out.columns) == {"url", "host", "rules"}
    rows = out.collect()
    assert [(r.url, r.host, r.rules) for r in rows] == [
        ("https://h.example/ok", "h.example", "keep-me")]


def test_kernel_totality_fuzz():
    """Never-raise rule on arbitrary input, like every other kernel."""
    from hypothesis import given, settings, strategies as st

    from llmap_spark.operators.robots import _match_pattern

    @settings(max_examples=300, deadline=None)
    @given(st.text(max_size=200), st.text(max_size=50))
    def check_parse(body, agent):
        rules = parse_robots(body, agent or "*")
        assert isinstance(rules, list)
        is_allowed(rules, "/some/path")

    @settings(max_examples=300, deadline=None)
    @given(st.text(alphabet="ab*$/", max_size=30),
           st.text(alphabet="ab/", max_size=60))
    def check_match(pattern, path):
        r = _match_pattern(pattern, path)
        assert isinstance(r, bool)
        # cross-check against a bounded-backtracking regex spec on small
        # inputs (patterns here are tiny, so re is safe)
        import re as _re

        anchored = pattern.endswith("$")
        core = pattern[:-1] if anchored else pattern
        rx = "".join(".*" if c == "*" else _re.escape(c) for c in core)
        spec = _re.compile("^" + rx + ("$" if anchored else "")).match(path)
        assert r == bool(spec), (pattern, path)

    check_parse()
    check_match()


def test_sitemap_urls_kernel():
    from llmap_spark.operators.robots import sitemap_urls

    body = ("User-Agent: *\nDisallow: /priv/\n"
            "Sitemap: https://a.example/s1.xml\n"
            "sitemap:https://a.example/s2.xml  # trailing comment\n"
            "SITEMAP: https://a.example/s1.xml\n"   # dup: kept once
            "Crawl-delay: 5\n")
    assert sitemap_urls(body) == [
        "https://a.example/s1.xml", "https://a.example/s2.xml"]
    # global scope: directives inside an agent group still count
    grouped = "User-Agent: bot\nSitemap: https://b.example/x.xml\nDisallow: /"
    assert sitemap_urls(grouped) == ["https://b.example/x.xml"]
    assert sitemap_urls(None) == []
    assert sitemap_urls("") == []
    assert sitemap_urls("no directives here\n:::\n#Sitemap: x") == []


def test_robots_sitemaps_spark_dedups_hosts(spark):
    from llmap_spark.operators.robots import robots_sitemaps

    robots_df = spark.createDataFrame(
        [("A.example", "Sitemap: https://a.example/s.xml"),
         ("a.example:443", "Sitemap: https://a.example/s.xml"),
         ("b.example", "User-agent: *\nDisallow: /\n"
                       "Sitemap: https://b.example/1.xml\n"
                       "Sitemap: https://b.example/2.xml"),
         ("c.example", "User-agent: *\nDisallow: /")],  # none advertised
        "host string, body string")
    got = sorted((r.host, r.loc) for r in robots_sitemaps(robots_df).collect())
    assert got == [
        ("a.example", "https://a.example/s.xml"),
        ("b.example", "https://b.example/1.xml"),
        ("b.example", "https://b.example/2.xml")]


def test_robots_to_frontier_integration(spark):
    """robots 'Sitemap:' lines seed expand_frontier end-to-end."""
    from llmap_spark.operators.robots import robots_sitemaps
    from llmap_spark.sources.sitemap import expand_frontier
    from pyspark.sql import functions as F

    robots_df = spark.createDataFrame(
        [("x", "Sitemap: https://x/a.xml")], "host string, body string")
    seeds = robots_sitemaps(robots_df).select("loc")

    def fetch(df):
        return df.withColumn("body", F.expr(
            "cast('<urlset><url><loc>https://x/p1</loc></url></urlset>' "
            "as binary)"))

    got = [(r.loc, r.round) for r in expand_frontier(seeds, fetch).collect()]
    assert got == [("https://x/p1", 1)]


def test_crawl_delay_ms_kernel():
    from llmap_spark.operators.robots import crawl_delay_ms

    body = ("User-Agent: *\nCrawl-delay: 2\nDisallow: /x/\n"
            "User-Agent: fastbot\nCrawl-delay: 0.5\nAllow: /\n")
    assert crawl_delay_ms(body, "somebot") == 2000
    assert crawl_delay_ms(body, "FastBot/9") == 500
    # absent / garbage / out-of-range -> None
    assert crawl_delay_ms("User-Agent: *\nDisallow: /", "b") is None
    assert crawl_delay_ms("User-Agent: *\nCrawl-delay: nope", "b") is None
    assert crawl_delay_ms("User-Agent: *\nCrawl-delay: 99999", "b") is None
    assert crawl_delay_ms(None, "b") is None
    # several winning groups: the polite MAX wins
    two = ("User-agent: *\nCrawl-delay: 1\nDisallow: /a/\n\n"
           "User-agent: *\nCrawl-delay: 3\nDisallow: /b/\n")
    assert crawl_delay_ms(two, "bot") == 3000
    # crawl-delay must not split a shared agent run (the pinned rule)
    shared = "User-agent: a\nCrawl-delay: 4\nUser-agent: b\nDisallow: /x/\n"
    assert crawl_delay_ms(shared, "a") == 4000
    assert crawl_delay_ms(shared, "b") == 4000
    assert not _decide(shared, "b", "/x/1")


def test_fetch_schedule_slots_and_etas(spark):
    from llmap_spark.operators.robots import fetch_schedule

    robots_df = spark.createDataFrame(
        [("slow.example", "User-Agent: *\nCrawl-delay: 5\nDisallow: /no/"),
         ("fast.example", "User-Agent: *\nDisallow: /no/")],
        "host string, body string")
    urls = spark.createDataFrame(
        [("https://slow.example/a",), ("https://slow.example/b",),
         ("https://slow.example/c",), ("https://fast.example/z",),
         ("https://nobots.example/q",)], "url string")
    out = {r.url: r for r in fetch_schedule(
        urls, robots_df, default_delay_ms=1000).collect()}
    assert len(out) == 5
    # slots follow url order within the host; etas are slot * delay
    assert (out["https://slow.example/a"].slot,
            out["https://slow.example/a"].eta_ms) == (0, 0)
    assert (out["https://slow.example/b"].slot,
            out["https://slow.example/b"].eta_ms) == (1, 5000)
    assert (out["https://slow.example/c"].eta_ms) == 10000
    # no declared delay / no robots row -> default
    assert out["https://fast.example/z"].delay_ms == 1000
    assert out["https://nobots.example/q"].delay_ms == 1000
    assert out["https://nobots.example/q"].slot == 0


def test_fetch_schedule_per_host_budget(spark):
    from pyspark.sql import functions as F

    from llmap_spark.operators.robots import fetch_schedule

    robots_df = spark.createDataFrame(
        [("h.example", "User-Agent: *\nCrawl-delay: 1")],
        "host string, body string")
    urls = spark.range(50).select(
        F.expr("concat('https://h.example/p', lpad(cast(id as string), "
               "3, '0'))").alias("url"))
    out = fetch_schedule(urls, robots_df, max_per_host=10).collect()
    assert len(out) == 10
    assert sorted(r.slot for r in out) == list(range(10))
    # deterministic: the KEPT urls are the 10 lexicographically first
    assert max(r.url for r in out) == "https://h.example/p009"
