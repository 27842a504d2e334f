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
