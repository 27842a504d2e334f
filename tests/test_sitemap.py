"""Sitemap source (sources/sitemap.py): kernel totality + entity
handling, gzip, index detection, caps, and the Spark fan-out."""

from __future__ import annotations

import gzip

from llmap_spark.sources.sitemap import parse_sitemap, read_sitemaps


def _urlset(entries):
    items = "".join(
        f"<url><loc>{u}</loc>" + (f"<lastmod>{m}</lastmod>" if m else "")
        + "</url>" for u, m in entries)
    return ('<?xml version="1.0" encoding="UTF-8"?>\n'
            '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
            f"{items}</urlset>").encode()


def test_urlset_roundtrip_and_entities():
    body = _urlset([("https://a.example/p?x=1&amp;y=2", "2025-01-02"),
                    ("https://a.example/plain", None)])
    kind, entries = parse_sitemap(body)
    assert kind == "urlset"
    assert entries == [("https://a.example/p?x=1&y=2", "2025-01-02"),
                       ("https://a.example/plain", None)]


def test_gzip_and_index_detection():
    idx = (b'<?xml version="1.0"?><sitemapindex>'
           b"<sitemap><loc>https://a.example/s1.xml.gz</loc>"
           b"<lastmod>2025-01-01</lastmod></sitemap>"
           b"<sitemap><loc>https://a.example/s2.xml.gz</loc></sitemap>"
           b"</sitemapindex>")
    kind, entries = parse_sitemap(gzip.compress(idx, mtime=0))
    assert kind == "index"
    assert [e[0] for e in entries] == ["https://a.example/s1.xml.gz",
                                      "https://a.example/s2.xml.gz"]


def test_totality_on_garbage_and_truncation():
    assert parse_sitemap(None) == ("urlset", [])
    assert parse_sitemap(b"\x00\xffnot xml") == ("urlset", [])
    body = _urlset([(f"https://a.example/{i}", None) for i in range(5)])
    kind, entries = parse_sitemap(body[: len(body) // 2])
    assert kind == "urlset" and all(
        u.startswith("https://a.example/") for u, _ in entries)
    # truncated gzip: recover the decompressed prefix's entries
    gz = gzip.compress(body, mtime=0)
    k2, e2 = parse_sitemap(gz[:-8])
    assert k2 == "urlset"


def test_entry_cap():
    from llmap_spark.sources import sitemap as sm

    body = _urlset([(f"https://a.example/{i}", None)
                    for i in range(sm.MAX_URLS_PER_SITEMAP + 10)])
    _, entries = parse_sitemap(body)
    assert len(entries) == sm.MAX_URLS_PER_SITEMAP


def test_spark_fanout_with_carry(spark):
    rows = [
        ("h0", _urlset([("https://h0.example/a", "2025-01-01"),
                        ("https://h0.example/b", None)])),
        ("h1", gzip.compress(
            b"<sitemapindex><sitemap><loc>https://h1.example/s.xml</loc>"
            b"</sitemap></sitemapindex>", mtime=0)),
        ("h2", None),
        ("h3", b"garbage"),
    ]
    df = spark.createDataFrame(rows, "host string, body binary")
    got = sorted((r.host, r.loc, r.lastmod, r.kind)
                 for r in read_sitemaps(df, keep_cols=("host",)).collect())
    assert got == [
        ("h0", "https://h0.example/a", "2025-01-01", "url"),
        ("h0", "https://h0.example/b", None, "url"),
        ("h1", "https://h1.example/s.xml", None, "sitemap"),
    ]


def test_nested_entity_not_double_decoded():
    """'&amp;lt;' is XML for the literal text '&lt;' — decoding &amp;
    first would wrongly produce '<'."""
    body = (b"<urlset><url><loc>https://a.example/p?q=a&amp;lt;b</loc>"
            b"</url></urlset>")
    _, entries = parse_sitemap(body)
    assert entries == [("https://a.example/p?q=a&lt;b", None)]


def test_kernel_totality_fuzz():
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=300, deadline=None)
    @given(st.binary(max_size=400))
    def check(b):
        kind, entries = parse_sitemap(b)
        assert kind in ("urlset", "index")
        assert all(isinstance(u, str) for u, _ in entries)

    check()


def _tree_fetch(df):
    """Deterministic fetch seam for expand_frontier tests: a 3-level
    tree with a cycle (b.xml links back to the root)."""
    from pyspark.sql import functions as F

    def idx(*locs):
        inner = "".join(f"<sitemap><loc>{u}</loc></sitemap>" for u in locs)
        return f"<sitemapindex>{inner}</sitemapindex>"

    def urlset(*locs):
        inner = "".join(f"<url><loc>{u}</loc></url>" for u in locs)
        return f"<urlset>{inner}</urlset>"

    bodies = {
        "https://x/s.xml": idx("https://x/a.xml", "https://x/b.xml"),
        "https://x/a.xml": urlset("https://x/p1", "https://x/p2"),
        "https://x/b.xml": idx("https://x/c.xml", "https://x/s.xml"),
        "https://x/c.xml": urlset("https://x/p3"),
    }
    arms = " ".join(f"WHEN '{k}' THEN '{v}'" for k, v in bodies.items())
    return df.withColumn(
        "body", F.expr(f"cast(CASE loc {arms} END as binary)"))


def test_expand_frontier_multilevel_with_cycle(spark):
    from llmap_spark.sources.sitemap import expand_frontier

    seeds = spark.createDataFrame([("https://x/s.xml",)], "loc string")
    got = {(r.loc, r.src_loc, r.round)
           for r in expand_frontier(seeds, _tree_fetch).collect()}
    # a.xml's pages surface in round 2; c.xml (nested one level deeper
    # than spec) in round 3; the b->s cycle is anti-joined away
    assert got == {
        ("https://x/p1", "https://x/a.xml", 2),
        ("https://x/p2", "https://x/a.xml", 2),
        ("https://x/p3", "https://x/c.xml", 3),
    }


def test_expand_frontier_bounded_rounds(spark):
    from llmap_spark.sources.sitemap import expand_frontier

    seeds = spark.createDataFrame([("https://x/s.xml",)], "loc string")
    got = {(r.loc, r.round)
           for r in expand_frontier(seeds, _tree_fetch,
                                    max_rounds=2).collect()}
    # round 3 is cut off by the bound; rounds 1-2 results survive
    assert got == {("https://x/p1", 2), ("https://x/p2", 2)}


def test_expand_frontier_empty_seeds(spark):
    from llmap_spark.sources.sitemap import expand_frontier

    seeds = spark.createDataFrame([], "loc string")
    out = expand_frontier(seeds, _tree_fetch)
    assert out.count() == 0
    assert out.columns == ["loc", "lastmod", "src_loc", "round"]


def test_expand_frontier_urlset_seed_single_round(spark):
    """A seed that is already a urlset finishes in one round."""
    from llmap_spark.sources.sitemap import expand_frontier

    seeds = spark.createDataFrame([("https://x/a.xml",)], "loc string")
    got = {(r.loc, r.round)
           for r in expand_frontier(seeds, _tree_fetch).collect()}
    assert got == {("https://x/p1", 1), ("https://x/p2", 1)}
