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
