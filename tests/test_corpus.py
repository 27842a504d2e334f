"""Corpus generator determinism + schema contract."""

from __future__ import annotations

import pyarrow.parquet as pq

from llmap_spark import corpus, kernel


def test_schema_and_determinism(tmp_path):
    p1 = corpus.generate_pages("/root/testdata/sf0.001", str(tmp_path / "a.parquet"), pages_per_doc=1)
    p2 = corpus.generate_pages("/root/testdata/sf0.001", str(tmp_path / "b.parquet"), pages_per_doc=1)
    t1, t2 = pq.read_table(p1), pq.read_table(p2)
    assert t1.schema.equals(corpus.PAGES_SCHEMA)
    assert t1.equals(t2)  # byte-identical regeneration
    assert t1.num_rows == 500
    urls = t1.column("url").to_pylist()
    assert len(set(urls)) == len(urls)  # url is a primary key


def test_edge_rows_present(tmp_path):
    p = corpus.generate_pages("/root/testdata/sf0.001", str(tmp_path / "c.parquet"), pages_per_doc=1)
    t = pq.read_table(p)
    urls = t.column("url").to_pylist()
    kinds = {u.split("/edge/")[1].split("/")[0] for u in urls if "/edge/" in u}
    assert kinds == set(corpus.EDGE_RESIDUES.values())


def test_host_skew(tmp_path):
    p = corpus.generate_pages("/root/testdata/sf0.001", str(tmp_path / "d.parquet"), pages_per_doc=1)
    urls = pq.read_table(p).column("url").to_pylist()
    from collections import Counter

    hosts = Counter(u.split("/")[2] for u in urls)
    top = hosts.most_common(1)[0]
    assert top[0] in corpus.HOT_HOSTS
    assert top[1] > 0.1 * len(urls)  # hot host carries >10% of rows


def test_template0_roundtrip_invariant(tmp_path):
    """Pages i < ndocs (template 0, non-edge): extracted == normalized doc
    text. This is the SQL-expressible oracle invariant."""
    p = corpus.generate_pages("/root/testdata/sf0.001", str(tmp_path / "e.parquet"), pages_per_doc=1)
    t = pq.read_table(p)
    docs = pq.read_table("/root/testdata/sf0.001/documents.parquet")
    texts = {d: x for d, x in zip(docs.column("doc_id").to_pylist(),
                                  docs.column("text").to_pylist())}
    n = 0
    for url, html in zip(t.column("url").to_pylist(), t.column("html").to_pylist()):
        if "/t0/" not in url:
            continue
        doc_id = int(url.split("/d")[1].split("/")[0])
        r = kernel.extract_page(html)
        assert r.extracted_text == " ".join((texts[doc_id] or "").split()), url
        n += 1
    assert n > 400
