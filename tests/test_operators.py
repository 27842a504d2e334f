"""Operator tests against independent oracles (DuckDB SQL / numpy / pure
Python), on the driver-provided sf0.001 documents + embeddings tables."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

DOCS = "/root/testdata/sf0.001/documents.parquet"
EMB = "/root/testdata/sf0.001/embeddings.parquet"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(DOCS)


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(EMB)


# -- textstats --------------------------------------------------------------

def test_token_count_vs_duckdb(spark, docs):
    from llmap_spark.operators.textstats import token_count

    got = {r.doc_id: r.n for r in
           docs.select("doc_id", token_count(F.col("text")).alias("n")).collect()}
    want = {r[0]: r[1] for r in duckdb.sql(f"""
        SELECT doc_id, CASE WHEN length(trim(regexp_replace(text,'\\s+',' ','g')))=0
          THEN 0 ELSE cast((length(trim(regexp_replace(text,'\\s+',' ','g')))
            - length(replace(trim(regexp_replace(text,'\\s+',' ','g')),' ','')))
            AS int) + 1 END
        FROM '{DOCS}'""").fetchall()}
    assert got == want
    # and equals python split() count
    pyw = {r.doc_id: len((r.text or "").split()) for r in docs.collect()}
    assert got == pyw


def test_lang_id_deterministic_and_portable(spark, docs):
    from llmap_spark.operators.textstats import lang_id

    got = {r.doc_id: r.pred_lang for r in
           lang_id(docs).select("doc_id", "pred_lang").collect()}
    # python oracle with the same rule
    rows = {r.doc_id: r.text for r in docs.collect()}
    markers = {"en": ("the", "and", "of"), "de": ("der", "und", "die"),
               "fr": ("le", "et", "les"), "es": ("el", "los", "que")}
    for d, t in rows.items():
        pad = f" {t} "
        cnt = {lg: sum(pad.count(f" {w} ") for w in ws)
               for lg, ws in markers.items()}
        if cnt["en"] >= cnt["de"] and cnt["en"] >= cnt["fr"] and cnt["en"] >= cnt["es"]:
            want = "en"
        elif cnt["de"] >= cnt["fr"] and cnt["de"] >= cnt["es"]:
            want = "de"
        elif cnt["fr"] >= cnt["es"]:
            want = "fr"
        else:
            want = "es"
        assert got[d] == want, d


def test_fingerprint_matches_duckdb(spark, docs):
    from llmap_spark.operators.textstats import fingerprint

    got = {r.doc_id: r.fingerprint for r in
           fingerprint(docs).select("doc_id", "fingerprint").collect()}
    want = {r[0]: r[1] for r in duckdb.sql(f"""
        SELECT doc_id, md5(trim(regexp_replace(text,'\\s+',' ','g')))
        FROM '{DOCS}'""").fetchall()}
    assert got == want


def test_quality_mwl_on_whitespace_heavy_text(spark):
    """Mean word length must be computed on squeezed text: raw length let
    whitespace runs inflate mwl and wrongly fail the q_keep bound."""
    from llmap_spark.operators.textstats import quality_features

    words = ["the", "and", "words", "here", "going", "along", "fine",
             "today", "again", "still", "more", "words"]
    rows = [(1, " ".join(words)), (2, ("   \n\t  ").join(words))]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.mwl_x100, r.q_keep)
           for r in quality_features(df).collect()}
    assert got[1] == got[2]  # whitespace amount cannot change the verdict
    assert got[1][1] is True


def test_repetition_features_planted(spark):
    from llmap_spark.operators.textstats import repetition_features

    rows = [
        (1, "all words here are completely distinct from one another today"),
        (2, "spam spam spam spam spam spam spam spam spam spam"),
        (3, "x"),   # fewer words than a 2-gram
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.dup_2gram_x1000, r.dup_3gram_x1000)
           for r in repetition_features(df).collect()}
    assert got[1] == (0, 0)
    assert got[2] == (888, 875)  # 9 2-grams 1 distinct; 8 3-grams 1 distinct
    assert got[3] == (0, 0)
    assert got[4] == (0, 0)


# -- dedup ------------------------------------------------------------------

def test_exact_dedup_finds_planted_dups(spark, docs):
    from llmap_spark.operators.dedup import exact_dedup

    # plant exact duplicates with new ids
    dup = docs.limit(20).withColumn("doc_id", F.col("doc_id") + 100000)
    d = exact_dedup(docs.unionByName(dup))
    dups = d.filter("is_dup").select("doc_id", "rep_id").collect()
    assert len(dups) == 20
    for r in dups:
        assert r.doc_id == r.rep_id + 100000


def test_exact_dedup_against_prior_snapshot(spark):
    """Incremental dedup: batch rows drop iff their fingerprint exists in
    the seen table; NULL text (NULL fingerprint) always survives; the
    survivor carries its fingerprint for the next snapshot round."""
    from llmap_spark.operators.dedup import exact_dedup_against
    from llmap_spark.operators.textstats import fingerprint

    seen_docs = spark.createDataFrame(
        [(0, "already crawled page text")], "doc_id long, text string")
    seen = fingerprint(seen_docs).select("fingerprint")
    batch = spark.createDataFrame(
        [(10, "already   crawled page\ttext"),  # normalized dup of seen
         (11, "a genuinely new page"),
         (12, None)],
        "doc_id long, text string")
    got = {r.doc_id: r.fingerprint
           for r in exact_dedup_against(batch, seen).collect()}
    assert set(got) == {11, 12}
    assert got[11] is not None and got[12] is None


def test_minhash_lsh_recall_vs_exact(spark, docs):
    """Planted near-dups (doc text + small suffix) must be found."""
    from llmap_spark.operators.dedup import minhash_lsh_candidates

    near = (docs.limit(30)
            .withColumn("doc_id", F.col("doc_id") + 100000)
            .withColumn("text", F.concat(F.col("text"), F.lit(" tiny suffix"))))
    allr = docs.unionByName(near)
    cand = minhash_lsh_candidates(allr, num_hashes=64, bands=16)
    pairs = {(r.id_a, r.id_b) for r in cand.filter("est_jaccard >= 0.5").collect()}
    found = sum((d, d + 100000) in pairs for d in range(30))
    assert found >= 27  # >=90% recall on planted near-dups
    # est_jaccard should be high for planted pairs
    ests = [r.est_jaccard for r in cand.collect()
            if (r.id_a, r.id_b) in {(d, d + 100000) for d in range(30)}]
    assert ests and min(ests) > 0.5


def test_simhash_candidates(spark, docs):
    from llmap_spark.operators.dedup import simhash_candidates

    near = (docs.limit(20)
            .withColumn("doc_id", F.col("doc_id") + 100000)
            .withColumn("text", F.concat(F.col("text"), F.lit(" zzz"))))
    cand = simhash_candidates(docs.unionByName(near), max_hamming=6)
    pairs = {(r.id_a, r.id_b) for r in cand.collect()}
    found = sum((d, d + 100000) in pairs for d in range(20))
    assert found >= 18
    for r in cand.collect():
        assert 0 <= r.hamming <= 6


@pytest.mark.parametrize("max_hamming", [3, 4, 6])
def test_simhash_banding_is_lossless(spark, docs, max_hamming):
    """The banded candidate set must equal the brute-force all-pairs set at
    the requested radius — the fixed 4-band split only guaranteed this up to
    Hamming 3 (pigeonhole needs max_hamming+1 bands)."""
    from llmap_spark.operators.dedup import simhash_candidates, simhash_udf

    base = docs.limit(40)
    near = (base.withColumn("doc_id", F.col("doc_id") + 100000)
            .withColumn("text", F.concat(F.col("text"), F.lit(" qq zz"))))
    allr = base.unionByName(near)
    sh = {r._id: r.sh for r in allr.select(
        F.col("doc_id").alias("_id"),
        simhash_udf()(F.col("text")).alias("sh")).collect() if r.sh != 0}
    ids = sorted(sh)
    want = {(a, b) for i, a in enumerate(ids) for b in ids[i + 1:]
            if bin((sh[a] ^ sh[b]) & ((1 << 64) - 1)).count("1") <= max_hamming}
    got = {(r.id_a, r.id_b) for r in
           simhash_candidates(allr, max_hamming=max_hamming).collect()}
    assert got == want
    assert want  # the planted pairs make the radius non-trivial


def test_ngram_jaccard_vs_duckdb(spark, docs):
    from llmap_spark.operators.dedup import ngram_jaccard_pairs

    small = docs.limit(60)
    got = {(r.id_a, r.id_b, r.inter, r.union_sz) for r in
           ngram_jaccard_pairs(small, n=3, threshold_num=1,
                               threshold_den=10).collect()}
    want = {tuple(r) for r in duckdb.sql(f"""
      WITH d AS (SELECT doc_id, string_split(trim(regexp_replace(text,'\\s+',' ','g')),' ') w
                 FROM '{DOCS}' WHERE doc_id < 60),
      g AS (SELECT DISTINCT doc_id,
              unnest(list_transform(generate_series(1, greatest(len(w)-2,0)),
                                    i -> w[i]||' '||w[i+1]||' '||w[i+2])) AS gram
            FROM d),
      sz AS (SELECT doc_id, count(*) sz FROM g GROUP BY 1),
      inter AS (SELECT a.doc_id id_a, b.doc_id id_b, count(*) inter
                FROM g a JOIN g b USING (gram) WHERE a.doc_id < b.doc_id
                GROUP BY 1, 2)
      SELECT id_a, id_b, inter, sa.sz + sb.sz - inter AS union_sz
      FROM inter JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
      WHERE 10 * inter >= 1 * (sa.sz + sb.sz - inter)""").fetchall()}
    assert got == want


def test_connected_components_vs_union_find(spark):
    from llmap_spark.operators.dedup import connected_components

    edges = [(1, 2), (2, 3), (10, 11), (12, 11), (20, 21), (3, 4), (40, 41)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r.node: r.component for r in connected_components(pairs).collect()}
    # python union-find oracle
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {n: find(n) for n in parent}
    assert got == want
    # both execution strategies produce the identical labeling: the
    # default adaptive driver fast path (taken here: 14 directed edges)
    # and the forced distributed pointer-doubling loop
    dist = {r.node: r.component for r in
            connected_components(pairs, driver_threshold=0).collect()}
    assert dist == want


# -- similarity ---------------------------------------------------------------

def _numpy_topk(vecs: dict, k: int):
    ids = np.array(sorted(vecs))
    m = np.array([vecs[i] for i in ids], dtype=np.float64)
    m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    sims = m @ m.T
    out = {}
    for qi, q in enumerate(ids):
        order = sorted(
            ((-sims[qi, j], ids[j]) for j in range(len(ids)) if ids[j] != q))
        out[q] = [int(n) for _, n in order[:k]]
    return out


def test_brute_force_topk_vs_numpy(spark, emb):
    from llmap_spark.operators.similarity import brute_force_topk

    vecs = {r.vec_id: list(r.embedding) for r in emb.collect()}
    want = _numpy_topk(vecs, k=5)
    got = {}
    res = brute_force_topk(spark, emb, emb, k=5).collect()
    for r in sorted(res, key=lambda r: (r.query_id, r.rank)):
        got.setdefault(r.query_id, []).append(r.neighbor_id)
    assert got == want


def test_ivf_recall_on_clustered_data(spark):
    """IVF is an approximation whose quality depends on cluster structure;
    the driver embeddings are isotropic noise (measured: intra-label and
    inter-label cosine both ~0), where any IVF recall ~= nprobe/ncentroids
    by construction. So recall is asserted on synthetic clustered vectors —
    the regime IVF exists for."""
    from llmap_spark.operators.similarity import brute_force_topk, ivf_topk

    rs = np.random.RandomState(7)
    centers = rs.normal(size=(8, 32))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    for i in range(400):
        c = centers[i % 8]
        v = c + 0.15 * rs.normal(size=32)
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    exact = brute_force_topk(spark, df, df, k=10).collect()
    approx = ivf_topk(spark, df, df, k=10, n_centroids=16, nprobe=4).collect()
    ex, ap = {}, {}
    for r in exact:
        ex.setdefault(r.query_id, set()).add(r.neighbor_id)
    for r in approx:
        ap.setdefault(r.query_id, set()).add(r.neighbor_id)
    recalls = [len(ex[q] & ap.get(q, set())) / len(ex[q]) for q in ex]
    assert float(np.mean(recalls)) >= 0.9


def test_ivf_recall_on_cluster_sorted_data(spark):
    """Same regime but rows SORTED BY CLUSTER across few partitions: a
    centroid sample via bare limit() reads only the first partitions (first
    clusters), leaving later clusters without nearby centroids — the
    hash-ordered sample must keep recall regardless of physical order."""
    from llmap_spark.operators.similarity import brute_force_topk, ivf_topk

    rs = np.random.RandomState(11)
    centers = rs.normal(size=(8, 32))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    for i in range(400):
        c = centers[i // 50]  # cluster-contiguous ids
        v = c + 0.15 * rs.normal(size=32)
        rows.append((i, [float(x) for x in v]))
    df = (spark.createDataFrame(rows, "vec_id long, embedding array<float>")
          .repartitionByRange(8, "vec_id"))  # partition == cluster

    exact = brute_force_topk(spark, df, df, k=10).collect()
    approx = ivf_topk(spark, df, df, k=10, n_centroids=16, nprobe=4,
                      sample_rows=120).collect()  # < one cluster per limit()
    ex, ap = {}, {}
    for r in exact:
        ex.setdefault(r.query_id, set()).add(r.neighbor_id)
    for r in approx:
        ap.setdefault(r.query_id, set()).add(r.neighbor_id)
    recalls = [len(ex[q] & ap.get(q, set())) / len(ex[q]) for q in ex]
    assert float(np.mean(recalls)) >= 0.9


def test_brute_force_chunks_large_query_side(spark, emb):
    """A query side larger than max_query_rows runs in bounded broadcast
    blocks (round 2 raised instead) and the chunked result is IDENTICAL to
    the single-block result — blocks partition query ids disjointly, so
    chunking must not change a single row."""
    from llmap_spark.operators.similarity import brute_force_topk

    one_block = brute_force_topk(spark, emb, emb, k=3)
    chunked = brute_force_topk(spark, emb, emb, k=3, max_query_rows=10)
    key = ["query_id", "neighbor_id", "rank"]
    assert sorted(map(tuple, one_block.select(*key).collect())) == \
        sorted(map(tuple, chunked.select(*key).collect()))


def test_embedding_neardup_pairs_ivf_path(spark):
    """Planted duplicate-ish vectors must surface as near-dup pairs through
    the default (IVF both sides, no driver collect) path."""
    from llmap_spark.operators.similarity import embedding_neardup_pairs

    rs = np.random.RandomState(3)
    base = rs.normal(size=(200, 32))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = [(i, [float(x) for x in base[i]]) for i in range(200)]
    # ids 1000+i are near-copies of ids 0..19
    for i in range(20):
        v = base[i] + 0.01 * rs.normal(size=32)
        rows.append((1000 + i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = {(r.id_a, r.id_b) for r in
             embedding_neardup_pairs(spark, df, threshold=0.98,
                                     n_centroids=8, nprobe=2).collect()}
    found = sum((i, 1000 + i) in pairs for i in range(20))
    assert found >= 18


def test_embedding_lsh_neardup_recall_and_precision(spark):
    """Random-hyperplane LSH near-dup: planted near-copies found; reported
    cosine is the EXACT JVM dot (checked against numpy); no pair below the
    threshold leaks through."""
    from llmap_spark.operators.similarity import embedding_lsh_neardup

    rs = np.random.RandomState(5)
    base = rs.normal(size=(150, 32))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = [(i, [float(x) for x in base[i]]) for i in range(150)]
    for i in range(20):
        v = base[i] + 0.02 * rs.normal(size=32)
        rows.append((1000 + i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = embedding_lsh_neardup(df, max_hamming=8, threshold=0.95)
    got = {(r.id_a, r.id_b): r.cos_x1000000 for r in out.collect()}
    found = sum((i, 1000 + i) in got for i in range(20))
    assert found >= 18  # >=90% recall on planted pairs
    # exact-cosine verify: spot-check values against numpy
    vecs = {i: np.asarray(v, dtype=np.float64) for i, v in rows}
    for (a, b), cx in got.items():
        va, vb = vecs[a], vecs[b]
        want = float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb)))
        assert cx >= 950_000
        assert abs(cx - int(np.floor(want * 1_000_000))) <= 1


def test_topk_total_on_null_and_ragged_embeddings(spark):
    """One NULL/ragged embedding must not kill the job (never-raise rule);
    null rows simply never rank as neighbors."""
    from llmap_spark.operators.similarity import brute_force_topk, ivf_topk

    rs = np.random.RandomState(13)
    rows = [(i, [float(x) for x in rs.normal(size=8)]) for i in range(30)]
    rows += [(100, None), (101, [1.0])]  # null + ragged
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    bf = brute_force_topk(spark, df, df, k=3).collect()
    assert bf  # ran to completion
    ivf = ivf_topk(spark, df, df, k=3, n_centroids=4, nprobe=2).collect()
    assert ivf


def test_exact_dedup_null_text_never_dup(spark):
    from llmap_spark.operators.dedup import exact_dedup

    rows = [(1, "same real content here"), (2, "same real content here"),
            (3, None), (4, None), (5, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.rep_id, r.is_dup) for r in exact_dedup(df).collect()}
    assert got[1] == (1, False) and got[2] == (1, True)
    # null-text docs are UNKNOWN content, each its own representative
    for d in (3, 4, 5):
        assert got[d] == (d, False)


def test_exact_dedup_preserves_rows_and_extra_columns(spark):
    """The verdict re-attach must neither drop nor multiply rows: every
    input row (including a pathological NULL-id one) comes back exactly
    once with its extra columns intact, and a pre-existing fingerprint
    column is replaced, not ambiguated (the round-4 single-md5-pass
    rewrite briefly used an inner id join that dropped null-id rows)."""
    from llmap_spark.operators.dedup import exact_dedup

    rows = [(1, "same real content here", "a", "stale"),
            (2, "same real content here", "b", "stale"),
            (None, "loner content row", "c", "stale"),
            (7, None, "d", "stale")]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, tag string, fingerprint string")
    out = exact_dedup(df).collect()
    assert len(out) == len(rows)
    got = {r.tag: r for r in out}
    assert got["a"].rep_id == 1 and got["b"].is_dup
    assert got["a"].fingerprint != "stale"  # replaced, not duplicated
    # null id survives as its own row, with is_dup FALSE not NULL — a
    # NULL is_dup would make downstream filter(~is_dup) silently drop it
    assert got["c"].rep_id is None
    assert got["c"].is_dup is False
    assert got["d"].fingerprint is None and not got["d"].is_dup


def test_embedding_lsh_neardup_total_on_degenerate_input(spark):
    """Never-raise rule: empty corpus, NULL embeddings, and ragged rows
    all flow through without exceptions and never appear in pairs."""
    from llmap_spark.operators.similarity import embedding_lsh_neardup

    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert embedding_lsh_neardup(empty).count() == 0

    rs = np.random.RandomState(9)
    v = rs.normal(size=16)
    rows = [(1, [float(x) for x in v]), (2, [float(x) for x in v]),
            (3, None), (4, [0.0] * 16), (5, [1.0, 2.0])]  # null/zero/ragged
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = {(r.id_a, r.id_b) for r in
             embedding_lsh_neardup(df, max_hamming=4, threshold=0.99).collect()}
    assert (1, 2) in pairs
    assert all(a not in (3, 4, 5) and b not in (3, 4, 5) for a, b in pairs)


# -- binpack ------------------------------------------------------------------

def test_collate_greedy_matches_reference_loop(spark, docs):
    from llmap_spark.operators.binpack import collate_greedy, greedy_pack

    got = {r.doc_id: r.group_id for r in
           collate_greedy(docs, "doc_id", "n_chars", budget=5000).collect()}
    rows = sorted((r.doc_id, r.n_chars) for r in docs.collect())
    want = dict(zip([d for d, _ in rows],
                    greedy_pack([c for _, c in rows], 5000)))
    assert got == want


def test_collate_approx_vs_duckdb(spark, docs):
    from llmap_spark.operators.binpack import collate_approx

    got = {r.doc_id: r.group_id for r in
           collate_approx(docs, "doc_id", "n_chars", budget=5000).collect()}
    want = {r[0]: r[1] for r in duckdb.sql(f"""
        SELECT doc_id, cast(floor(coalesce(sum(n_chars) OVER
          (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),0)
          / 5000) AS bigint)
        FROM '{DOCS}'""").fetchall()}
    assert got == want


# -- multimodal ----------------------------------------------------------------

def test_media_sniff_and_features(spark):
    from llmap_spark.functions.multimodal import sniff_media_type, with_media_features

    rows = [
        (1, b"\xff\xd8\xff\xe0" + b"\x00" * 32),
        (2, b"\x89PNG\r\n\x1a\n" + b"abc" * 10),
        (3, b"<!DOCTYPE html><p>x</p>"),
        (4, None),
        (5, b"\x00\x01\x02\x03"),
    ]
    df = spark.createDataFrame(rows, "id long, payload binary")
    got = {r.id: r.mt for r in
           df.select("id", sniff_media_type(F.col("payload")).alias("mt")).collect()}
    assert got == {1: "image/jpeg", 2: "image/png", 3: "text/html",
                   4: None, 5: "application/octet-stream"}

    feats = with_media_features(df, "payload", keep_cols=("id",))
    out = {r.id: (r.n_bytes, r.entropy_x1000) for r in feats.collect()}
    assert out[4] == (0, 0)
    assert out[1][0] == 36
    # determinism
    out2 = {r.id: (r.n_bytes, r.entropy_x1000) for r in
            with_media_features(df, "payload", keep_cols=("id",)).collect()}
    assert out == out2


def test_frame_sample_fanout(spark):
    import zlib

    from llmap_spark.functions.multimodal import with_frame_samples

    payload = bytes(range(200))
    rows = [(1, payload), (2, None), (3, b""), (4, b"xy")]
    df = spark.createDataFrame(rows, "id long, payload binary")
    out = with_frame_samples(df, "payload", keep_cols=("id",), n_frames=4)
    got = {}
    for r in out.collect():
        got.setdefault(r.id, []).append(
            (r.frame_idx, r.frame_offset, r.frame_len, r.frame_crc32))
    assert len(got[1]) == 4  # 1 payload -> 4 frame rows
    for fi, off, ln, crc in got[1]:
        assert off == fi * 50 and ln == 50
        assert crc == zlib.crc32(payload[off:off + 50])
    assert 2 not in got and 3 not in got  # null/empty payloads emit nothing
    assert len(got[4]) == 2  # tiny payload: bounded by its length
    # determinism
    again = with_frame_samples(df, "payload", keep_cols=("id",), n_frames=4)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))


def test_decode_image_png_real_others_marked_stub():
    """Round 5: PNG/GIF/JPEG decode are REAL; only WebP's VP8 entropy
    coder keeps the documented NotImplementedError seam."""
    from llmap_spark.functions.multimodal import decode_image
    from llmap_spark.media_meta import make_png, make_webp

    img = decode_image(make_png(6, 4, 8))
    assert (img.status, img.width, img.height) == ("ok", 6, 4)
    assert img.pixels == b"\x00" * 24
    # a truncated JPEG is RECOGNIZED and carries a typed status
    assert decode_image(b"\xff\xd8\xff\xd9").status == "truncated"
    with pytest.raises(NotImplementedError):
        decode_image(make_webp(10, 10, "vp8"))


# -- links ----------------------------------------------------------------------

def test_link_host_edges_planted(spark):
    from llmap_spark.operators.links import link_host_edges

    rows = [
        ("https://a.example/p1",
         b'<a href="https://b.example/x">b</a><a href="/rel">r</a>'
         b'<a href="#frag">f</a><a href="javascript:void(0)">j</a>'
         b'<a href="mailto:x@y.com">m</a><a href="tel:+123">t</a>'
         b'<a href="//d.example/pr">pr</a>'
         b'<a href="HTTP://B.Example/up">upper</a>'
         b'<a href="https://b.example/y">b2</a>'),
        ("https://a.example/p2", b'<a href="https://c.example/z">c</a>'),
        ("https://b.example/p1", b'<a href="https://a.example/h">a</a>'),
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    got = {(r.src_host, r.dst_host): r.n_links
           for r in link_host_edges(df).collect()}
    assert got == {
        ("a.example", "b.example"): 3,   # two https + one HTTP:// (RFC 3986
                                         # schemes/hosts are case-insensitive)
        ("a.example", "a.example"): 1,   # path-relative -> source host
        ("a.example", "d.example"): 1,   # protocol-relative -> its host
        ("a.example", "c.example"): 1,
        ("b.example", "a.example"): 1,
        # mailto/tel/javascript/#fragment contribute nothing
    }


def test_extract_anchor_links_nofollow(spark):
    from llmap_spark.operators.links import extract_anchor_links

    html = ('<p>x</p><a href="https://a.example/1">one</a>'
            '<a rel="nofollow" href="https://b.example/2">two</a>'
            '<A HREF="https://c.example/3" REL="me NOFOLLOW">three</A>'
            '<a rel="author" href="https://d.example/4">four</a>'
            '<a name="anchor-no-href">five</a>'
            '<a data-rel="nofollow" href="https://e.example/5">six</a>'
            '<a data-href="javascript:x" class="js">seven</a>')
    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    rows = df.select(F.explode(extract_anchor_links(F.col("html")))
                     .alias("l")).select("l.href", "l.nofollow").collect()
    got = [(r.href, r.nofollow) for r in rows]
    assert got == [("https://a.example/1", False),
                   ("https://b.example/2", True),
                   ("https://c.example/3", True),  # attr case-insensitive
                   ("https://d.example/4", False),
                   # data-rel is NOT rel; data-href is NOT a link at all
                   ("https://e.example/5", False)]


def test_filter_blocklisted_hosts_broadcast_anti_join(spark):
    from llmap_spark.operators.links import filter_blocklisted_hosts

    df = spark.createDataFrame(
        [(1, "https://Spam.Example/p"), (2, "https://good.example/p"),
         (3, "relative/path"), (4, "https://spam.example:443/q"),
         (5, "https://x@spam.example/p"),     # userinfo cannot evade
         (6, "https://spam.example:8080/q")],  # nor a non-default port
        "doc_id long, url string")
    bl = spark.createDataFrame([("SPAM.example",)], "host string")
    out = filter_blocklisted_hosts(df, bl)
    assert {r.doc_id for r in out.collect()} == {2, 3}
    # the gate keys on the bare registrable host: case-insensitive both
    # sides, userinfo and ANY port stripped, relative urls ('' host)
    # untouched; schema untouched
    assert out.columns == ["doc_id", "url"]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    # a stray blank blocklist line must NOT drop the ''-host (relative)
    # rows; and a pre-existing _bl_host caller column survives
    bl2 = spark.createDataFrame([("spam.example",), ("",)], "host string")
    df2 = df.withColumn("_bl_host", F.lit("mine"))
    out2 = filter_blocklisted_hosts(df2, bl2)
    assert {r.doc_id for r in out2.collect()} == {2, 3}
    assert {r._bl_host for r in out2.collect()} == {"mine"}


def test_reputation_blocklist_composes_with_filter(spark, docs):
    """The derived-blocklist loop: per-host quality stats -> low-keep-rate
    hosts -> broadcast anti-join gate. A planted spam host (junk docs)
    is blocked; a healthy host survives."""
    from llmap_spark.operators.links import (filter_blocklisted_hosts,
                                             host_quality_stats,
                                             reputation_blocklist)

    # deterministic slice (limit() on an unordered scan can pick different
    # rows across the two evaluations below)
    good = docs.filter("doc_id < 10").select(
        "doc_id", "text",
        F.concat(F.lit("https://good.example/p"),
                 F.col("doc_id").cast("string")).alias("url"))
    spam = spark.createDataFrame(
        [(1000 + i, "zz qq xx") for i in range(10)],
        "doc_id long, text string").withColumn(
        "url", F.concat(F.lit("https://spam.example/p"),
                        F.col("doc_id").cast("string")))
    allr = good.unionByName(spam)
    stats = host_quality_stats(allr)
    got = {r.host: (r.n_docs, r.n_keep) for r in stats.collect()}
    assert got["good.example"][0] == 10 and got["good.example"][1] >= 8
    assert got["spam.example"] == (10, 0)
    bl = reputation_blocklist(stats, min_docs=5, max_keep_rate_bp=2000)
    assert {r.host for r in bl.collect()} == {"spam.example"}
    kept = filter_blocklisted_hosts(allr, bl)
    assert {r.doc_id for r in kept.collect()} == \
        {r.doc_id for r in good.collect()}


def test_canonical_url_rules(spark):
    from llmap_spark.operators.links import canonical_url

    cases = [
        ("HTTP://WWW.Ex.COM:80/Path?q=A#frag", "http://www.ex.com/Path?q=A"),
        ("https://Host:443/a", "https://host/a"),
        ("https://Host:8443/a", "https://host:8443/a"),  # non-default kept
        ("http://h/a?", "http://h/a"),                   # bare '?' stripped
        ("FTP://Host:80/x", "ftp://host:80/x"),          # non-http port kept
        ("relative/path#x", "relative/path#x"),          # no scheme: as-is
        ("", ""),
    ]
    df = spark.createDataFrame([(i, u) for i, (u, _) in enumerate(cases)],
                               "i long, u string")
    got = {r.i: r.c for r in
           df.select("i", canonical_url(F.col("u")).alias("c")).collect()}
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, got[i], want)


def test_canonical_url_idempotent(spark):
    """canonical(canonical(u)) == canonical(u): a dedup key that keeps
    changing under re-application corrupts any join keyed on it."""
    from llmap_spark.operators.links import canonical_url

    urls = [
        "HTTP://WWW.Ex.COM:80/Path?q=A#frag", "https://Host:443/a",
        "https://Host:8443/a?x=1&y=2", "http://h/a?", "FTP://Host:80/x",
        "relative/path#x", "", "HtTpS://A.B.C:443:443/weird",
        "http://h:80:80/", "https://h/p#a#b", "mailto:x@y.z",
        # a trailing '?' that is NOT the (empty-query) separator must not
        # be stripped: doing so both mutated a real query and broke
        # idempotency (review-found)
        "http://h/p??", "http://h/p?a=1?",
    ]
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)],
                               "i long, u string")
    once = df.select("i", canonical_url(F.col("u")).alias("c1"))
    twice = once.select("i", "c1", canonical_url(F.col("c1")).alias("c2"))
    for r in twice.collect():
        assert r.c1 == r.c2, (r.i, r.c1, r.c2)


def test_link_graph_on_corpus_is_nonempty(spark):
    from llmap_spark.corpus import pages_path_for
    from llmap_spark.operators.links import link_host_edges

    pages = spark.read.parquet(pages_path_for("/root/testdata/sf0.001"))
    edges = link_host_edges(pages)
    rows = edges.collect()
    assert rows
    # corpus links are all relative -> every edge is a self-loop
    assert all(r.src_host == r.dst_host for r in rows)
    assert sum(r.n_links for r in rows) > 0


# -- sessions -----------------------------------------------------------------

def test_sessionize_vs_python(spark):
    from datetime import datetime, timedelta

    from llmap_spark.operators.sessions import sessionize

    base = datetime(2025, 1, 1)
    rows = [  # user 1: gaps 10s, 2000s, 5s -> sessions 1,1,2,2
        (1, 1, base), (2, 1, base + timedelta(seconds=10)),
        (3, 1, base + timedelta(seconds=2010)),
        (4, 1, base + timedelta(seconds=2015)),
        # user 2: single event
        (5, 2, base),
        # user 3: tie on ts broken by event_id
        (6, 3, base), (7, 3, base),
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    got = {r.event_id: r.session_id for r in sessionize(df).collect()}
    assert got == {1: 1, 2: 1, 3: 2, 4: 2, 5: 1, 6: 1, 7: 1}


def test_asof_prior_event(spark):
    from datetime import datetime, timedelta

    from llmap_spark.operators.sessions import asof_prior_event

    base = datetime(2025, 1, 1)
    rows = [
        (1, 1, base, "view"),
        (2, 1, base + timedelta(seconds=5), "purchase"),
        (3, 1, base + timedelta(seconds=9), "view"),
        (4, 1, base + timedelta(seconds=12), "purchase"),
        (5, 1, base + timedelta(seconds=20), "click"),
        (6, 2, base, "click"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string")
    got = {r.event_id: r.prev_purchase_id for r in asof_prior_event(df).collect()}
    assert got == {1: None, 2: None, 3: 2, 4: 2, 5: 4, 6: None}


def test_extract_any_dispatch(spark):
    from llmap_spark.functions.multimodal import extract_any
    from llmap_spark.pdf import make_pdf

    # text-less PDF -> empty status, no exception
    r = extract_any(b"%PDF-1.7\n1 0 obj\n<<>>\nendobj")
    assert r.status == "empty" and r.extracted_text == ""
    # real PDF -> real text through the same dispatch
    r1 = extract_any(make_pdf("pdf body words extracted through dispatch", 3))
    assert r1.status == "ok"
    assert r1.extracted_text == "pdf body words extracted through dispatch"
    html = b"<html><body><p>plain html paragraph with enough words to be kept here</p></body></html>"
    r2 = extract_any(html)
    assert r2.status == "ok" and "plain html paragraph" in r2.extracted_text


# -- review-fix regressions ---------------------------------------------------

def test_empty_queries_topk_returns_empty(spark, emb):
    from llmap_spark.operators.similarity import brute_force_topk, ivf_topk

    none = emb.filter("vec_id < 0")
    assert brute_force_topk(spark, emb, none, k=3).count() == 0
    assert brute_force_topk(spark, none, none, k=3).count() == 0
    assert ivf_topk(spark, none, none, k=3).count() == 0


def test_shingleless_docs_are_not_duplicates(spark):
    from llmap_spark.operators.dedup import (minhash_lsh_candidates,
                                             simhash_candidates)

    rows = [(1, "a"), (2, "zz"), (3, ""), (4, "   "),
            (5, "a real document with plenty of words to shingle properly today"),
            (6, "a real document with plenty of words to shingle properly today")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    mh = {(r.id_a, r.id_b) for r in minhash_lsh_candidates(df).collect()}
    assert mh == {(5, 6)}  # tiny/empty docs never pair with each other
    sh = {(r.id_a, r.id_b) for r in simhash_candidates(df, max_hamming=3).collect()}
    assert (5, 6) in sh
    assert all(a not in (1, 2, 3, 4) and b not in (1, 2, 3, 4) for a, b in sh)


def test_training_pipeline_kept_documents(spark, docs):
    """End-to-end curation on planted data: low-quality docs gated, exact
    duplicates collapse to the min id, near-duplicates collapse to the min
    id of their component, everything else survives."""
    from llmap_spark.plans.training import kept_documents

    base = docs.limit(40)  # real corpus docs: all pass the quality gate
    exact_dup = (base.filter("doc_id < 5")
                 .withColumn("doc_id", F.col("doc_id") + 200000))
    near_dup = (base.filter("doc_id >= 5 and doc_id < 10")
                .withColumn("doc_id", F.col("doc_id") + 300000)
                .withColumn("text", F.concat(F.col("text"), F.lit(" tiny tail"))))
    junk = spark.createDataFrame(
        [(400000, "short"), (400001, "zz qq"), (400002, "")],
        "doc_id long, text string").withColumn("lang", F.lit("en")) \
        .withColumn("n_chars", F.length("text"))
    allr = base.unionByName(exact_dup.select(*junk.columns)
                            .unionByName(near_dup.select(*junk.columns))
                            .unionByName(junk), allowMissingColumns=True)
    kept = {r.doc_id for r in kept_documents(allr).collect()}
    # every planted duplicate/junk id is gone; winners are originals
    assert all(k < 40 for k in kept)
    assert set(range(5)) <= kept          # exact-dup winners survive
    assert set(range(5, 10)) <= kept      # near-dup winners survive
    # corpus-specific but deterministic facts (sf0.001 documents):
    # 14/27/32/33 fail the quality gate; 12 is a GENUINE near-dup of 8
    # already present in the corpus (est_jaccard ~0.98) and loses to it
    assert kept == set(range(40)) - {14, 27, 32, 33, 12}
    # determinism
    kept2 = {r.doc_id for r in kept_documents(allr).collect()}
    assert kept == kept2


def test_training_pipeline_respects_text_col(spark, docs):
    """The quality gate must read the configured text column (it silently
    hard-coded 'text' once: wrong gate when a stale 'text' column exists)."""
    from llmap_spark.plans.training import kept_documents

    renamed = (docs.limit(30).withColumnRenamed("text", "body")
               .withColumn("text", F.lit("zz")))  # stale decoy column
    kept = {r.doc_id for r in
            kept_documents(renamed, text_col="body").collect()}
    # with the decoy gating, nothing would pass quality at all
    assert len(kept) >= 20


def test_curated_corpus_composes_scrub_stages(spark, docs):
    """The deliverable chain: keep-list survivors come back with text,
    contaminated docs drop, cross-doc duplicate paragraphs vanish, and PII
    redacts — all in one lazy plan."""
    from llmap_spark.plans.training import curated_corpus

    # deterministic slice: limit() on an unordered scan can pick different
    # rows across the many branch evaluations below
    base = docs.filter("doc_id < 20")
    pii = spark.createDataFrame(
        [(500000, "a perfectly fine long document about sorting that asks "
                  "you to write to someone@example.com for more details "
                  "and enough words to pass every quality gate today")],
        "doc_id long, text string")
    allr = base.select("doc_id", "text").unionByName(pii)
    # benchmark = doc 0's text: doc 0 must drop as contaminated
    bench = base.filter("doc_id = 0").select("text")
    out = {r.doc_id: r for r in
           curated_corpus(allr, benchmark=bench).collect()}
    assert 0 not in out                      # decontaminated away
    assert 500000 in out
    assert "<EMAIL>" in out[500000].text     # redacted
    assert "someone@example.com" not in out[500000].text
    assert out[500000].n_emails == 1
    # quality-gate failures from the sf0.001 corpus prefix (see
    # test_training_pipeline_kept_documents): 14 fails the gate
    assert 14 not in out
    # stages toggle off cleanly
    plain = {r.doc_id: r for r in
             curated_corpus(allr, paragraph_dedup=False,
                            redact=False).collect()}
    assert plain[500000].n_emails is None
    assert "someone@example.com" in plain[500000].text
    # opt-in NFC stage composes before fingerprinting
    accented = allr.withColumn(
        "text", F.concat(F.col("text"), F.lit(" café")))
    nfc_out = {r.doc_id: r for r in
               curated_corpus(accented, nfc=True).collect()}
    assert any("caf\u00e9" in r.text for r in nfc_out.values())


def test_connected_components_nonconvergence_raises(spark):
    from llmap_spark.operators.dedup import connected_components

    # pointer doubling reaches distance ~2^rounds, so a diameter-60 chain
    # cannot converge in 2 rounds
    chain = [(i, i + 1) for i in range(60)]
    pairs = spark.createDataFrame(chain, "id_a long, id_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_iter=2, strict=True,
                             driver_threshold=0)
    # non-strict returns (possibly split) labels without raising
    out = connected_components(pairs, max_iter=2, strict=False,
                               driver_threshold=0)
    assert out.count() == 61


def test_connected_components_long_path_converges_fast(spark):
    """A 1000-node path has diameter 1000: one-hop min propagation needs
    ~1000 rounds, pointer doubling must finish within ~log2(1000)+slack."""
    from llmap_spark.operators.dedup import connected_components

    chain = [(i, i + 1) for i in range(999)]
    pairs = spark.createDataFrame(chain, "id_a long, id_b long")
    out = connected_components(pairs, max_iter=16, strict=True,
                               driver_threshold=0)
    comps = {r.component for r in out.collect()}
    assert comps == {0}
    assert out.count() == 1000


def test_simhash_hot_bucket_cap(spark):
    """A planted hot bucket (many identical-simhash docs -> every band
    bucket holds all of them) must be DROPPED under max_bucket, and kept
    under max_bucket=None (the lossless contract). This pins the scale
    guard the round-2 verdict flagged: uncapped simhash band buckets grow
    linearly with corpus size and send the self-join quadratic."""
    from llmap_spark.operators.dedup import simhash_candidates

    n = 30
    rows = [(i, "the same exact boilerplate sentence repeated verbatim")
            for i in range(n)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    capped = simhash_candidates(df, max_hamming=4, max_bucket=10).collect()
    assert capped == []  # every band bucket holds n=30 > 10 -> all dropped
    lossless = simhash_candidates(df, max_hamming=4, max_bucket=None).collect()
    assert len(lossless) == n * (n - 1) // 2


def test_connected_components_reliable_checkpoint(spark, tmp_path):
    """reliable=True must produce identical components via cluster
    checkpoints (recoverable on executor loss, unlike localCheckpoint),
    and must REFUSE to run without a checkpoint location."""
    from llmap_spark.operators.dedup import connected_components

    edges = [(1, 2), (2, 3), (10, 11), (12, 11), (3, 4), (40, 41)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    want = {r.node: r.component for r in connected_components(pairs).collect()}
    got = {r.node: r.component for r in
           connected_components(pairs, reliable=True, driver_threshold=0,
                                checkpoint_dir=str(tmp_path / "ck")).collect()}
    assert got == want


def test_release_persisted_registry(spark, docs):
    """Lazy operators register their persisted frames; release_persisted
    unpersists them all (the round-2 leak-by-default ADVICE item)."""
    from llmap_spark.cache import release_persisted
    from llmap_spark.operators.dedup import minhash_lsh_candidates

    release_persisted()  # drain anything earlier tests left behind
    cand = minhash_lsh_candidates(docs.limit(50))  # lazy default
    cand.count()
    assert release_persisted() >= 1
    assert release_persisted() == 0  # drained; second call is a no-op


def test_as_matrix_modal_dim_survives_ragged_leading_row():
    """dim inference uses the MODAL row length: a corrupt leading row must
    not silently zero every well-formed row (round-2 ADVICE)."""
    from llmap_spark.operators.similarity import _as_matrix

    rows = [[1.0, 2.0, 3.0, 4.0, 5.0],      # ragged leader (wrong dim)
            [1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 2.0]]
    m = _as_matrix(rows)
    assert m.shape == (4, 3)
    assert np.allclose(m[0], 0.0)           # the ragged row zeroes
    assert np.allclose(m[1:], np.asarray(rows[1:]))  # the rest survive


def test_host_of_stops_at_query_and_fragment(spark):
    """Slash-less urls with a query/fragment must not leak it into the
    host key — 'http://h?x=1' previously produced host 'h?x=1', splitting
    one real host into many graph nodes (review-found)."""
    from llmap_spark.operators.links import host_of

    rows = [(1, "http://example.com?x=1"), (2, "http://example.com#top"),
            (3, "HTTPS://Example.COM"), (4, "http://example.com/a?x=1")]
    df = spark.createDataFrame(rows, "i long, u string")
    got = {r.i: r.h for r in df.select("i", host_of(F.col("u")).alias("h")).collect()}
    assert got == {1: "example.com", 2: "example.com",
                   3: "example.com", 4: "example.com"}


def test_hamming_band_pairs_radius_zero(spark):
    """max_hamming=0 (one 64-bit band) is in the documented range and must
    work: the (1<<64)-1 mask literal overflowed a signed long
    (review-found). Radius 0 == exact sketch equality."""
    from llmap_spark.operators.dedup import hamming_band_pairs

    rows = [(1, 5), (2, 5), (3, 7), (4, -9223372036854775808)]
    s = spark.createDataFrame(rows, "_id long, sh long")
    got = {(r.id_a, r.id_b, r.hamming)
           for r in hamming_band_pairs(s, 0).collect()}
    assert got == {(1, 2, 0)}


def test_ngram_jaccard_blank_docs_never_pair(spark):
    """At n=1, split('') is [''] — blank docs previously shared the ''
    gram and paired with every other blank doc at Jaccard 1, an uncapped
    quadratic join (review-found)."""
    from llmap_spark.operators.dedup import ngram_jaccard_pairs

    rows = [(1, ""), (2, "   "), (3, ""), (4, "real words here"),
            (5, "real words here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.id_a, r.id_b) for r in
           ngram_jaccard_pairs(df, n=1, threshold_num=1,
                               threshold_den=2).collect()}
    assert got == {(4, 5)}


def test_sniff_riff_dispatches_on_fourcc(spark):
    """RIFF is a container: WAVE -> audio/wav, WEBP -> image/webp, AVI ->
    video/avi, unknown RIFF -> octet-stream. Labeling every RIFF as
    audio/wav routed WebP images into the audio bucket (review-found)."""
    from llmap_spark.functions.multimodal import sniff_media_type

    rows = [(1, b"RIFF\x10\x00\x00\x00WAVEfmt "),
            (2, b"RIFF\x10\x00\x00\x00WEBPVP8 "),
            (3, b"RIFF\x10\x00\x00\x00AVI LIST"),
            (4, b"RIFF\x10\x00\x00\x00XXXXdata")]
    df = spark.createDataFrame(rows, "id long, payload binary")
    got = {r.id: r.mt for r in
           df.select("id", sniff_media_type(F.col("payload")).alias("mt")).collect()}
    assert got == {1: "audio/wav", 2: "image/webp", 3: "video/avi",
                   4: "application/octet-stream"}


def test_minhash_duplicate_ids_no_self_pairs(spark):
    """A duplicated doc_id in the input must not emit (x, x) self-pairs
    from the in-array pair expansion (the self-join branch's strict <
    filter applies to the grouped branch too)."""
    from llmap_spark.operators.dedup import minhash_lsh_candidates

    base = "the quick brown fox jumps over the lazy dog " * 5
    rows = [(1, base), (1, base), (2, base + " tail")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = minhash_lsh_candidates(df, materialize=True).collect()
    assert all(r.id_a < r.id_b for r in pairs)


def test_canonical_url_embedded_newline_keeps_path(spark):
    """Java regex '.' excludes newlines: without DOTALL, a URL with an
    embedded newline lost its whole path+query and collapsed onto the
    bare scheme://host dedup key."""
    from llmap_spark.operators.links import canonical_url

    rows = [(1, "http://h.example/a\nb"), (2, "http://h.example/c\r2"),
            (3, "HTTP://H.example:80/x#f\nrag")]
    df = spark.createDataFrame(rows, "id long, url string")
    got = {r.id: r.c for r in df.select(
        "id", canonical_url(F.col("url")).alias("c")).collect()}
    assert got[1] == "http://h.example/a\nb"
    assert got[2] == "http://h.example/c\r2"
    assert got[3] == "http://h.example/x"  # fragment strip spans the \n
    assert got[1] != got[2]  # distinct pages stay distinct


def test_link_host_edges_trims_whitespace_hrefs(spark):
    """Whitespace-prefixed hrefs (pretty-printed HTML) must classify by
    their trimmed value — not fall through every anchored pattern into a
    bogus SELF edge."""
    from llmap_spark.operators.links import link_host_edges

    html = ('<a href="\n  http://other.example/x">a</a>'
            '<a href="  #frag">b</a>'
            '<a href=" javascript:void(0)">c</a>'
            '<a href="/rel">d</a>').encode()
    df = spark.createDataFrame([("http://src.example/p", html)],
                               "url string, html binary")
    got = {(r.src_host, r.dst_host): r.n_links
           for r in link_host_edges(df).collect()}
    assert got == {("src.example", "other.example"): 1,
                   ("src.example", "src.example"): 1}  # only the /rel link


def test_weighted_sample_null_weight_is_explicit_zero(spark):
    from llmap_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame(
        [(1, 10000), (2, None), (3, 10000)], "doc_id long, w_bp int")
    kept = {r.doc_id for r in weighted_sample(df, "w_bp").collect()}
    assert kept == {1, 3}  # null weight -> rate 0, by rule not by NULL-logic


def test_greedy_pack_zero_sizes_and_nan_totality():
    from llmap_spark.operators.binpack import greedy_pack

    # oversize after zero-size items still gets its own bin
    assert greedy_pack([0, 20], 10) == [0, 1]
    assert greedy_pack([0, 0, 5, 20, 3], 10) == [0, 0, 0, 1, 2]
    # None/NaN count as zero instead of poisoning the accumulator
    assert greedy_pack([5, None, 6, float("nan"), 6], 10) == [0, 0, 1, 1, 2]


def test_token_count_script_aware(spark):
    """CJK codepoints count one token each; space-delimited parts keep
    the whitespace rule; mixed documents count each part by its script."""
    from pyspark.sql import functions as F

    from llmap_spark.operators.textstats import token_count_script_aware

    cases = [
        (0, "hello world", 2),
        (1, "这是一个测试", 6),              # 6 han chars, no spaces
        (2, "hello 这是 world", 4),          # 2 ws tokens + 2 han... plus
        (3, "これはテスト", 6),              # kana
        (4, "한국어문장", 5),                # hangul
        (5, "", 0),
        (6, "   ", 0),
        (7, "mixed 中文 and ひらがな end", 3 + 2 + 4),  # 3 words + 6 cjk
    ]
    df = spark.createDataFrame([(i, t) for i, t, _ in cases],
                               "id long, text string")
    got = {r.id: r.n for r in df.select(
        "id", token_count_script_aware(F.col("text")).alias("n")).collect()}
    # case 2: 'hello', 'world' + 2 han chars = 4
    for i, _, want in cases:
        assert got[i] == want, (i, got[i], want)


def test_minhash_candidates_against_prior_snapshot(spark, docs):
    """Incremental near-dup: new batch docs match the PRIOR snapshot's
    signature table; the history is never self-joined and within-batch
    pairs are out of scope."""
    from llmap_spark.operators.dedup import (minhash_candidates_against,
                                             minhash_signatures)

    seen = minhash_signatures(docs)
    # batch: near-dups of the first 20 history docs + 5 fresh ones
    near = (docs.limit(20)
            .withColumn("doc_id", F.col("doc_id") + 100000)
            .withColumn("text", F.concat(F.col("text"),
                                         F.lit(" tiny suffix"))))
    fresh = spark.createDataFrame(
        [(200000 + i, f"completely new page number {i} with its own "
          f"unique words alpha{i} beta{i} gamma{i}") for i in range(5)],
        "doc_id long, text string")
    batch = near.select("doc_id", "text").unionByName(fresh)
    cand = minhash_candidates_against(batch, seen)
    strong = cand.filter("est_jaccard >= 0.5")
    pairs = {(r.batch_id, r.seen_id) for r in strong.collect()}
    found = sum((d + 100000, d) in pairs for d in range(20))
    assert found >= 18  # >=90% recall on planted cross-batch near-dups
    # fresh docs match nothing strongly
    assert not [p for p in pairs if p[0] >= 200000]
    # within-batch pairs never appear (both ids would be batch ids)
    assert all(p[1] < 100000 for p in pairs)


def test_minhash_candidates_against_null_and_hot_bucket(spark):
    from llmap_spark.operators.dedup import (minhash_candidates_against,
                                             minhash_signatures)

    viral = ("subscribe newsletter terms of service privacy policy "
             "all rights reserved contact about careers " * 3)
    seen_docs = spark.createDataFrame(
        [(i, viral) for i in range(300)] + [(999, "a distinct real page "
                                            "with its own words here")],
        "doc_id long, text string")
    seen = minhash_signatures(seen_docs)
    batch = spark.createDataFrame(
        [(100000, viral),              # matches a hot (capped) family
         (100001, None),               # null text: no signature
         (100002, "xy")],              # shingle-less: no signature
        "doc_id long, text string")
    cand = minhash_candidates_against(batch, seen, max_bucket=200)
    rows = cand.collect()
    # the 300-strong viral bucket exceeds the cap in EVERY band -> no
    # quadratic fan-out; null/tiny docs match nothing
    assert not [r for r in rows if r.batch_id in (100001, 100002)]
    assert len(rows) <= 300
