"""Similarity search over an embedding column (array<float>).

Two operators with one contract — (query_id, neighbor_id, rank) top-k by
cosine — at different scale points:

  brute_force_topk  exact. Queries are broadcast as a numpy matrix; each
                    corpus partition computes a PARTIAL top-k against all
                    queries with one BLAS matmul per Arrow batch, then a
                    single groupBy(query) merge keeps the global top-k.
                    Shuffle volume is O(n_partitions * q * k), never
                    O(corpus x queries) — the only scalable shape for a
                    brute-force pass on a big cluster.

  ivf_topk          approximate. K-means centroids fit on a bounded,
                    seeded sample (driver-side numpy — the sample is tiny
                    by construction); corpus rows are assigned to their
                    nearest centroid (one pandas UDF pass); queries probe
                    their nprobe nearest centroids only. Join is
                    co-partitioned on centroid id, so each query scores
                    ~nprobe/n_centroids of the corpus.

Scores are float64 end-to-end with a fixed summation order per pair
(single dot product), and ties break by neighbor id EVERYWHERE — including
inside the brute-force per-partition partial top-k (a total lexsort order,
not argpartition: ties straddling the partial cutoff would otherwise make
the result depend on partitioning) — so results are deterministic across
runs AND partitionings. pytest checks ivf recall against brute force.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window, functions as F
from pyspark.sql.functions import pandas_udf

from llmap_spark.session import ensure_parallelism

TOPK_SCHEMA = "query_id long, neighbor_id long, score double"

# widen-the-corpus-scan threshold for brute_force_topk, in PADDED
# estimate units: (stats bytes / 4 floats) x queries x 2 (compression
# allowance — see the in-function comment). The A/B at 333 true MFlops
# (~666M padded; sf0.1 bench) measured unwidened best 0.63 s vs widened
# 0.98 s; the true crossover sits near ~0.5 GFlops of single-core BLAS
# + select, i.e. ~1e9 in padded units
_WIDEN_FLOPS = 1e9


def _as_matrix(rows: list, dim: int | None = None) -> np.ndarray:
    """Rows -> dense float64 matrix, TOTAL: a NULL or wrong-length
    embedding becomes a zero row instead of a ragged-array ValueError that
    would kill the whole Spark job (never-raise rule). Zero rows have zero
    cosine against everything, so they never rank as neighbors.

    When dim is None it is inferred as the MODAL row length, not the first
    row's — a single ragged/corrupt leading row would otherwise silently
    zero every well-formed row in the batch (same hazard the
    embedding_lsh_neardup modal-dimension probe guards against)."""
    arrs: list[np.ndarray | None] = []
    for r in rows:
        if r is None:
            arrs.append(None)
            continue
        a = np.asarray(r, dtype=np.float64)
        if a.ndim != 1:
            a = a.reshape(-1)
        arrs.append(a)
    if dim is None:
        sizes = np.asarray([a.size for a in arrs
                            if a is not None and a.size > 0], dtype=np.int64)
        if sizes.size:
            vals, counts = np.unique(sizes, return_counts=True)
            # ties break to the smaller dim deterministically (np.unique
            # sorts vals ascending; argmax takes the first max)
            dim = int(vals[np.argmax(counts)])
        else:
            dim = 0
    out = np.zeros((len(arrs), dim), dtype=np.float64)
    for i, a in enumerate(arrs):
        if a is not None and a.size == dim:
            out[i] = a
    return out


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _block_partials(corpus_sel: DataFrame, block: list, kk: int,
                    id_col: str, vec_col: str):
    """Partial top-kk of one broadcast query block against the corpus:
    each corpus partition accumulates a running best-kk per query across
    all its Arrow batches (one BLAS matmul per batch) and emits once, so
    shuffle volume is O(n_partitions * q_block * kk). Returns
    (partials DataFrame, the block's Broadcast) — the caller owns the
    broadcast lifetime (destroy after materializing in multi-block mode)."""
    spark = corpus_sel.sparkSession
    q_ids = np.asarray([r[0] for r in block], dtype=np.int64)
    q_mat = _normalize(_as_matrix([r[1] for r in block]))
    bc = spark.sparkContext.broadcast((q_ids, q_mat))

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, qm = bc.value
        nq = qm.shape[0]
        best_s = None  # (<=kk, nq) running best scores per query
        best_n = None  # (<=kk, nq) their neighbor ids
        for pdf in batches:
            if len(pdf) == 0:
                continue
            c_ids = pdf[id_col].to_numpy(dtype=np.int64)
            # dim PINNED to the query matrix: per-batch modal inference
            # could pick a different dim on a majority-corrupt batch and
            # the matmul would raise (the ragged-row crash _as_matrix's
            # totality contract exists to prevent)
            c_mat = _normalize(_as_matrix(list(pdf[vec_col]),
                                          dim=qm.shape[1]))
            sims_b = c_mat @ qm.T  # (batch, nq)
            nb_b = np.repeat(c_ids[:, None], nq, axis=1)
            if best_s is None:
                sims, nb = sims_b, nb_b
            else:
                sims = np.vstack([sims_b, best_s])
                nb = np.vstack([nb_b, best_n])
            take = min(kk, sims.shape[0])
            cols = np.arange(nq)[None, :]
            if take == sims.shape[0]:
                # nothing to cut — the whole stack survives
                best_s, best_n = sims, nb
                continue
            # Fast path: argpartition picks the top-take SET per query
            # (~3x cheaper than a full sort of the stack). The set is
            # order-free here — the global window pass does the exact
            # ranking — so it is correct EXCEPT when score ties straddle
            # the cutoff: there the survivor choice must break by
            # neighbor asc (the total order), which argpartition decides
            # arbitrarily, making the result depend on partitioning
            # (caught by the planted one-hot oracle, where zero-score
            # ties are everywhere). Detect straddling ties per query —
            # strictly more than `take` scores at-or-above the take-th
            # value — and fall back to the exact lexsort total order
            # (score desc, neighbor asc) for the batch. Real float
            # embeddings essentially never tie across distinct vectors,
            # so the bench path stays on argpartition; planted/duplicate
            # corpora take the exact path and stay hash-identical.
            part = np.argpartition(-sims, take - 1, axis=0)[:take]
            cand_s = sims[part, cols]
            thresh = cand_s.min(axis=0)  # the take-th best per query
            if ((sims >= thresh[None, :]).sum(axis=0) > take).any():
                idx = np.lexsort((nb, -sims), axis=0)[:take]  # (take, nq)
                best_s = sims[idx, cols]
                best_n = nb[idx, cols]
            else:
                best_s = cand_s
                best_n = nb[part, cols]
        if best_s is None:
            return
        out_q = np.repeat(ids, best_s.shape[0])
        yield pd.DataFrame({"query_id": out_q,
                            "neighbor_id": best_n.T.reshape(-1),
                            "score": best_s.T.reshape(-1)})

    return corpus_sel.mapInPandas(partial, TOPK_SCHEMA), bc


def brute_force_topk(spark: SparkSession, corpus: DataFrame, queries: DataFrame,
                     k: int = 10, id_col: str = "vec_id",
                     vec_col: str = "embedding",
                     exclude_self: bool = True,
                     max_query_rows: int = 65_536) -> DataFrame:
    """Exact cosine top-k: broadcast queries in bounded blocks, partial
    top-k per corpus partition, global merge. Returns
    (query_id, neighbor_id, score, rank).

    The query side streams through the driver in blocks of
    `max_query_rows` (toLocalIterator — never more than one block of rows
    in driver memory at a time). With a single block the result is a lazy
    plan (its broadcast lives as long as the plan). With multiple blocks
    each block's partial top-k is MATERIALIZED (eager localCheckpoint) and
    its broadcast destroyed before the next block starts, so driver/
    executor broadcast storage stays O(max_query_rows * dim) regardless of
    query count — a query side 100x the block size runs as 100 sequential
    corpus passes instead of raising (round-2 contract) or accumulating
    100 live broadcasts. Blocks partition the query ids disjointly, so
    per-block results concatenate with no cross-block merge; one window
    pass at the end ranks the per-partition partials. `max_blocks` bounds
    the union plan width (Catalyst cannot analyze a 15k-way union).

    The intrinsic work is still O(|corpus| x |queries|) — that is what
    brute force MEANS — so for corpus-scale self-similarity prefer
    ivf_topk, whose query side stays distributed and which scores only
    nprobe/n_centroids of each query's corpus."""
    import itertools

    max_blocks = 1024  # ~67M queries at the default block size
    corpus_sel = corpus.select(id_col, vec_col)
    kk = k + (1 if exclude_self else 0)
    # One pass over the query side, one block in driver memory at a time.
    # Probe with a single bounded collect first: toLocalIterator fetches
    # partitions as SEQUENTIAL jobs (~100 ms scheduler latency each), which
    # dominates small query sides — a 2k-vector query side was paying ~3 s
    # of round-trips for what one job returns. Only a query side that
    # overflows one block pays the streaming path (whose first block is
    # re-read from the iterator; the probe rows are discarded).
    q_sel = queries.select(id_col, vec_col)
    probe = q_sel.limit(max_query_rows + 1).collect()
    # Widen a single-split corpus scan (the standing Python-UDF guard)
    # ONLY when the scoring work is worth an exchange: the probe fixes
    # nq, and the optimizer's sizeInBytes (planning-only, no job)
    # ESTIMATES the corpus volume — for parquet it is the compressed
    # on-disk size, so it can under-count rows of a compressible
    # corpus. Work per stored float is nq mults, so est_flops ~
    # (bytes/4) * nq, padded by a 2x compression allowance (float
    # embeddings barely compress; the pad tightens the skip against
    # degenerate constant-vector corpora). Below _WIDEN_FLOPS the
    # round-robin exchange + 32 python workers cost more than they save
    # (A/B in the constant's comment). Any stats failure or a
    # multi-block query side falls back to widening (the safe default:
    # at scale the corpus is multi-split and ensure_parallelism is a
    # no-op anyway), and the worst possible mistake is bounded — the
    # skip can only happen for a sub-single-split file whose padded
    # estimate is under ~0.5 GFlops.
    widen = True
    if len(probe) <= max_query_rows:
        try:
            est_bytes = int(corpus_sel._jdf.queryExecution()
                            .optimizedPlan().stats().sizeInBytes())
            widen = (est_bytes // 2) * len(probe) > _WIDEN_FLOPS
        except Exception:
            widen = True
    if widen:
        corpus_sel = ensure_parallelism(corpus_sel)
    corpus_persisted = False
    if len(probe) <= max_query_rows:
        it = iter(probe)
    else:
        it = q_sel.toLocalIterator(prefetchPartitions=True)
        # multi-block path: every block's eager checkpoint is its own
        # QueryExecution (fresh shuffle IDs — no cross-job exchange
        # reuse), so an unpersisted corpus subtree would re-scan and
        # re-shuffle once PER BLOCK; persist pays it once
        corpus_sel = corpus_sel.persist()
        corpus_persisted = True
    partials = None
    pending = None  # first block kept lazy until a second block appears
    n_blocks = 0
    # error-path cleanup: broadcasts created but not yet destroyed. On the
    # happy path the single-block broadcast MUST outlive this function
    # (the returned plan reads it), so cleanup runs only on exception —
    # without it, the max_blocks ValueError (or a failed checkpoint) left
    # the persisted corpus and the in-flight block broadcast pinned for
    # the session lifetime.
    live_bcs: list = []
    try:
        while True:
            block = list(itertools.islice(it, max_query_rows))
            if not block:
                break
            n_blocks += 1
            if n_blocks > max_blocks:
                raise ValueError(
                    f"brute_force_topk query side exceeds {max_blocks} blocks "
                    f"of {max_query_rows} rows; brute force at this scale is "
                    "O(|corpus| x |queries|) — use ivf_topk (distributed query "
                    "side) or raise max_query_rows/max_blocks deliberately")
            p, bc = _block_partials(corpus_sel, block, kk, id_col, vec_col)
            live_bcs.append(bc)
            if n_blocks == 1:
                pending = (p, bc)
                continue
            if pending is not None:
                p1, bc1 = pending
                pending = None
                partials = p1.localCheckpoint(eager=True)
                bc1.destroy()
                live_bcs.remove(bc1)
            p = p.localCheckpoint(eager=True)
            bc.destroy()
            live_bcs.remove(bc)
            partials = partials.unionByName(p)
    except BaseException:
        for b in live_bcs:
            try:
                b.destroy()
            except Exception:
                pass
        if corpus_persisted:
            corpus_sel.unpersist()
        raise
    if corpus_persisted:
        # all multi-block partials are checkpointed by here; nothing lazy
        # still references the corpus frame
        corpus_sel.unpersist()
    if n_blocks == 0:
        return spark.createDataFrame([], TOPK_SCHEMA + ", rank int")
    if pending is not None:
        partials = pending[0]  # single block: stay lazy, broadcast lives
    if exclude_self:
        partials = partials.filter(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc())
    return (
        partials.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _kmeans_fit(sample: np.ndarray, n_centroids: int, iters: int = 10,
                seed: int = 42) -> np.ndarray:
    rs = np.random.RandomState(seed)
    pick = rs.choice(len(sample), size=min(n_centroids, len(sample)), replace=False)
    cents = sample[pick].copy()
    for _ in range(iters):
        assign = np.argmax(sample @ cents.T, axis=1)
        for c in range(len(cents)):
            mask = assign == c
            if mask.any():
                v = sample[mask].mean(axis=0)
                nv = np.linalg.norm(v)
                if nv > 0:
                    cents[c] = v / nv
    return cents


def ivf_topk(spark: SparkSession, corpus: DataFrame, queries: DataFrame,
             k: int = 10, n_centroids: int = 16, nprobe: int = 4,
             id_col: str = "vec_id", vec_col: str = "embedding",
             sample_rows: int = 10_000, exclude_self: bool = True,
             seed: int = 42) -> DataFrame:
    """IVF-bucketed approximate top-k.

    Centroids fit on a seeded sample (bounded collect — this is the one
    deliberate driver-side step, standard for IVF training). Corpus gets a
    `centroid` column; queries explode to nprobe probes; the probe join is
    an equi-join on centroid id so the shuffle co-locates each bucket.

    The sample is drawn by ordering on a seeded hash of the id and taking
    the first `sample_rows` — a deterministic random permutation that Spark
    executes as TakeOrdered (per-partition top-k + merge, no full sort).
    A bare limit() would read only the first partitions, a badly biased
    sample when the corpus is sorted or partitioned by cluster.
    """
    sample = (corpus.select(id_col, vec_col)
              .orderBy(F.xxhash64(F.col(id_col), F.lit(seed)))
              .limit(sample_rows)
              .select(vec_col).collect())
    if not sample:
        return spark.createDataFrame([], TOPK_SCHEMA + ", rank int")
    s_mat = _normalize(_as_matrix([r[0] for r in sample]))
    cents = _kmeans_fit(s_mat, n_centroids, seed=seed)
    bc = spark.sparkContext.broadcast(cents)

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        c = bc.value
        for pdf in batches:
            # dim pinned to the centroids (see brute-force partial)
            m = _normalize(_as_matrix(list(pdf[vec_col]), dim=c.shape[1]))
            pdf = pdf.copy()
            pdf["centroid"] = np.argmax(m @ c.T, axis=1).astype(np.int32)
            yield pdf

    corpus_a = ensure_parallelism(corpus.select(id_col, vec_col)).mapInPandas(
        assign, f"{id_col} long, {vec_col} array<float>, centroid int")

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        c = bc.value
        np_probe = min(nprobe, len(c))
        for pdf in batches:
            m = _normalize(_as_matrix(list(pdf[vec_col]), dim=c.shape[1]))
            sims = m @ c.T
            order = np.argsort(-sims, axis=1)[:, :np_probe]
            rows = {"query_id": np.repeat(pdf[id_col].to_numpy(dtype=np.int64), np_probe),
                    "centroid": order.reshape(-1).astype(np.int32),
                    vec_col: [v for v in pdf[vec_col] for _ in range(np_probe)]}
            yield pd.DataFrame(rows)

    queries_p = ensure_parallelism(queries.select(id_col, vec_col)).mapInPandas(
        probe, f"query_id long, centroid int, {vec_col} array<float>")

    joined = queries_p.alias("q").join(
        corpus_a.alias("c"), "centroid").select(
        F.col("query_id"), F.col(f"c.{id_col}").alias("neighbor_id"),
        F.col(f"q.{vec_col}").alias("qv"), F.col(f"c.{vec_col}").alias("cv"))

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        c = bc.value
        for pdf in batches:
            qm = _normalize(_as_matrix(list(pdf["qv"]), dim=c.shape[1]))
            cm = _normalize(_as_matrix(list(pdf["cv"]), dim=c.shape[1]))
            s = np.einsum("ij,ij->i", qm, cm)
            yield pd.DataFrame({"query_id": pdf["query_id"],
                                "neighbor_id": pdf["neighbor_id"], "score": s})

    scored = joined.mapInPandas(score, TOPK_SCHEMA)
    if exclude_self:
        scored = scored.filter(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def hyperplane_sketch_udf(dim: int, n_bits: int = 64, seed: int = 42):
    """pandas_udf: embedding -> 64-bit random-hyperplane sketch (sign of
    seeded Gaussian projections — SimHash for cosine space: P[bit differs]
    = angle/pi, so cosine-close vectors are Hamming-close sketches)."""
    rs = np.random.RandomState(seed)
    planes = rs.normal(size=(dim, n_bits))
    weights = (np.uint64(1) << np.arange(n_bits, dtype=np.uint64))

    @pandas_udf("long")
    def sk(vecs: pd.Series) -> pd.Series:
        # NULL/ragged guard (never-raise rule): missing or wrong-length
        # embeddings sketch to 0 — the caller filters sh == 0 out of
        # blocking, since null/zero vectors are not near-dups of anything
        rows = [np.asarray(v, dtype=np.float64)
                if v is not None and len(v) == dim else np.zeros(dim)
                for v in vecs]
        m = np.asarray(rows)
        bits = (m @ planes) > 0  # (rows, n_bits)
        vals = (bits.astype(np.uint64) * weights[None, :]).sum(axis=1,
                                                               dtype=np.uint64)
        return pd.Series(vals.astype(np.int64))

    # deterministic; flag only blocks optimizer cloning (see dedup.py)
    return sk.asNondeterministic()


def embedding_lsh_neardup(emb: DataFrame,
                          max_hamming: int = 6, threshold: float = 0.95,
                          id_col: str = "vec_id", vec_col: str = "embedding",
                          seed: int = 42,
                          max_bucket: int | None = 10_000,
                          materialize: bool = False) -> DataFrame:
    """LSH-bucketed embedding near-dup pairs — the hash-bucketed sibling of
    the IVF path: random-hyperplane sketches blocked by the generic
    Hamming banding (dedup.hamming_band_pairs, lossless at the radius),
    then candidates verified with the EXACT cosine (JVM zip_with dot on
    re-joined vectors — no Python in the verify). Returns
    (id_a, id_b, cos_x1000000 long) with cosine >= threshold.

    Sketch radius -> angle: Hamming h on 64 bits ~ angle h*pi/64, so
    max_hamming=6 covers pairs down to cos(6*pi/64) ~ 0.956 in expectation;
    radius and threshold should be chosen together. `max_bucket` caps band
    buckets (default 10k): at radius 6 band keys are only ~9 bits, so on a
    billion-vector corpus an uncapped bucket join would go quadratic —
    the cap costs recall only for vectors whose every band is hot.
    """
    from llmap_spark.operators.dedup import hamming_band_pairs

    # probe the MODAL dimension (deterministic cheap aggregate over the
    # size column only) — a bare first() depends on nondeterministic row
    # order: a null or ragged leading row would silently empty or corrupt
    # the whole result
    probe = (emb.select(F.size(vec_col).alias("_d"))
             .filter(F.col("_d") > 0)
             .groupBy("_d").count()
             .orderBy(F.desc("count"), F.asc("_d")).first())
    if probe is None:
        return emb.sparkSession.createDataFrame(
            [], "id_a long, id_b long, cos_x1000000 long")
    dim = probe[0]
    s = ensure_parallelism(
        emb.select(F.col(id_col).alias("_id"), F.col(vec_col))).select(
        "_id", hyperplane_sketch_udf(dim, seed=seed)(F.col(vec_col)).alias("sh"))
    # sh=0 marks null/zero vectors (see hyperplane_sketch_udf) — exclude
    # from blocking, mirroring simhash_candidates' word-less-doc rule
    s = s.filter(F.col("sh") != 0)
    cand = hamming_band_pairs(s, max_hamming, max_bucket=max_bucket,
                              materialize=materialize).select("id_a", "id_b")
    # norm as its OWN column: embedding the aggregate inside a per-element
    # transform lambda re-evaluates it for every element (O(d^2) per row —
    # higher-order functions are interpreted); here each norm and the dot
    # are each one O(d) pass, and cos = dot / (norm_a * norm_b)
    norm = F.sqrt(F.aggregate(
        F.transform(vec_col, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v))
    withn = emb.select(F.col(id_col), F.col(vec_col).alias("_v"),
                       norm.alias("_n"))
    va = withn.select(F.col(id_col).alias("id_a"), F.col("_v").alias("_va"),
                      F.col("_n").alias("_na"))
    vb = withn.select(F.col(id_col).alias("id_b"), F.col("_v").alias("_vb"),
                      F.col("_n").alias("_nb"))
    dot = F.aggregate(
        F.zip_with("_va", "_vb",
                   lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v)
    cos = F.when(F.col("_na") * F.col("_nb") > 0,
                 dot / (F.col("_na") * F.col("_nb")))
    return (
        cand.join(va, "id_a").join(vb, "id_b")
        .select("id_a", "id_b",
                F.floor(cos * F.lit(1_000_000)).cast("long").alias("cos_x1000000"))
        # round(), not int(): float truncation (0.29*1e6 = 289999.999...)
        # would admit pairs up to 1e-6 BELOW the requested threshold
        .filter(F.col("cos_x1000000") >= int(round(threshold * 1_000_000)))
    )


def embedding_neardup_pairs(spark: SparkSession, emb: DataFrame,
                            threshold: float = 0.95, k: int = 10,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding",
                            exact: bool = False,
                            n_centroids: int = 64,
                            nprobe: int = 8) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: self top-k then threshold.
    Returns (id_a, id_b, score) with id_a < id_b.

    Default path is IVF on both sides: the corpus IS the query set here, so
    a broadcast-queries brute force would collect the whole corpus to the
    driver — the one shape that cannot survive 10^9 vectors. IVF keeps both
    sides distributed (co-partitioned probe join on centroid id). Near-dup
    pairs sit at cosine >= threshold ~ 0.95, i.e. deep inside the same
    centroid cell, so tiny nprobe already sees essentially all true pairs.
    Pass exact=True only for corpora small enough to broadcast."""
    if exact:
        topk = brute_force_topk(spark, emb, emb, k=k, id_col=id_col,
                                vec_col=vec_col, exclude_self=True)
    else:
        topk = ivf_topk(spark, emb, emb, k=k, id_col=id_col, vec_col=vec_col,
                        n_centroids=n_centroids, nprobe=nprobe,
                        exclude_self=True)
    return (
        topk.filter(F.col("score") >= threshold)
        .select(F.least("query_id", "neighbor_id").alias("id_a"),
                F.greatest("query_id", "neighbor_id").alias("id_b"),
                "score")
        .distinct()
    )
