"""Deduplication operators for web-scale text corpora.

Five families, each with a distinct scale profile:

  exact_dedup          md5 fingerprint -> groupBy-min winners -> join-back
  minhash_lsh          char-shingle MinHash signatures (pandas UDF) ->
                       banded LSH bucket join -> candidate pairs with
                       signature-estimated Jaccard (JVM zip_with)
  simhash              64-bit SimHash (pandas UDF) -> 16-bit band blocking
                       -> Hamming<=k verify via bit_count(xor) (JVM)
  ngram_jaccard_pairs  exact word-trigram Jaccard via explode + equi-join,
                       integer cross-multiplied threshold (SQL-oracle-able)
  connected_components iterative min-label propagation over candidate
                       pairs -> duplicate clusters (no GraphFrames dep)

Scale notes baked in: LSH buckets are capped (hot-bucket skew guard),
signatures travel as array<long> (Arrow-native), verification math stays
JVM-side (zip_with / bit_count), and components iterate with AQE-friendly
joins rather than driver-side union-find.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from llmap_spark.session import ensure_parallelism
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf

from llmap_spark.operators.textstats import fingerprint

MERSENNE61 = (1 << 61) - 1


# --------------------------------------------------------------------------
# exact
# --------------------------------------------------------------------------

def exact_dedup(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Hash-groupBy exact dedup: adds `fingerprint`, `rep_id` (min id with
    the same fingerprint) and `is_dup`.

    Winner selection is groupBy(fingerprint).min — NOT a window over the
    fingerprint: a window buffers each duplicate group in one task (a
    boilerplate page duplicated 10^8 times becomes one spilling straggler),
    while the groupBy's partial aggregation collapses hot groups map-side
    to one row per (partition, fingerprint), the same skew-safe shape
    scrub.dedup_paragraphs uses.

    One text pass for the winners side: the slim (id, fingerprint)
    projection is persisted (registered with llmap_spark.cache, same
    contract as the LSH signature frame) so the winners aggregate never
    re-reads the text column — the earlier two-branch plan re-scanned
    and re-hashed full text for the winners side (a second full-corpus
    pass at 100 TB; 4.2x slower at sf0.1 in the r3 driver bench). Wide
    input rows then join the winners frame DIRECTLY on the fingerprint
    (recomputing md5 inline in the main scan — codegen'd JVM arithmetic,
    no extra IO): one thin aggregate output against one full-width pass,
    with no intermediate per-id verdict join (the r4 plan's extra stage,
    ~10% of the bench time). A hot fingerprint skews this join's build
    of full-width rows, which AQE's skew-join split handles (the winners
    side is a single row per fingerprint, replicated to the splits);
    the aggregate itself collapses hot groups map-side as before.

    NULL text -> NULL fingerprint = UNKNOWN content, never a duplicate:
    null keys drop out of the groupBy winners and never match the
    join-back, so every null-text row is its own representative without
    ever shuffling into a shared null bucket.

    CONTRACT: `id_col` must be a unique, non-null key (what a document id
    IS; min-per-fingerprint winners are meaningless otherwise). The
    winners join is LEFT, and NULL fingerprints never match a join key,
    so a pathological null-id or null-text row still survives as its own
    representative rather than silently dropping; duplicate ids would
    cross-attach verdicts and are the caller's bug."""
    from llmap_spark.cache import register_persisted

    # match the old withColumn semantics: a pre-existing fingerprint
    # column is replaced, not duplicated into a join ambiguity
    df = df.drop("fingerprint", "rep_id", "is_dup")
    slim = (fingerprint(df.select(id_col, text_col), text_col)
            .select(id_col, "fingerprint").persist())
    register_persisted(slim)
    winners = (slim.filter(F.col("fingerprint").isNotNull())
               .groupBy("fingerprint")
               .agg(F.min(id_col).alias("_rep")))
    return (
        fingerprint(df, text_col).join(winners, ["fingerprint"], "left")
        .withColumn("rep_id", F.coalesce(F.col("_rep"), F.col(id_col)))
        # coalesce: for a null-id row both sides are NULL and != yields
        # NULL, which filter(~is_dup) downstream (training.kept_documents)
        # would silently DROP — the survival contract says False
        .withColumn("is_dup", F.coalesce(
            F.col(id_col) != F.col("rep_id"), F.lit(False)))
        # the USING join hoists the key to column 0; restore input order
        .select(*df.columns, "fingerprint", "rep_id", "is_dup")
    )


def exact_dedup_against(df: DataFrame, seen: DataFrame,
                        text_col: str = "text",
                        seen_fp_col: str = "fingerprint") -> DataFrame:
    """Incremental exact dedup for continuously-arriving crawl batches:
    drop rows whose whitespace-normalized md5 fingerprint already exists
    in a PRIOR snapshot's fingerprint table, keeping everything else with
    its fingerprint attached (feed the survivors' fingerprints back into
    the seen table for the next batch).

    One left-anti equi-join on the fingerprint: AQE broadcasts the seen
    side when it is small; at full scale both sides shuffle on the
    fingerprint key (uniform by construction — md5). NULL-text rows carry
    NULL fingerprints and always SURVIVE (anti-join null keys never
    match): unknown content is not evidence of duplication, the same rule
    exact_dedup applies within a batch. Within-batch duplicates are not
    this operator's job — run exact_dedup on the batch first (or after).
    """
    fp = fingerprint(df, text_col)
    seen_d = seen.select(
        F.col(seen_fp_col).alias("fingerprint")).distinct()
    return fp.join(seen_d, "fingerprint", "left_anti")


# --------------------------------------------------------------------------
# minhash + LSH
# --------------------------------------------------------------------------

def _hash_params(num_hashes: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rs = np.random.RandomState(seed)
    a = rs.randint(1, MERSENNE61, size=num_hashes, dtype=np.int64).astype(np.uint64)
    b = rs.randint(0, MERSENNE61, size=num_hashes, dtype=np.int64).astype(np.uint64)
    return a, b


_FNV = np.uint64(1099511628211)
_MIX1 = np.uint64(0xFF51AFD7ED558CCD)
_MIX2 = np.uint64(0xC4CEB9FE1A85EC53)


def _mix64(h: np.ndarray) -> np.ndarray:
    """Murmur3-style finalizer — vectorized, stable across workers."""
    h = h.copy()
    h ^= h >> np.uint64(33)
    h *= _MIX1
    h ^= h >> np.uint64(33)
    h *= _MIX2
    h ^= h >> np.uint64(33)
    return h


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Stable byte-k-shingle 64-bit hashes, fully numpy-vectorized:
    sliding windows x FNV-prime powers, then a murmur finalizer. (The
    first draft hashed each shingle with blake2b in a Python loop —
    ~300 digest calls per doc dominated the whole LSH stage.) Never
    Python hash(): not stable across workers."""
    t = " ".join(text.split()).lower()
    b = np.frombuffer(t.encode("utf-8"), dtype=np.uint8)
    if b.size < k:
        return np.empty(0, dtype=np.uint64)
    win = np.lib.stride_tricks.sliding_window_view(b, k).astype(np.uint64)
    pw = _FNV ** np.arange(k, dtype=np.uint64)  # wraparound mod 2^64 is fine
    h = _mix64((win * pw[None, :]).sum(axis=1, dtype=np.uint64))
    return np.unique(h)


def minhash_signature_udf(num_hashes: int = 64, shingle_k: int = 5, seed: int = 42):
    """pandas_udf: text -> array<long> MinHash signature. The per-doc min
    over (a*h+b) mod 2^61-1 is a vectorized numpy outer product."""
    a, b = _hash_params(num_hashes, seed)

    @pandas_udf("array<long>")
    def sig(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            h = _shingle_hashes(t or "", shingle_k)
            if h.size == 0:
                # shingle-less doc: NULL signature. A shared sentinel
                # signature would make every tiny/empty doc a "perfect
                # duplicate" of every other one.
                out.append(None)
                continue
            # (num_hashes, n_shingles) — wraparound mult is fine pre-mod
            m = (a[:, None] * h[None, :] + b[:, None]) % MERSENNE61
            out.append(m.min(axis=1).astype(np.int64).tolist())
        return pd.Series(out)

    # deterministic in fact; the flag stops the optimizer cloning the UDF
    # into the downstream isNotNull filter (CollapseProject otherwise
    # yields TWO ArrowEvalPython nodes — the signature pass ran twice per
    # row even under persist; verified in the physical plan)
    return sig.asNondeterministic()


def minhash_lsh_candidates(df: DataFrame, id_col: str = "doc_id",
                           text_col: str = "text", num_hashes: int = 64,
                           bands: int = 16, shingle_k: int = 5,
                           max_bucket: int = 200,
                           materialize: bool = False) -> DataFrame:
    """Candidate near-dup pairs via banded MinHash LSH.

    Returns (id_a, id_b, est_jaccard double) with id_a < id_b. est_jaccard
    is the signature agreement fraction, computed JVM-side via zip_with —
    no second Python pass. Buckets larger than `max_bucket` are dropped
    (skew guard: a degenerate shingle bucket would otherwise create a
    quadratic join blowup; dropped buckets mean those docs are near-dups of
    *many* docs and are caught by other bands with overwhelming odds).

    Shuffle diet: only (id, band, band-hash) rows enter the bucket
    self-join and the candidate `distinct` — signatures (64 longs, ~0.5 KB)
    are re-attached AFTER the pair set is deduplicated, via broadcast of
    the (small by construction) pair list against the persisted signature
    frame. Carrying both signatures through the join + distinct would ship
    ~1 KB of avoidable shuffle per candidate occurrence.

    The operator is LAZY by default: it returns a plan and leaves the
    signature frame persisted (the UDF runs once per row however many
    consumers the caller wires up); the persist is REGISTERED with
    llmap_spark.cache so a long-lived session can release it via
    release_persisted(). Pass materialize=True to eagerly localCheckpoint
    the bounded candidate set and release the signature cache immediately —
    appropriate in notebooks/short jobs; on a long-lived cluster prefer
    writing the candidates to a table, since localCheckpoint blocks are
    lost on executor failure.
    """
    from llmap_spark.cache import register_persisted

    assert num_hashes % bands == 0
    sig = ensure_parallelism(
        df.select(F.col(id_col).alias("_id"), F.col(text_col))).select(
        "_id",
        minhash_signature_udf(num_hashes, shingle_k)(F.col(text_col)).alias("sig"))
    # shingle-less docs carry NULL signatures and cannot be near-dups
    sig = sig.filter(F.col("sig").isNotNull())
    # the signature subtree feeds three consumers (band explode + the two
    # signature re-joins); persist so the Python UDF runs once per row
    sig = sig.persist()
    if not materialize:
        register_persisted(sig)
    # band key: md5 of the band's signature slice, JVM-side (the shared
    # _band_keys construction — the incremental variant must produce
    # byte-identical keys)
    exploded = _band_keys(sig, "_id", num_hashes, bands)
    # hot-bucket guard via groupBy counts + ANTI-join against the
    # over-full buckets, NOT a window over (band, bh): the hot bucket is
    # exactly the case the cap exists for, and a window would buffer that
    # whole bucket in one task before dropping it; partial aggregation
    # collapses it map-side to one (partition, bucket) row. The anti-join
    # side is only the buckets EXCEEDING the cap — rare by construction —
    # so AQE broadcasts it at runtime and the exploded frame never
    # shuffles for the cap (the r3 inner-join formulation joined back the
    # corpus-sized <=cap bucket list instead: a full extra exchange,
    # measured +2.6 s at sf0.1 in the driver bench)
    hot = (exploded.groupBy("band", "bh")
           .agg(F.count(F.lit(1)).alias("_bn"))
           .filter(F.col("_bn") > max_bucket)
           .select("band", "bh"))
    pruned = exploded.join(hot, ["band", "bh"], "left_anti")
    if max_bucket <= 1024:
        # post-prune, every bucket is <= max_bucket members, so pair
        # generation can be ONE groupBy + bounded in-array expansion
        # (max_bucket^2/2 structs per bucket row — hence the 1024 guard:
        # ~500k structs is the most we let one aggregate row hold)
        # instead of a two-sided self-join. Saves a full exchange of the
        # exploded frame AND stops the counts/anti-join subtree being
        # evaluated once per join side (the winnow_overlap_pairs shape).
        byb = (pruned.groupBy("band", "bh")
               .agg(F.sort_array(F.collect_list("_id")).alias("ids"))
               .filter(F.size("ids") >= 2))
        pairs = (byb.select(F.explode(F.flatten(F.expr(
            "transform(ids, (x, i) -> transform("
            "  slice(ids, i + 2, size(ids) - i - 1),"
            "  y -> struct(x AS id_a, y AS id_b)))"
        ))).alias("p")).select("p.id_a", "p.id_b")
            # strict <, matching the self-join branch: a duplicated id in
            # the input must not emit a self-pair (sort_array makes equal
            # ids adjacent, so the in-array expansion WOULD pair them)
            .filter(F.col("id_a") < F.col("id_b"))
            .distinct())
    else:
        # big caps: the in-array expansion would be quadratic in the cap;
        # fall back to the equi-self-join (AQE can skew-split it)
        a = pruned.select(F.col("_id").alias("id_a"), "band", "bh")
        b = pruned.select(F.col("_id").alias("id_b"), "band", "bh")
        pairs = (
            a.join(b, ["band", "bh"]).filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b").distinct()
        )
    sa = sig.select(F.col("_id").alias("id_a"), F.col("sig").alias("sig_a"))
    sb = sig.select(F.col("_id").alias("id_b"), F.col("sig").alias("sig_b"))
    # no broadcast hint: AQE turns these into broadcast joins at runtime
    # when the pair set is small; a forced broadcast would OOM if a huge
    # corpus yields a pair set beyond driver memory
    withsigs = sa.join(pairs, "id_a").join(sb, "id_b")
    agree = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: F.when(x == y, 1).otherwise(0)),
        F.lit(0), lambda acc, v: acc + v)
    out = withsigs.select(
        "id_a", "id_b",
        (agree / F.lit(float(num_hashes))).alias("est_jaccard"))
    if materialize:
        out = out.localCheckpoint(eager=True)
        sig.unpersist()
    return out


def _band_keys(sig_frame: DataFrame, id_alias: str, num_hashes: int,
               bands: int) -> DataFrame:
    """(id, sig) -> (id, band, bh): the banded LSH keys, md5 of each
    signature slice JVM-side — the ONE band-key construction
    minhash_lsh_candidates and the incremental variant share (keys are
    only comparable when params match, so one code path)."""
    rows_per_band = num_hashes // bands
    band_exprs = []
    for bd in range(bands):
        s = F.slice("sig", bd * rows_per_band + 1, rows_per_band)
        band_exprs.append(F.struct(F.lit(bd).alias("band"),
                                   F.md5(F.to_json(s)).alias("bh")))
    return (sig_frame.select(F.col("_id").alias(id_alias), "sig",
                             F.explode(F.array(*band_exprs)).alias("bk"))
            .select(id_alias, F.col("bk.band").alias("band"),
                    F.col("bk.bh").alias("bh")))


def minhash_signatures(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", num_hashes: int = 64,
                       shingle_k: int = 5, seed: int = 42) -> DataFrame:
    """(id, sig array<long>): the MinHash signature table — the snapshot
    DELIVERABLE an incrementally-crawling pipeline persists between
    batches and feeds to minhash_candidates_against. Shingle-less docs
    carry no row (NULL signatures match nothing by design)."""
    sig = ensure_parallelism(
        df.select(F.col(id_col).alias("_id"), F.col(text_col))).select(
        "_id",
        minhash_signature_udf(num_hashes, shingle_k, seed)(
            F.col(text_col)).alias("sig"))
    return (sig.filter(F.col("sig").isNotNull())
            .select(F.col("_id").alias(id_col), "sig"))


def minhash_candidates_against(batch: DataFrame, seen_sigs: DataFrame,
                               id_col: str = "doc_id",
                               text_col: str = "text",
                               num_hashes: int = 64, bands: int = 16,
                               shingle_k: int = 5, max_bucket: int = 200,
                               seen_id_col: str = "doc_id",
                               seen_sig_col: str = "sig",
                               seed: int = 42) -> DataFrame:
    """Incremental near-dup candidates for a continuously-arriving crawl
    batch: (batch_id, seen_id, est_jaccard) pairs between NEW docs and a
    PRIOR snapshot's signature table (minhash_signatures) — the
    MinHash/LSH counterpart of exact_dedup_against. Signature params
    must match the table's (same num_hashes/shingle_k/seed, or the band
    keys are incomparable).

    Scale shape: the batch side is signed fresh (one Arrow pass,
    persisted); BOTH sides explode to thin (id, band, bh) keys and meet
    in an equi-join — the history is never self-joined, and per-batch
    work is O(|batch| x bands) plus the join against the seen band
    table (at rest this is a sorted/bucketed table scan; here a
    computed frame). The hot-bucket cap applies to the SEEN side (the
    unbounded one): band keys occurring more than `max_bucket` times in
    the history are anti-joined out, exactly the
    minhash_lsh_candidates skew guard. Signatures re-attach AFTER the
    pair distinct, thin-shuffle style. Within-batch duplicates are
    minhash_lsh_candidates' job; run both for full coverage."""
    from llmap_spark.cache import register_persisted

    assert num_hashes % bands == 0
    bsig = ensure_parallelism(
        batch.select(F.col(id_col).alias("_id"), F.col(text_col))).select(
        "_id",
        minhash_signature_udf(num_hashes, shingle_k, seed)(
            F.col(text_col)).alias("sig"))
    bsig = bsig.filter(F.col("sig").isNotNull()).persist()
    register_persisted(bsig)
    ssig = seen_sigs.select(F.col(seen_id_col).alias("_id"),
                            F.col(seen_sig_col).alias("sig"))
    bkeys = _band_keys(bsig, "batch_id", num_hashes, bands)
    skeys = _band_keys(ssig, "seen_id", num_hashes, bands)
    hot = (skeys.groupBy("band", "bh")
           .agg(F.count(F.lit(1)).alias("_bn"))
           .filter(F.col("_bn") > max_bucket)
           .select("band", "bh"))
    skeys = skeys.join(hot, ["band", "bh"], "left_anti")
    pairs = (bkeys.join(skeys, ["band", "bh"])
             .select("batch_id", "seen_id").distinct())
    sa = bsig.select(F.col("_id").alias("batch_id"),
                     F.col("sig").alias("sig_a"))
    sb = ssig.select(F.col("_id").alias("seen_id"),
                     F.col("sig").alias("sig_b"))
    withsigs = sa.join(pairs, "batch_id").join(sb, "seen_id")
    agree = F.aggregate(
        F.zip_with("sig_a", "sig_b",
                   lambda x, y: F.when(x == y, 1).otherwise(0)),
        F.lit(0), lambda acc, v: acc + v)
    return withsigs.select(
        "batch_id", "seen_id",
        (agree / F.lit(float(num_hashes))).alias("est_jaccard"))


# --------------------------------------------------------------------------
# simhash
# --------------------------------------------------------------------------

def simhash_udf(seed: int = 42):
    """pandas_udf: text -> 64-bit SimHash (as signed long)."""

    @pandas_udf("long")
    def sim(texts: pd.Series) -> pd.Series:
        # memoize word hashes per batch: web/word-soup text repeats a small
        # vocabulary, so this cuts digest calls by ~100x
        memo: dict[str, int] = {}

        def whash(w: str) -> int:
            h = memo.get(w)
            if h is None:
                h = int.from_bytes(
                    hashlib.blake2b(w.encode(), digest_size=8).digest(), "big")
                memo[w] = h
            return h

        out = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            words = (t or "").lower().split()
            if not words:
                out[i] = 0
                continue
            hs = np.fromiter((whash(w) for w in words),
                             dtype=np.uint64, count=len(words))
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1)
            score = (2 * bits.astype(np.int32) - 1).sum(axis=0)
            v = 0
            for bit in np.nonzero(score > 0)[0]:
                v |= 1 << int(bit)
            out[i] = np.int64(np.uint64(v).astype(np.int64))
        return pd.Series(out)

    # see minhash_signature_udf: blocks optimizer UDF cloning into the
    # sh != 0 filter
    return sim.asNondeterministic()


def simhash_candidates(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", max_hamming: int = 3,
                       max_bucket: int | None = 10_000,
                       materialize: bool = False) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) <= max_hamming.

    Blocking: the 64 bits are split into `max_hamming + 1` disjoint bands —
    by pigeonhole, any pair differing in <= max_hamming bits agrees exactly
    on at least one band, so banding is lossless for the requested radius
    (with a fixed 4-band split, recall silently broke above Hamming 3).
    Verify is JVM-side bit_count(xor). Returns (id_a, id_b, hamming int).

    `max_bucket` (default 10k) drops over-full band buckets before the
    self-join: at radius 4 band keys are only ~12-13 bits, so bucket
    population grows LINEARLY with corpus size and an uncapped bucket join
    goes quadratic on a 10^9-doc corpus — the same skew hazard the MinHash
    and embedding-LSH paths cap. Recall trade: the cap costs pairs only
    when EVERY band of both members is hot, i.e. docs near-dup to very
    many others (boilerplate-class content a curation pipeline drops
    anyway). Pass max_bucket=None to restore the lossless-at-radius
    pigeonhole guarantee on bounded corpora.

    Scale tradeoff: more bands means narrower band keys, hence a smaller
    key space and larger buckets (candidate volume grows roughly as
    n^2 * bands / 2^width per band). Radii beyond ~7 on a 64-bit
    fingerprint want a wider fingerprint, not more bands.
    """
    s = ensure_parallelism(
        df.select(F.col(id_col).alias("_id"), F.col(text_col))).select(
        "_id", simhash_udf()(F.col(text_col)).alias("sh"))
    # sh=0 marks word-less docs (see simhash_udf) — they are not duplicates
    # of each other, just empty; exclude them from blocking
    s = s.filter(F.col("sh") != 0)
    return hamming_band_pairs(s, max_hamming, max_bucket=max_bucket,
                              materialize=materialize)


def hamming_band_pairs(s: DataFrame, max_hamming: int,
                       max_bucket: int | None = None,
                       materialize: bool = False) -> DataFrame:
    """Generic Hamming blocking over a 64-bit sketch column:
    input (_id long, sh long) -> (id_a, id_b, hamming) for all pairs with
    Hamming(sh_a, sh_b) <= max_hamming. Pigeonhole over max_hamming+1
    disjoint bands; verify is JVM bit_count(xor). Shared by the text
    SimHash and the random-hyperplane embedding sketch
    (similarity.embedding_lsh_neardup).

    max_bucket=None (default) is LOSSLESS at the radius (the pigeonhole
    guarantee; pinned by test_simhash_banding_is_lossless). At high radii
    band keys get narrow (radius 6 -> ~9-bit keys) and bucket sizes scale
    with corpus size, so the self-join goes quadratic on huge corpora —
    pass max_bucket to drop over-full buckets (the minhash-LSH skew guard;
    costs recall only for items whose EVERY band is hot, i.e. items
    near-dup to very many others).

    Same laziness contract as minhash_lsh_candidates: the sketch frame is
    persisted (both self-join sides consume it); materialize=True eagerly
    localCheckpoints the pair set and releases that cache — otherwise the
    persist is registered with llmap_spark.cache for caller-controlled
    release via release_persisted() (each call pins one tiny id+long
    frame)."""
    from llmap_spark.cache import register_persisted

    n_bands = max_hamming + 1
    if not 1 <= n_bands <= 16:
        raise ValueError(f"max_hamming={max_hamming} out of range for a "
                         "64-bit sketch; use a wider fingerprint")
    base, rem = divmod(64, n_bands)
    widths = [base + 1 if k < rem else base for k in range(n_bands)]
    # both self-join sides consume the sketch subtree (often a UDF);
    # persist so that pass happens once (tiny rows: id + one long)
    s = s.persist()
    if not materialize:
        register_persisted(s)
    bands = []
    off = 0
    for k, w in enumerate(widths):
        # w == 64 (max_hamming=0, one band): (1<<64)-1 overflows a signed
        # long literal; -1 is the same all-bits mask in two's complement
        mask = F.lit((1 << w) - 1 if w < 64 else -1)
        bands.append(F.struct(
            F.lit(k).alias("band"),
            F.shiftrightunsigned("sh", off).bitwiseAND(mask).alias("key")))
        off += w
    e = s.select("_id", "sh", F.explode(F.array(*bands)).alias("bk")) \
         .select("_id", "sh", "bk.band", "bk.key")
    if max_bucket is not None:
        # groupBy counts + anti-join against over-full buckets, not a
        # window: the hot bucket the cap targets would otherwise buffer
        # whole in one window task. The anti side carries only buckets
        # exceeding the cap (rare by construction), so AQE broadcasts it
        # and the exploded frame never shuffles for the cap (same
        # rationale as the minhash guard above)
        hot = (e.groupBy("band", "key")
               .agg(F.count(F.lit(1)).alias("_bn"))
               .filter(F.col("_bn") > max_bucket)
               .select("band", "key"))
        e = e.join(hot, ["band", "key"], "left_anti")
    a = e.select(F.col("_id").alias("id_a"), F.col("sh").alias("sh_a"), "band", "key")
    b = e.select(F.col("_id").alias("id_b"), F.col("sh").alias("sh_b"), "band", "key")
    out = (
        a.join(b, ["band", "key"]).filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
    if materialize:
        out = out.localCheckpoint(eager=True)
        s.unpersist()
    return out


# --------------------------------------------------------------------------
# exact n-gram jaccard (SQL-oracle-able)
# --------------------------------------------------------------------------

def ngram_jaccard_pairs(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", n: int = 3,
                        threshold_num: int = 1, threshold_den: int = 2) -> DataFrame:
    """Exact word-n-gram Jaccard >= num/den via explode + equi-join.

    Pure DataFrame ops, integer threshold comparison (den*inter >=
    num*union) — no floats, so the DuckDB oracle hashes identically.
    At scale this is the verify stage after LSH; on its own it is
    quadratic in bucket df and should follow a candidate filter.
    """
    from llmap_spark.operators.textstats import word_ngrams

    words = F.split(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")), " ")
    # the shared constructor carries the sequence(1,0)-descending guard
    # and the blank-doc '' gram guard (critical at n=1: every blank doc
    # would share the '' gram and pair with every other blank doc — the
    # shared-sentinel hazard plus an uncapped quadratic join)
    g = (
        df.select(F.col(id_col).alias("_id"), words.alias("_w"))
        .select("_id",
                F.explode(F.array_distinct(word_ngrams("_w", n))).alias("gram"))
    )
    sizes = g.groupBy("_id").agg(F.count("*").alias("sz"))
    inter = (
        g.alias("x").join(g.alias("y"), "gram")
        .filter(F.col("x._id") < F.col("y._id"))
        .groupBy(F.col("x._id").alias("id_a"), F.col("y._id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("_id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("_id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn("union_sz", F.col("sz_a") + F.col("sz_b") - F.col("inter"))
        .filter(F.lit(threshold_den) * F.col("inter") >= F.lit(threshold_num) * F.col("union_sz"))
        .select("id_a", "id_b", "inter", "union_sz")
    )


# --------------------------------------------------------------------------
# clustering candidate pairs
# --------------------------------------------------------------------------

def _union_find_components(spark, edges: DataFrame) -> DataFrame:
    """Driver-side union-find over a bounded, already-materialized pair
    frame. Duplicate pairs and edge direction are irrelevant to
    union-find (union is symmetric and idempotent), so the RAW pair set
    works — no mirroring or distinct needed (r6: the driver fast path
    used to pay a distinct exchange and a doubled checkpoint write for a
    canonical edge set only the distributed fixpoint needs). Every union
    attaches the larger root under the smaller, so each set's root IS
    its minimum id — labels match the distributed min-label fixpoint
    exactly (pinned by pytest running both paths on the same graphs)."""
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    # Arrow collect (toPandas) + zip over columns: ~16 B/edge on the wire
    # and no per-row pyspark Row objects (collect() would cost ~100+ B per
    # edge in boxed Rows before union-find even starts)
    pdf = edges.toPandas()
    for a, b in zip(pdf.iloc[:, 0].tolist(), pdf.iloc[:, 1].tolist()):
        if a not in parent:
            parent[a] = a
        if b not in parent:
            parent[b] = b
        ra, rb = find(a), find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra

    from pyspark.sql.types import StructField, StructType

    id_type = edges.schema.fields[0].dataType
    schema = StructType([StructField("node", id_type),
                         StructField("component", id_type)])
    # broadcast hint: this frame is bounded by construction (<=
    # driver_threshold edges -> <= 2x that in nodes, a few MB) but is
    # RDD-backed, whose sizeInBytes estimate is defaultSizeInBytes
    # (effectively infinite) — without the hint the keep-list anti-join
    # downstream planned as a SortMergeJoin that exchanged+sorted BOTH
    # sides (r6 plan audit, pipeline_kept_docs_before.txt); the hint makes
    # every consumer join map-side. The distributed CC path returns
    # cluster-scale labels and is deliberately NOT hinted.
    return F.broadcast(spark.createDataFrame(
        [(n, find(n)) for n in parent], schema))


def connected_components(pairs: DataFrame, id_a: str = "id_a",
                         id_b: str = "id_b", max_iter: int = 50,
                         strict: bool = True,
                         reliable: bool = False,
                         checkpoint_dir: str | None = None,
                         driver_threshold: int = 250_000) -> DataFrame:
    """Duplicate clusters from candidate pairs: min-label propagation with
    POINTER DOUBLING (label = smallest reachable id).

    Each round does (1) a hop — every node takes the min label over its
    neighborhood — and (2) a jump — label <- label(label), halving the
    remaining pointer distance. The reachable-min distance roughly doubles
    per round, so convergence is O(log diameter) rounds instead of the
    O(diameter) of plain one-hop propagation (a 1000-node path converges
    in ~10 rounds, not ~1000; pinned by a pytest case). With strict=True
    (default) a non-converged run RAISES instead of silently returning
    split components.

    Round cost: TWO materialization jobs (hop; jump) plus one trivial
    scan-aggregate over the already-materialized jump — change detection
    is FUSED into the jump join (the old-label comparison rides the same
    job), not run as a separate join job afterwards.

    Fault tolerance: the default materialization is localCheckpoint —
    fastest, but its blocks live on executors and are LOST on executor
    failure, killing a long iteration mid-flight on a real cluster. Pass
    reliable=True to use RELIABLE checkpoints instead (written to the
    cluster checkpoint dir — HDFS/S3 — and recoverable across executor
    loss); set `checkpoint_dir` or pre-configure
    spark.sparkContext.setCheckpointDir. At 100 TB, reliable=True is the
    right default for any corpus whose CC runs longer than the mean
    executor MTBF.

    Reliable-checkpoint retention: Spark deletes checkpoint files only
    under spark.cleaner.referenceTracking.cleanCheckpoints=true (default
    FALSE), so a reliable run leaves O(rounds) label/edge snapshots in
    checkpoint_dir. Set that conf on long-lived clusters, or treat
    checkpoint_dir as per-run scratch and delete it after the returned
    labels are materialized (written/collected) — the frame reads from
    those files until then. setCheckpointDir is also CONTEXT-GLOBAL
    state, shared with any other checkpoint user in the session.

    This replaces a GraphFrames/union-find dependency; genuinely
    non-SQL-expressible, so the driver records rows-only for it and pytest
    checks it against a driver-side union-find on small data (both modes).

    Adaptive small-graph fast path: after the (always-paid) one-time
    materialization of the raw pair set, if 2x the pair count (an upper
    bound on the directed edge count — duplicates only shrink it) is
    <= driver_threshold the component labels are computed by a
    driver-side union-find on one bounded Arrow collect of the RAW pairs
    — identical labels (component = min reachable id), zero iterative
    rounds, and no mirrored/distinct edge set to build (union-find is
    direction- and duplicate-agnostic). Near-dup candidate edges are
    typically a tiny fraction of corpus rows even at 100 TB, so most
    runs take this path; bigger graphs build the canonical edge set and
    run the distributed loop. The default (250k directed edges) is sized
    for the PYTHON-side cost, which dominates: the Arrow frame itself is
    ~4 MB, but the union-find's parent dict boxes up to 2 ids per edge
    (~60-100 MB at the default) — a 1g-driver-safe bound. Pass
    driver_threshold=0 to force the distributed path (the pytest pinning
    round-count/convergence semantics does).
    """
    spark = pairs.sparkSession
    if reliable:
        sc = spark.sparkContext
        if checkpoint_dir is not None:
            sc.setCheckpointDir(checkpoint_dir)
        elif sc.getCheckpointDir() is None:
            raise ValueError(
                "connected_components(reliable=True) needs a reliable "
                "checkpoint location: pass checkpoint_dir= or call "
                "spark.sparkContext.setCheckpointDir first")

        def ckpt(df: DataFrame) -> DataFrame:
            return df.checkpoint(eager=True)
    else:
        def ckpt(df: DataFrame) -> DataFrame:
            return df.localCheckpoint(eager=True)

    # materialize the RAW pair set ONCE up front: the size probe and every
    # downstream consumer read this checkpoint, so a lazy `pairs` plan
    # (e.g. a full LSH pipeline) is evaluated exactly once — unmaterialized
    # it would be recomputed per round, measured 9x slower on the composed
    # curation chain. r6: the mirrored+distinct canonical edge set is
    # built only on the DISTRIBUTED path — union-find is direction- and
    # duplicate-agnostic, so the common driver fast path skips that
    # distinct exchange and the doubled checkpoint write.
    pairs_m = ckpt(pairs.select(F.col(id_a).alias("a"),
                                F.col(id_b).alias("b")))
    # 2x raw pairs bounds the directed edge count from above (duplicates
    # only shrink it), so this probe is conservative: never sends a graph
    # to the driver that the directed-edge rule would have kept
    # distributed. Label output is identical on both paths (pinned).
    if driver_threshold and 2 * pairs_m.count() <= driver_threshold:
        return _union_find_components(spark, pairs_m)
    edges = ckpt(
        pairs_m.union(pairs_m.select(F.col("b").alias("a"),
                                     F.col("a").alias("b")))
        .distinct()
    )
    labels = (
        edges.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    converged = False
    for _ in range(max_iter):
        # hop: min label over self + neighbors
        prop = (
            edges.join(labels, edges.a == labels.node)
            .select(F.col("b").alias("node"), F.col("label"))
        )
        hop = (
            labels.select("node", "label").union(prop)
            .groupBy("node").agg(F.min("label").alias("label"))
        )
        # materialize before the self-join: checkpointing cuts lineage AND
        # sidesteps attribute-resolution failures Spark hits when
        # self-joining a deep un-materialized plan (seen with window+union
        # upstreams); rounds are O(log diameter) so the extra
        # materialization is cheap
        hop = ckpt(hop)
        # jump: label <- label(label). Every label value is itself a node
        # (labels start as node ids and only node labels propagate), so the
        # self-join resolves each pointer one extra level; left join +
        # coalesce keeps the row if the lookup misses. The OLD label joins
        # in here too, so the changed-this-round flag materializes in the
        # SAME job as the jump instead of a separate join job per round.
        jumped = (
            hop.alias("x")
            .join(hop.select(F.col("node").alias("label"),
                             F.col("label").alias("label2")).alias("y"),
                  "label", "left")
            .select(F.col("node"),
                    F.least(F.col("label"),
                            F.coalesce(F.col("label2"), F.col("label")))
                    .alias("label"))
            .join(labels.select("node", F.col("label").alias("_old")), "node")
            .select("node", "label",
                    (F.col("label") != F.col("_old")).cast("int").alias("_chg"))
        )
        new_labels = ckpt(jumped)
        # trivial aggregate over the materialized frame — no join recompute
        changed = new_labels.agg(F.max("_chg")).first()[0]
        labels = new_labels.select("node", "label")
        if not changed:
            converged = True
            break
    if not converged and strict:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "(log2(diameter) exceeds max_iter); raise max_iter or pass "
            "strict=False to accept split components")
    return labels.select(F.col("node"), F.col("label").alias("component"))
