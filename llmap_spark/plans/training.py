"""End-to-end training-data curation plan: the product story the operator
families build toward, composed as one lazy DataFrame transform.

    documents
      -> quality gate           (C4/Gopher-style integer features, JVM-side)
      -> exact dedup            (md5 fingerprint, keep cluster representative)
      -> MinHash LSH            (banded candidate pairs, skew-capped buckets)
      -> verify                 (signature-agreement threshold)
      -> connected components  (pointer-doubling min-label clusters)
      -> keep list              (drop every non-representative cluster member)

Mirrors the reference's funnel shape end-to-end (coarse gate -> survivors ->
refine -> combine; reference llmap.py:139-229) at corpus scale: every stage
is a lazy transform, no driver-side data, and the expensive stages only see
survivors of the cheap ones. The whole chain is genuinely non-SQL-expressible
(hash signatures + an iterative fixpoint), so the driver records rows-only;
pytest pins the kept-set semantics on planted data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def kept_documents(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text",
                   verify_jaccard: float = 0.5,
                   cc_max_iter: int = 50,
                   cc_reliable: bool = False,
                   cc_checkpoint_dir: str | None = None) -> DataFrame:
    """Curated keep-list: one row per surviving doc id.

    A doc survives iff it (1) passes the quality gate, (2) is its exact-hash
    cluster representative, and (3) is the minimum id of its near-dup
    component (or near-dups with nothing). Deterministic: every rule is
    integer arithmetic or a seeded hash.

    cc_reliable=True runs the component iteration on RELIABLE cluster
    checkpoints (cc_checkpoint_dir -> HDFS/S3) so an executor loss cannot
    kill the fixpoint mid-flight — the right mode on a real cluster when
    the corpus makes CC run longer than executor MTBF.
    """
    from llmap_spark.operators.dedup import (connected_components,
                                             exact_dedup,
                                             minhash_lsh_candidates)
    from llmap_spark.operators.textstats import quality_features

    q = quality_features(docs, text_col=text_col).filter(F.col("q_keep"))
    reps = exact_dedup(q, id_col=id_col, text_col=text_col) \
        .filter(~F.col("is_dup"))
    # reps feeds BOTH the LSH stage (materialized eagerly below, which
    # populates this cache) and the final anti-join — persisting avoids a
    # second full quality+window pass over the corpus (measured ~40% off
    # the whole chain at sf0.1). Storage is MEMORY_AND_DISK with LRU
    # eviction, so an over-large corpus spills rather than OOMs; the
    # persist is registered with llmap_spark.cache so a long-lived session
    # releases it via release_persisted().
    from llmap_spark.cache import register_persisted
    reps = register_persisted(reps.persist())
    # materialize=True: the candidate set feeds an ITERATIVE consumer
    # (connected components) plus the final anti-join — exactly the case
    # the LSH operator's caller-controlled materialization exists for
    # (releases the signature cache too)
    cand = minhash_lsh_candidates(reps, id_col=id_col, text_col=text_col,
                                  materialize=True)
    verified = cand.filter(F.col("est_jaccard") >= verify_jaccard)
    comp = connected_components(verified, max_iter=cc_max_iter,
                                reliable=cc_reliable,
                                checkpoint_dir=cc_checkpoint_dir)
    near_dup_losers = (
        comp.filter(F.col("node") != F.col("component"))
        .select(F.col("node").alias(id_col))
    )
    return reps.join(near_dup_losers, id_col, "left_anti").select(id_col)
