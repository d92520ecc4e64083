"""Semantic-clustering curation gates: SemDeDup within-cluster dedup,
cluster-balanced sampling, and the per-cluster corpus profile.

All three share one deterministic clustering of the `embeddings` table
(md5-sampled centroids, literal-inlined argmax assignment — the exact
machinery the IVF gates already oracle-check), so the DuckDB oracles
reproduce the assignment with the same `dot DESC, centroid_id DESC`
row_number idiom as `_ivf_oracle` and the operators' only new semantics
(keep-order, per-cell quota, per-cell coherence) are plain SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .. import dialect as D
from ..catalog import load_table
from ..operators import clustering as C
from ..operators import similarity as S
from . import Query, register

#: clusters for the 500-row sf0.01 fixture (~60/cell); at 100 TB k grows
#: with the corpus so cells stay bounded (SemDeDup uses ~100k clusters)
N_CLUSTERS = 8
#: fixture-tuned: embeddings are near-random (p99 pairwise cosine ≈ 0.29,
#: max ≈ 0.51), so 0.35 flags a real but small within-cluster dup set
SEM_T = 0.35
#: per-cluster quota for the balanced sample
CAP = 20


def _cent_cte() -> str:
    return (f"SELECT md5(CAST(vec_id AS VARCHAR)) AS centroid_id, "
            f"embedding AS cv FROM embeddings "
            f"ORDER BY centroid_id LIMIT {N_CLUSTERS}")


def _assign_cte(d: str) -> str:
    """vec_id, embedding, centroid_id, m (keep-order key) — the literal
    argmax of `_assign_expr` as SQL (dot DESC, centroid_id DESC, rn=1)."""
    dot_ec = S.dot_sql(d, "e.embedding", "c.cv")
    return f"""
  SELECT vec_id, embedding, centroid_id,
         md5(CAST(vec_id AS VARCHAR)) AS m
  FROM (
    SELECT e.vec_id, e.embedding, c.centroid_id,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {dot_ec} DESC, c.centroid_id DESC) AS rn
    FROM embeddings e CROSS JOIN cent c
  ) WHERE rn = 1
"""


def semantic_cluster_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup flag set: every vector with an earlier (md5 keep-order)
    cluster-mate above the cosine threshold, with its single best mate —
    the within-cluster semantic-dedup complement of the RP-LSH global
    `embedding_near_dup` path."""
    emb = load_table(spark, sf_dir, "embeddings")
    return (C.semantic_cluster_dup_pairs(emb, SEM_T, N_CLUSTERS)
            .orderBy("vec_id"))


def _semdedup_oracle() -> str:
    d = D.DUCK
    cos = S.cosine_sql(d, "a.embedding", "b.embedding")
    return f"""
WITH cent AS (
  {_cent_cte()}
), assign AS (
  {_assign_cte(d)}
), pairs AS (
  SELECT a.vec_id, a.centroid_id, b.vec_id AS dup_of, {cos} AS cosine,
         b.m AS m_b, b.vec_id AS id_b
  FROM assign a JOIN assign b
    ON a.centroid_id = b.centroid_id
   AND (b.m < a.m OR (b.m = a.m AND b.vec_id < a.vec_id))
), best AS (
  SELECT vec_id, centroid_id, dup_of, cosine,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY cosine DESC, m_b ASC, id_b ASC) AS rn
  FROM pairs WHERE cosine >= {SEM_T}
)
SELECT vec_id, centroid_id, dup_of, cosine
FROM best WHERE rn = 1 ORDER BY vec_id
"""


# driver-visible (r9): the SemDeDup gate takes the REGISTRY slot of the
# redundant sliding_window_counts (sibling of the still-gated
# tumbling/session/stateful streaming trio, now EXTRA)
register(Query("semantic_cluster_dedup", semantic_cluster_dedup,
               _semdedup_oracle(), tags=("clustering", "dedup"),
               bench=True))


def cluster_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cluster quota sample: at most CAP rows per semantic cell,
    md5-rank keep-order — topic balancing for a training mix."""
    emb = load_table(spark, sf_dir, "embeddings")
    return (C.cluster_balanced_sample(emb, CAP, N_CLUSTERS)
            .select("vec_id", "label", "centroid_id")
            .orderBy("centroid_id", "vec_id"))


def _balanced_oracle() -> str:
    d = D.DUCK
    return f"""
WITH cent AS (
  {_cent_cte()}
), assign AS (
  {_assign_cte(d)}
), ranked AS (
  SELECT a.vec_id, e.label, a.centroid_id,
         row_number() OVER (PARTITION BY a.centroid_id
                            ORDER BY a.m ASC, a.vec_id ASC) AS rn
  FROM assign a JOIN embeddings e ON e.vec_id = a.vec_id
)
SELECT vec_id, label, centroid_id
FROM ranked WHERE rn <= {CAP} ORDER BY centroid_id, vec_id
"""


register(Query("cluster_balanced_sample", cluster_balanced_sample,
               _balanced_oracle(), tags=("clustering", "sampling")),
         extra=True)


def cluster_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cluster size + coherence (mean member-to-centroid cosine)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return C.cluster_profile(emb, N_CLUSTERS)


def _profile_oracle() -> str:
    d = D.DUCK
    cos = S.cosine_sql(d, "a.embedding", "c.cv")
    return f"""
WITH cent AS (
  {_cent_cte()}
), assign AS (
  {_assign_cte(d)}
)
SELECT a.centroid_id, count(*) AS n_members,
       round(avg({cos}), 6) AS mean_cosine
FROM assign a JOIN cent c ON c.centroid_id = a.centroid_id
GROUP BY 1 ORDER BY 1
"""


register(Query("cluster_profile", cluster_profile, _profile_oracle(),
               tags=("clustering",)), extra=True)
