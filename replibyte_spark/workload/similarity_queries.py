"""Gate queries for similarity search over the embeddings table.

The brute-force top-k is oracle-checked (exact semantics, fold order
identical in both engines).  The LSH variant is the scale path; its recall
against brute force is asserted in the unit tests, and its bucket histogram
is oracle-checked here (bucket ids are deterministic md5-derived
hyperplanes, so DuckDB reproduces them exactly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import dialect as D
from ..catalog import load_table
from ..operators import similarity as S
from . import Query, register

K = 5
QUERY_MOD = 100  # vec_id % 100 == 0 → deterministic query subset (~1%)
# fixture embedding width (all sf; asserted in tests) — lets the RP bucket
# hyperplane coefficients inline as literals instead of per-row md5
EMB_DIM = 64


def ann_brute_force(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % QUERY_MOD == 0)
    return S.brute_force_topk(emb, queries, k=K)


ANN_ORACLE = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id % {QUERY_MOD} = 0
), scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         {S.cosine_sql(D.DUCK, 'q.qv', 'e.embedding')} AS cosine
  FROM q JOIN embeddings e ON e.vec_id <> q.query_id
), ranked AS (
  SELECT query_id, neighbor_id, cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cosine, rank
FROM ranked WHERE rank <= {K} ORDER BY query_id, rank
"""

register(Query("ann_brute_force_topk", ann_brute_force, ANN_ORACLE,
               tags=("similarity",), bench=True))


BITS = 6


def lsh_bucket_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket-size distribution of the random-projection LSH index."""
    emb = load_table(spark, sf_dir, "embeddings")
    return (S.rp_lsh_buckets(emb, bits=BITS, dim=EMB_DIM)
            .groupBy("bucket").agg(F.count(F.lit(1)).alias("n_vectors"))
            .orderBy("bucket"))


LSH_HIST_ORACLE = f"""
SELECT {S.rp_bucket_sql(D.DUCK, 'embedding', BITS, dim=EMB_DIM)} AS bucket,
       count(*) AS n_vectors
FROM embeddings GROUP BY bucket ORDER BY bucket
"""

register(Query("lsh_bucket_histogram", lsh_bucket_histogram, LSH_HIST_ORACLE,
               tags=("similarity",)), extra=True)


def lsh_topk_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full approximate top-k through the LSH index (single-probe):
    rank by exact cosine within the query's bucket only."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % QUERY_MOD == 0)
    return S.lsh_topk(emb, queries, k=K, bits=BITS, multi_probe=0, dim=EMB_DIM)


LSH_TOPK_ORACLE = f"""
WITH bk AS (
  SELECT vec_id, embedding,
         {S.rp_bucket_sql(D.DUCK, 'embedding', BITS, dim=EMB_DIM)} AS bucket
  FROM embeddings
), scored AS (
  SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
         {S.cosine_sql(D.DUCK, 'q.embedding', 'v.embedding')} AS cosine
  FROM bk q JOIN bk v ON v.bucket = q.bucket AND v.vec_id <> q.vec_id
  WHERE q.vec_id % {QUERY_MOD} = 0
), ranked AS (
  SELECT query_id, neighbor_id, cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cosine, rank
FROM ranked WHERE rank <= {K} ORDER BY query_id, rank
"""

register(Query("lsh_topk", lsh_topk_query, LSH_TOPK_ORACLE,
               tags=("similarity",)))


ND_BITS, ND_TABLES, ND_T = 4, 8, 0.45


def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs via the BUCKETED path (multi-table RP-LSH +
    exact cosine within candidates) — the scale path is what the gate
    checks; the quadratic exact variant is the unit tests' ground truth.
    Threshold tuned to the fixture distribution (max pairwise cosine ≈ 0.5).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    return S.embedding_near_dup_pairs_bucketed(
        emb, threshold=ND_T, bits=ND_BITS, tables=ND_TABLES, dim=EMB_DIM)


def _near_dup_oracle() -> str:
    d = D.DUCK
    per_table = " UNION ALL ".join(
        f"SELECT vec_id, embedding, {t} AS tbl, "
        f"{S.rp_bucket_sql(d, 'embedding', ND_BITS, f'rpt{t}', dim=EMB_DIM)} AS bucket "
        f"FROM embeddings"
        for t in range(ND_TABLES)
    )
    cos = S.cosine_sql(d, "a.embedding", "b.embedding")
    return f"""
WITH bk AS (
  {per_table}
), cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM bk a JOIN bk b ON a.tbl = b.tbl AND a.bucket = b.bucket
                     AND a.vec_id < b.vec_id
)
SELECT c.id_a, c.id_b, {cos} AS cosine
FROM cand c JOIN embeddings a ON a.vec_id = c.id_a
            JOIN embeddings b ON b.vec_id = c.id_b
WHERE {cos} >= {ND_T}
ORDER BY id_a, id_b
"""


register(Query("embedding_near_dup", embedding_near_dup, _near_dup_oracle(),
               tags=("similarity",), bench=True))


# --- IVF ---------------------------------------------------------------------

IVF_CENTROIDS, IVF_PROBE = 16, 2


def ivf_topk_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % QUERY_MOD == 0)
    return S.ivf_topk(emb, queries, k=K,
                      n_centroids=IVF_CENTROIDS, n_probe=IVF_PROBE)


def _ivf_oracle() -> str:
    d = D.DUCK
    dot_ec = S.dot_sql(d, "e.embedding", "c.cv")
    return f"""
WITH cent AS (
  SELECT md5(CAST(vec_id AS VARCHAR)) AS centroid_id, embedding AS cv
  FROM embeddings ORDER BY centroid_id LIMIT {IVF_CENTROIDS}
), assign AS (
  SELECT vec_id, embedding, centroid_id FROM (
    SELECT e.vec_id, e.embedding, c.centroid_id,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {dot_ec} DESC, c.centroid_id DESC) AS rn
    FROM embeddings e CROSS JOIN cent c
  ) WHERE rn = 1
), qprobe AS (
  SELECT query_id, qv, centroid_id FROM (
    SELECT e.vec_id AS query_id, e.embedding AS qv, c.centroid_id,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {dot_ec} DESC, c.centroid_id ASC) AS rn
    FROM embeddings e CROSS JOIN cent c
    WHERE e.vec_id % {QUERY_MOD} = 0
  ) WHERE rn <= {IVF_PROBE}
), scored AS (
  SELECT q.query_id, v.vec_id AS neighbor_id,
         {S.cosine_sql(d, 'q.qv', 'v.embedding')} AS cosine
  FROM qprobe q JOIN assign v ON v.centroid_id = q.centroid_id
                             AND v.vec_id <> q.query_id
), ranked AS (
  SELECT query_id, neighbor_id, cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cosine, rank
FROM ranked WHERE rank <= {K} ORDER BY query_id, rank
"""


register(Query("ivf_topk", ivf_topk_query, _ivf_oracle(),
               tags=("similarity",)))
