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
    return (S.rp_lsh_buckets(emb, bits=BITS)
            .groupBy("bucket").agg(F.count(F.lit(1)).alias("n_vectors"))
            .orderBy("bucket"))


LSH_HIST_ORACLE = f"""
SELECT {S.rp_bucket_sql(D.DUCK, 'embedding', BITS)} AS bucket,
       count(*) AS n_vectors
FROM embeddings GROUP BY bucket ORDER BY bucket
"""

register(Query("lsh_bucket_histogram", lsh_bucket_histogram, LSH_HIST_ORACLE,
               tags=("similarity",)))


def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact near-duplicate pairs by cosine (threshold tuned to the fixture
    distribution, max pairwise cosine ≈ 0.5)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return S.embedding_near_dup_pairs(emb, threshold=0.45)


NEAR_DUP_ORACLE = f"""
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       {S.cosine_sql(D.DUCK, 'a.embedding', 'b.embedding')} AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE {S.cosine_sql(D.DUCK, 'a.embedding', 'b.embedding')} >= 0.45
ORDER BY id_a, id_b
"""

register(Query("embedding_near_dup", embedding_near_dup, NEAR_DUP_ORACLE,
               tags=("similarity",)))
