

def test_literal_and_dynamic_rp_buckets_identical(spark, sf_dir):
    """The driver-side hyperplane_coeff must stay bit-identical to the SQL
    md5 formula: literal-array buckets (dim known) == dynamic md5 buckets."""
    from pyspark.sql import functions as F

    from replibyte_spark import dialect as D
    from replibyte_spark.catalog import load_table
    from replibyte_spark.operators import similarity as S

    emb = load_table(spark, sf_dir, "embeddings")
    dim = len(emb.first().embedding)
    dyn = emb.select("vec_id", F.expr(
        S.rp_bucket_sql(D.SPARK, "embedding", 5, "x")).alias("b"))
    lit = emb.select("vec_id", F.expr(
        S.rp_bucket_sql(D.SPARK, "embedding", 5, "x", dim=dim)).alias("b"))
    assert dyn.exceptAll(lit).count() == 0 and lit.exceptAll(dyn).count() == 0


def test_fixture_embedding_dim_matches_constant(spark, sf_dir):
    from replibyte_spark.catalog import load_table
    from replibyte_spark.workload.similarity_queries import EMB_DIM

    emb = load_table(spark, sf_dir, "embeddings")
    assert len(emb.first().embedding) == EMB_DIM
