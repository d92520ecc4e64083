"""Similarity search over embedding columns (`array<float>`).

- :func:`cosine_sql` / :func:`brute_force_topk` — exact cosine top-k: the
  correctness baseline, a broadcast of the (small) query set against the
  full corpus, ranked per query with a window.  No UDF: the dot product is a
  higher-order-function fold that stays in codegen.
- :func:`rp_lsh_buckets` / :func:`lsh_topk` — the scale path: random
  hyperplane (SimHash-for-vectors) bucketing.  Deterministic hyperplanes are
  derived from md5(seed, plane, dim) so every engine/run agrees; candidates
  are searched only within the query's bucket (optionally few-bit-flip
  neighbor buckets).  At 100 TB this turns an O(N·Q) scan into
  O(N/2^bits · Q) per-bucket joins on a pre-computed, partitioned bucket id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .. import dialect as D
from ..util import fan_out


def dot_sql(d: str, a: str, b: str) -> str:
    """Σ a[i]·b[i] as double, sequential fold (identical order both engines)."""
    if d == D.SPARK:
        return (f"aggregate(transform(sequence(1, size({a})), "
                f"i -> CAST(element_at({a}, i) AS DOUBLE) * CAST(element_at({b}, i) AS DOUBLE)), "
                f"CAST(0 AS DOUBLE), (acc, x) -> acc + x)")
    return (f"list_sum(list_transform(generate_series(1, len({a})), "
            f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))")


def norm_sql(d: str, a: str) -> str:
    return f"sqrt({dot_sql(d, a, a)})"


def cosine_sql(d: str, a: str, b: str, decimals: int = 6) -> str:
    return (f"round({dot_sql(d, a, b)} / ({norm_sql(d, a)} * {norm_sql(d, b)}), "
            f"{decimals})")


def brute_force_topk(vectors: DataFrame, queries: DataFrame, k: int = 5,
                     id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k neighbors per query vector by cosine.

    `queries` (small) is broadcast; ranking is per-query with a deterministic
    tie-break on neighbor id.  Returns (query_id, neighbor_id, cosine, rank).

    Each side's norm is computed ONCE per vector before the join (the naive
    per-pair `cosine_sql` folds both norms again for every pair — 3 HOF
    folds/pair instead of 1).  `round(dot/(qn·nn), 6)` is bit-identical to
    the inline form: same subexpressions, same IEEE op order, just hoisted.

    Zero-norm vectors have no defined cosine: rows with norm 0 are
    EXCLUDED from both sides (the shared policy with the Arrow path —
    IEEE 0/0 would otherwise rank NaN > everything in Spark SQL while
    numpy's lexsort puts NaN last, silently diverging the two paths).
    """
    q = (queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
                        F.expr(norm_sql(D.SPARK, vec_col)).alias("qn"))
         .filter(F.col("qn") > 0))
    v = (fan_out(vectors)
         .select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv"),
                 F.expr(norm_sql(D.SPARK, vec_col)).alias("nn"))
         .filter(F.col("nn") > 0))
    scored = (
        F.broadcast(q).crossJoin(v)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", F.expr(
            f"round({dot_sql(D.SPARK, 'qv', 'nv')} / (qn * nn), 6)"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "cosine", "rank")
            .orderBy("query_id", "rank"))


def brute_force_topk_arrow(vectors: DataFrame, queries: DataFrame,
                           k: int = 5, id_col: str = "vec_id",
                           vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k via Arrow-batched numpy — the vectorized-Python
    counterpart of :func:`brute_force_topk`.

    Dense pair scoring is the one workload where Python BEATS the codegen
    path: the SQL higher-order fold evaluates ~N·Q·dim interpreted lambda
    steps, while one BLAS matmul per Arrow batch does the same flops at
    memory bandwidth.  Design: the (small) query matrix is captured in the
    closure and sent once per task; each corpus partition computes
    `V @ Q.T`, keeps only its local top-k rows per query (partial top-k —
    the shuffle carries ≤ k·|Q| rows per partition, never the N·Q score
    matrix), and a final per-query window merges partitions.  Same
    semantics as the SQL path: cosine rounded to 6 decimals, ties broken
    by ascending neighbor id, self-pairs excluded.

    Values can differ from the SQL fold in the last ulp (pairwise/SIMD vs
    sequential summation) — invisible at 6-decimal rounding except on
    exact .0000005 boundaries; the equivalence test locks agreement on the
    fixture corpus.  Zero-norm rows are excluded on both sides — same
    policy as :func:`brute_force_topk`, locking the two paths' agreement
    even on a corpus containing a zero vector.
    """
    import numpy as np
    import pandas as pd

    q_rows = [r for r in queries.select(id_col, vec_col).collect()
              if any(x != 0 for x in r[1])]           # bounded: |Q| small
    if not q_rows:
        id_type = vectors.schema[id_col].dataType
        return (vectors.select(
            F.lit(None).cast(id_type).alias("query_id"),
            F.col(id_col).alias("neighbor_id"),
            F.lit(None).cast("double").alias("cosine"),
            F.lit(None).cast("int").alias("rank")).filter(F.lit(False)))
    q_ids = np.array([r[0] for r in q_rows])
    Q = np.asarray([r[1] for r in q_rows], dtype=np.float64)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)

    def score(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf[id_col].to_numpy()
            V = np.asarray(list(pdf[vec_col]), dtype=np.float64)
            vn = np.linalg.norm(V, axis=1, keepdims=True)
            nz = vn[:, 0] != 0                        # zero-norm exclusion
            if not nz.all():
                ids, V, vn = ids[nz], V[nz], vn[nz]
            if not len(ids):
                continue
            C = np.round((V / vn) @ Qn.T, 6)          # (n_vec, n_query)
            out_q, out_n, out_c = [], [], []
            for j in range(len(q_ids)):
                col = C[:, j]
                mask = ids != q_ids[j]                # exclude self-pair
                cand_idx = np.nonzero(mask)[0]
                if not len(cand_idx):
                    continue
                # partial top-k via full (score desc, id asc) lexsort —
                # NOT argpartition, whose selection among rows TIED at the
                # k-th score is arbitrary and would drop the smallest-id
                # tied neighbors the contract promises; the sort is
                # O(rows·log rows) per partition, noise next to the matmul
                order = np.lexsort((ids[cand_idx], -col[cand_idx]))[:k]
                sel = cand_idx[order]
                out_q.extend([q_ids[j]] * len(sel))
                out_n.extend(ids[sel])
                out_c.extend(col[sel])
            yield pd.DataFrame({"query_id": out_q, "neighbor_id": out_n,
                                "cosine": out_c})

    id_sql = vectors.schema[id_col].dataType.simpleString()
    scored = fan_out(vectors).mapInPandas(
        score, schema=f"query_id {id_sql}, neighbor_id {id_sql}, "
                      f"cosine double")
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"),
                                               F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "cosine", "rank")
            .orderBy("query_id", "rank"))


def hyperplane_component_sql(d: str, plane: int, dim_expr: str, seed: str = "rp") -> str:
    """Deterministic pseudo-random hyperplane coefficient in [-0.5, 0.5):
    a pure function of (seed, plane index, dimension index)."""
    key = f"'{seed}:{plane}:' || {D.to_str(d, dim_expr)}"
    digits = f"translate(substr(md5({key}), 1, 6), 'abcdef', '123456')"
    return f"(CAST({digits} AS DOUBLE) / 1000000.0 - 0.5)"


_HEX_TO_DIGIT = str.maketrans("abcdef", "123456")


def hyperplane_coeff(plane: int, i: int, seed: str = "rp") -> float:
    """Driver-side evaluation of :func:`hyperplane_component_sql` for
    1-based dim index `i` — bit-identical to the SQL formula (same md5 key,
    same digit fold, same IEEE op order)."""
    import hashlib

    h = hashlib.md5(f"{seed}:{plane}:{i}".encode()).hexdigest()[:6]
    return int(h.translate(_HEX_TO_DIGIT)) / 1000000.0 - 0.5


def _lit_dot_sql(vec_col: str, coeffs: "list[float]") -> str:
    """Σ vec[i]·literal[i] — identical fold shape (and IEEE op order) to
    dot_sql against a column holding the same doubles, so inlined and
    joined coefficient dots are bit-equal.  Shared by the RP bucket bits
    and the IVF centroid argmax, which must never diverge."""
    arr = "array(" + ", ".join(f"{x!r}D" for x in coeffs) + ")"
    return (f"aggregate(transform(sequence(1, {len(coeffs)}), "
            f"i -> CAST(element_at({vec_col}, i) AS DOUBLE) * "
            f"element_at({arr}, i)), "
            f"CAST(0 AS DOUBLE), (acc, x) -> acc + x)")


def rp_bucket_sql(d: str, vec: str, bits: int = 8, seed: str = "rp",
                  dim: int | None = None) -> str:
    """Random-projection bucket id: `bits` sign bits concatenated.

    With `dim` known, the hyperplane coefficients are precomputed on the
    driver and inlined as literal arrays — the dynamic path evaluates an
    md5 PER (plane, dimension) PER ROW (bits × dim md5/vector; measured
    ~1.3 s/2k vectors at dim 64 × 32 planes), pure constant work hoisted to
    plan build time here.  `dim=None` keeps the dynamic path for ragged or
    unknown-width vectors; both produce identical buckets."""
    bit_exprs = []
    for p in range(bits):
        if dim is not None:
            coeffs = [hyperplane_coeff(p, i, seed) for i in range(1, dim + 1)]
            if d == D.SPARK:
                proj = _lit_dot_sql(vec, coeffs)
            else:
                # D.dlit (exponent-form literals): bare decimals parse as
                # DECIMAL in DuckDB and convert to DOUBLE off by one ulp
                # for full-precision reprs
                arr = "[" + ", ".join(D.dlit(d, x) for x in coeffs) + "]"
                proj = (f"list_sum(list_transform(generate_series(1, {dim}), "
                        f"i -> CAST({vec}[i] AS DOUBLE) * ({arr})[i]))")
        else:
            comp = hyperplane_component_sql(d, p, "i", seed)
            if d == D.SPARK:
                proj = (f"aggregate(transform(sequence(1, size({vec})), "
                        f"i -> CAST(element_at({vec}, i) AS DOUBLE) * {comp}), "
                        f"CAST(0 AS DOUBLE), (acc, x) -> acc + x)")
            else:
                proj = (f"list_sum(list_transform(generate_series(1, len({vec})), "
                        f"i -> CAST({vec}[i] AS DOUBLE) * {comp}))")
        bit_exprs.append(f"(CASE WHEN {proj} > 0 THEN '1' ELSE '0' END)")
    return " || ".join(bit_exprs)


def rp_lsh_buckets(vectors: DataFrame, bits: int = 8, seed: str = "rp",
                   vec_col: str = "embedding",
                   dim: int | None = None) -> DataFrame:
    """Vectors annotated with their LSH bucket id (precompute + partition by
    bucket at scale; bucket computation is one codegen'd projection)."""
    return fan_out(vectors).withColumn(
        "bucket", F.expr(rp_bucket_sql(D.SPARK, vec_col, bits, seed, dim)))


def lsh_topk(vectors: DataFrame, queries: DataFrame, k: int = 5, bits: int = 8,
             seed: str = "rp", id_col: str = "vec_id",
             vec_col: str = "embedding", multi_probe: int = 0,
             dim: int | None = None) -> DataFrame:
    """Approximate top-k: rank only within the query's bucket(s).

    `multi_probe=1` also probes every bucket at Hamming distance 1 from the
    query's bucket (bits+1 probes) — the standard recall/cost dial.  Recall
    is tested against :func:`brute_force_topk` on clustered data in the unit
    tests; at 100 TB the bucket column is what you partition/cluster the
    corpus by, so a query touches (1+probes)/2^bits of the data.
    """
    # a corpus that already carries its index columns (bucket, norm — e.g.
    # read back from build_ann_index storage) skips the per-query bucket
    # recomputation: at 100 TB the bucket IS the storage layout, computed
    # once at ingest, and a query touches only its probe buckets
    if "bucket" in vectors.columns:
        # plan-time guard first: a corpus loaded through load_ann_index
        # carries the build-time (bits, seed) as column metadata — a
        # SAME-width different-seed query would sail through the runtime
        # width assert below and silently return wrong/near-empty
        # neighbors, so mismatches raise HERE, on the driver, before any
        # job runs.
        md = vectors.schema["bucket"].metadata or {}
        if "rs_ann_bits" in md:
            got = (int(md["rs_ann_bits"]), md.get("rs_ann_seed"))
            if got != (bits, seed):
                raise ValueError(
                    f"indexed corpus was built with bits={got[0]} "
                    f"seed={got[1]!r} but the query asked for bits={bits} "
                    f"seed={seed!r} — pass the parameters recorded by "
                    f"load_ann_index_meta, or rebuild the index")
        # runtime guard, not a silent empty join: an index built with a
        # different `bits` has different bucket widths, and the equi-join
        # would return zero neighbors with no hint why.  assert_true rides
        # a filter (coalesce(null, true) keeps every row) so it cannot be
        # pruned and costs nothing when the widths agree.  Kept even with
        # the metadata check: a caller-assembled bucket column (no
        # metadata) still gets the width backstop.
        vb = vectors.filter(F.coalesce(
            F.assert_true(F.length("bucket") == F.lit(bits),
                          F.lit(f"indexed corpus bucket width != bits={bits} "
                                f"(index built with different bits/seed?)")),
            F.lit(True)))
    else:
        vb = rp_lsh_buckets(vectors, bits, seed, vec_col, dim)
    qb = rp_lsh_buckets(queries, bits, seed, vec_col, dim)
    if multi_probe:
        probes = [F.col("bucket")]
        for j in range(bits):
            flipped = F.concat(
                F.substring("bucket", 1, j),
                F.when(F.substring("bucket", j + 1, 1) == "1", "0").otherwise("1"),
                F.substring("bucket", j + 2, bits - j - 1),
            )
            probes.append(flipped)
        qb = (qb.withColumn("bucket", F.explode(F.array(*probes))))
    q = qb.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
                  F.expr(norm_sql(D.SPARK, vec_col)).alias("qn"), "bucket")
    nn = (F.col("norm") if "norm" in vb.columns
          else F.expr(norm_sql(D.SPARK, vec_col)))
    v = vb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv"),
                  nn.alias("nn"), "bucket")
    scored = (
        F.broadcast(q).join(v, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        # no dedup needed: a neighbor lives in exactly ONE bucket and the
        # probe set (original + single-bit flips) is all-distinct buckets,
        # so the join emits each (query, neighbor) pair at most once — a
        # dropDuplicates here was a whole extra shuffle in the hot path
        # per-side norms hoisted out of the per-pair fold (see brute_force_topk)
        .withColumn("cosine", F.expr(
            f"round({dot_sql(D.SPARK, 'qv', 'nv')} / (qn * nn), 6)"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "cosine", "rank")
            .orderBy("query_id", "rank"))


def default_centroids(vectors: DataFrame, n_centroids: int = 16,
                      id_col: str = "vec_id",
                      vec_col: str = "embedding") -> DataFrame:
    """Deterministic hash-sample of the corpus as IVF centroids.

    The centroid id IS the md5 of the vector id: `orderBy(md5).limit(k)`
    compiles to TakeOrderedAndProject (per-partition partial top-k merged on
    the driver) — no global-window row_number forcing the corpus through one
    partition.  At 100 TB you precompute/refine centroids offline once and
    broadcast them; this default just makes the zero-config path scale-safe.
    """
    return (vectors
            .select(F.md5(F.col(id_col).cast("string")).alias("centroid_id"),
                    F.col(vec_col).alias("cv"))
            .orderBy("centroid_id")
            .limit(n_centroids))


def _collect_centroids(centroids) -> "list[tuple[str, list[float]]]":
    """Driver-collect the centroid set for literal inlining — bounded by
    the n_centroids contract (same move as the RP hyperplanes).  Accepts a
    pre-collected [(centroid_id, [coeffs])] list unchanged, so callers can
    build the index ONCE and reuse it across queries (at 100 TB the
    centroid set is offline-computed corpus metadata, not per-query
    work)."""
    if isinstance(centroids, list):
        return centroids
    return [(r.centroid_id, [float(x) for x in r.cv])
            for r in centroids.collect()]


def ivf_assign(vectors: DataFrame, n_centroids: int = 16,
               id_col: str = "vec_id", vec_col: str = "embedding",
               centroids: "DataFrame | list | None" = None) -> DataFrame:
    """IVF coarse quantization: assign every vector to its nearest centroid
    (by dot product; deterministic max-centroid_id tie-break).

    Centroids default to :func:`default_centroids`.  The centroid set is
    bounded by contract (n_centroids), so it is collected and inlined as
    LITERAL arrays: assignment compiles to ONE argmax projection riding
    the corpus scan — no k× crossJoin row amplification and no corpus-wide
    groupBy shuffle (the previous plan shuffled N·k rows to argmax each
    vector; at 100 TB that shuffle IS the job).  Returns vectors +
    `centroid_id`.
    """
    if centroids is None:
        centroids = default_centroids(vectors, n_centroids, id_col, vec_col)
    cents = _collect_centroids(centroids)
    if not cents:
        return (fan_out(vectors)
                .withColumn("centroid_id", F.lit(None).cast("string"))
                .filter(F.lit(False)))
    return fan_out(vectors).withColumn(
        "centroid_id", F.expr(_assign_expr(vec_col, cents)))


def _assign_expr(vec_col: str, cents) -> str:
    """argmax centroid as one expression: array_max over struct(d,
    centroid_id) = max_by with max-centroid_id tie-break (struct ordering
    compares fields left to right)."""
    # D.q, not bare '{cid}': default ids are md5 hex, but the API accepts
    # arbitrary caller-supplied centroid lists — an id containing a quote
    # must not break (or worse, rewrite) the rendered expression
    structs = ", ".join(
        f"struct({_lit_dot_sql(vec_col, cv)} AS d, {D.q(cid)} AS centroid_id)"
        for cid, cv in cents)
    return f"array_max(array({structs})).centroid_id"


def refine_centroids(vectors: DataFrame, centroids: DataFrame,
                     iterations: int = 2, id_col: str = "vec_id",
                     vec_col: str = "embedding",
                     normalize: bool = False,
                     deterministic: bool = False) -> DataFrame:
    """Lloyd refinement for IVF centroids: repeat (assign to nearest
    centroid → replace each centroid with its cell's element-wise mean).

    Fully declarative: the mean is a posexplode to (cell, dim, value) rows
    + one groupBy — shuffle volume is N·D scalars, the offline-refinement
    job you run once before partitioning a 100 TB corpus by cell.  Keeps
    the (centroid_id, cv) contract of :func:`default_centroids`, so the
    result broadcasts straight into :func:`ivf_assign` / :func:`ivf_topk`.
    Empty cells keep their previous centroid (no NaNs, stable k).

    `normalize=True` renormalizes each mean to unit length (spherical
    k-means) — the right variant for cosine/dot retrieval over normalized
    embeddings, where the plain mean's norm shrinkage would otherwise
    deflate dot scores.

    `deterministic=True` computes each cell mean as a SEQUENTIAL fold over
    the cell's values sorted by `id_col` instead of `F.avg` — bit-identical
    across engines and runs (the same trick :func:`dot_sql` uses), so an
    external oracle can reproduce the refined values exactly.  It
    collect_list's each (cell, dim) group, so it is for verification /
    fixture builds; the default `F.avg` path (partial aggregation,
    ulp-nondeterministic summation order) is the 100 TB path.
    """
    for _ in range(iterations):
        assigned = ivf_assign(vectors, id_col=id_col, vec_col=vec_col,
                              centroids=centroids)
        dims = (assigned.select("centroid_id",
                                F.col(id_col).alias("__rid"),
                                F.posexplode(F.col(vec_col))
                                .alias("pos", "x")))
        if deterministic:
            means = (dims.groupBy("centroid_id", "pos")
                     .agg(F.expr(
                         "aggregate(transform(array_sort(collect_list("
                         "struct(__rid AS r, CAST(x AS DOUBLE) AS x))), "
                         "s -> s.x), CAST(0 AS DOUBLE), "
                         "(acc, v) -> acc + v) "
                         "/ CAST(count(1) AS DOUBLE)").alias("m")))
        else:
            means = (dims.groupBy("centroid_id", "pos")
                     .agg(F.avg("x").alias("m")))
        rebuilt = (means.groupBy("centroid_id")
                   .agg(F.transform(
                       F.array_sort(F.collect_list(F.struct("pos", "m"))),
                       lambda s: s["m"]).alias("cv")))
        if normalize:
            rebuilt = rebuilt.withColumn(
                "cv", F.expr(f"transform(cv, x -> x / {norm_sql(D.SPARK, 'cv')})"))
        centroids = (centroids.select("centroid_id").join(
            rebuilt, on="centroid_id", how="left")
            .join(centroids.select("centroid_id",
                                   F.col("cv").alias("__old")),
                  on="centroid_id")
            .select("centroid_id",
                    F.coalesce(F.col("cv"),
                               F.col("__old").cast("array<double>"))
                    .alias("cv"))
            .localCheckpoint(eager=True))
    return centroids


def ivf_probe_expr(vec_col: str, cents, n_probe: int) -> str:
    """Query → its n_probe closest centroids as a pure projection over
    the inlined centroid set: sort struct(-d, centroid_id) ascending =
    d DESC with centroid_id ASC tie-break (the oracle's row_number
    order), take n_probe.  No crossJoin (a 16-row cross product still
    compiles to BroadcastNestedLoop — banned by the plan tests) and no
    per-query window round-trip; measured perf-equivalent to the join
    probe at fixture scale with strictly fewer stages.  Shared by
    :func:`ivf_topk` and the quantized variant (operators/quantize.py)."""
    return ("transform(slice(array_sort(array(" + ", ".join(
        f"struct(-({_lit_dot_sql(vec_col, cv)}) AS nd, "
        f"{D.q(cid)} AS centroid_id)" for cid, cv in cents)
        + f")), 1, {n_probe}), s -> s.centroid_id)")


def ivf_probe_col(vec_col: str, cents, n_probe: int):
    """:func:`ivf_probe_expr` as a DSL Column — the single probe entry
    point shared by :func:`ivf_topk`, the quantized variants
    (operators/quantize.py) and the recall audit.

    r12 A/B note: the r11 rewrite carried the centroid set in two
    ``F.lit`` literal NODES with ``zip_with``/``aggregate`` lambda dots
    (the :func:`~.quantize.pq_lut_col` plan-size lever).  A one-session
    interleaved min-of-5 A/B at sf0.1 showed that form loses 1.3-1.7×
    (ivf_topk 2.57 s lambda vs 1.54 s inlined; ann_scale_ivf 1.66 vs
    1.27): higher-order-function lambda bodies evaluate INTERPRETED
    (same finding as functions/lid.py's staged-script notes), and the
    probe's sort comparator re-evaluates them, so even a
    handful-of-query-rows projection pays.  A 16-centroid × dim inlined
    expression is small enough for codegen (~16·dim literals, far under
    the 64 KB method limit at dim≤64), so the probe stays inlined; the
    literal-node lever remains only where it pays — the ~25 KB PQ LUT,
    which is built ONCE per query as a column and only indexed, never
    re-folded, inside the comparator."""
    return F.expr(ivf_probe_expr(vec_col, cents, n_probe))


def ivf_topk(vectors: DataFrame, queries: DataFrame, k: int = 5,
             n_centroids: int = 16, n_probe: int = 2,
             id_col: str = "vec_id", vec_col: str = "embedding",
             centroids: "DataFrame | list | None" = None) -> DataFrame:
    """IVF search: score only vectors in the query's `n_probe` nearest
    centroid cells.  The inverted-file analogue of :func:`lsh_topk` — a
    corpus partitioned/clustered by `centroid_id` turns each query into a
    few-partition scan instead of a full pass.

    The centroid set (bounded by contract) is driver-inlined: corpus
    assignment and query probing are both pure projections — the only
    shuffles left are the per-query ranking window and the final order.
    Pass `centroids` as a pre-collected [(id, coeffs)] list to amortize
    the index build across queries."""
    if centroids is None:
        centroids = default_centroids(vectors, n_centroids, id_col, vec_col)
    cents = _collect_centroids(centroids)
    if not cents:
        id_type = vectors.schema[id_col].dataType
        return (queries.select(
            F.col(id_col).alias("query_id"),
            F.lit(None).cast(id_type).alias("neighbor_id"),
            F.lit(None).cast("double").alias("cosine"),
            F.lit(None).cast("int").alias("rank")).filter(F.lit(False)))
    # one collect feeds both the corpus assignment and the query probes; a
    # corpus already carrying centroid_id (read back from build_ann_index
    # storage) skips re-assignment — cell membership is the storage layout
    if "centroid_id" in vectors.columns:
        # same guard idea as lsh_topk: cell ids from an index built with a
        # DIFFERENT centroid set would probe nothing; fail loudly instead
        corpus = vectors.filter(F.coalesce(
            F.assert_true(
                F.col("centroid_id").isin([cid for cid, _ in cents]),
                F.lit("indexed corpus centroid_id not in the provided "
                      "centroid set (index built with different "
                      "centroids?)")),
            F.lit(True)))
    else:
        corpus = fan_out(vectors).withColumn(
            "centroid_id", F.expr(_assign_expr(vec_col, cents)))
    qc = (queries
          .withColumn("centroid_id",
                      F.explode(ivf_probe_col(vec_col, cents, n_probe)))
          .select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
                  F.expr(norm_sql(D.SPARK, vec_col)).alias("qn"),
                  "centroid_id"))
    nn = (F.col("norm") if "norm" in corpus.columns
          else F.expr(norm_sql(D.SPARK, vec_col)))
    v = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("nv"),
                      nn.alias("nn"),
                      "centroid_id")
    scored = (
        F.broadcast(qc).join(v, "centroid_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        # no dedup needed: each neighbor is in exactly ONE cell and the
        # n_probe cells per query are distinct, so pairs are unique
        # per-side norms hoisted out of the per-pair fold (see brute_force_topk)
        .withColumn("cosine", F.expr(
            f"round({dot_sql(D.SPARK, 'qv', 'nv')} / (qn * nn), 6)"))
    )
    rk = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(rk))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "cosine", "rank")
            .orderBy("query_id", "rank"))


def build_ann_index(vectors: DataFrame, path: str, bits: int = 8,
                    seed: str = "rp", n_centroids: int = 16,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    dim: int | None = None,
                    partition_by_bucket: bool = False,
                    refine_iterations: int = 0,
                    refine_deterministic: bool = False,
                    quantize: bool = False,
                    pq: bool = False, pq_m: int = 8,
                    pq_ks: int = 16,
                    target_recall: "float | None" = None,
                    tune_k: int = 5) -> "list":
    """Materialize the ANN index AS A STORAGE LAYOUT: the corpus written to
    parquet with its RP-LSH `bucket`, IVF `centroid_id` and `norm` columns
    precomputed, plus a `centroids` sidecar table — built ONCE at ingest,
    amortized across every subsequent query (the index is corpus metadata,
    not per-query work; a per-query rebuild scans the whole corpus and
    erases the index's entire advantage).

    `partition_by_bucket=True` adds a physical `PARTITIONED BY
    (bucket_part)` layout so bucket probes become partition pruning — the
    100 TB setting; off by default because at small scale 2^bits
    directories of tiny files cost more than they save.  The partition
    column is `bucket_part = 'b' || bucket`, NOT the bucket itself:
    Spark's partition-column type inference would parse an all-digit
    bucket string like '001100' back as the integer 1100, silently
    corrupting both type and value — the prefix keeps it a string and the
    real `bucket` column stays in the data files.  A one-row `meta`
    parquet records (bits, seed, n_centroids, dim, refine_iterations) so
    readers can check they query with the parameters the index was built
    with.  Returns the collected centroid list for :func:`ivf_topk` reuse.

    `refine_iterations > 0` runs Lloyd refinement (:func:`refine_centroids`)
    over the hash-sampled defaults at BUILD time — this is where offline
    centroid refinement belongs at 100 TB: paid once when the layout is
    written, amortized over every query.  The refined set is what gets
    assigned against, stored in the sidecar, and returned.

    `target_recall` (r11) runs :func:`pick_ivf_n_probe` over the
    just-written layout at build time and records the smallest probe
    count meeting it as `n_probe` in the meta sidecar — readers pick the
    tuned default off storage instead of hand-setting the quality knob.

    `quantize=True` additionally stores the int8 SQ8 columns (`q` codes +
    `qscale`, operators/quantize.py) so quantized query paths
    (ivf_topk_quantized / quantized_brute_topk) read 1-byte codes off the
    layout instead of requantizing the fp column per query — the
    bandwidth half of the IVF-SQ8 deployment point.

    `pq=True` (r10) stores the deeper compression tier: PQ codes
    (`pq_codes`, m codes per vector) in the corpus plus a `pq_books`
    sidecar holding the trained codebooks — exactly the FAISS IVF-PQ
    deployment shape, where codebooks are corpus metadata like the
    centroid set.  :func:`~.quantize.ivf_topk_pq` then runs
    codes-off-storage; requires `dim`.  Codebooks are the md5-sample of
    :func:`~.quantize.pq_codebooks` (swap in Lloyd-refined books by
    rebuilding with different pq params — the refinement is offline
    build-time work, :func:`~.quantize.pq_refine_books`)."""
    import os

    spark = vectors.sparkSession
    if pq and dim is None:
        raise ValueError("build_ann_index(pq=True) requires dim "
                         "(PQ subspace slicing needs the vector width)")
    cents = _collect_centroids(
        default_centroids(vectors, n_centroids, id_col, vec_col))
    if refine_iterations and cents:
        refined = refine_centroids(
            vectors,
            spark.createDataFrame(cents, "centroid_id string, cv array<double>"),
            iterations=refine_iterations, id_col=id_col, vec_col=vec_col,
            deterministic=refine_deterministic)
        cents = _collect_centroids(refined)
    indexed = (rp_lsh_buckets(vectors, bits, seed, vec_col, dim)
               .withColumn("norm", F.expr(norm_sql(D.SPARK, vec_col))))
    if cents:
        indexed = indexed.withColumn(
            "centroid_id", F.expr(_assign_expr(vec_col, cents)))
    else:
        indexed = indexed.withColumn(
            "centroid_id", F.lit(None).cast("string"))
    if quantize:
        from .quantize import qscale_sql, quantize_sql

        indexed = (indexed
                   .withColumn("qscale", F.expr(qscale_sql(D.SPARK, vec_col)))
                   .withColumn("q", F.expr(
                       quantize_sql(D.SPARK, vec_col, "qscale"))))
    books = None
    if pq:
        from .quantize import pq_codebooks

        books = pq_codebooks(vectors, m=pq_m, ks=pq_ks, id_col=id_col,
                             vec_col=vec_col, dim=dim)
        indexed = indexed.withColumn(
            "pq_codes", F.expr(_pq_codes_storage_expr(vec_col, books)))
    writer_df = indexed
    writer = writer_df.write.mode("overwrite")
    if partition_by_bucket:
        writer_df = indexed.withColumn(
            "bucket_part", F.concat(F.lit("b"), F.col("bucket")))
        writer = writer_df.write.mode("overwrite").partitionBy("bucket_part")
    writer.parquet(os.path.join(path, "corpus"))
    (spark.createDataFrame(cents, "centroid_id string, cv array<double>")
     .coalesce(1).write.mode("overwrite")
     .parquet(os.path.join(path, "centroids")))
    if books is not None:
        (spark.createDataFrame(
            [(s, c, [float(x) for x in cv])
             for s, book in enumerate(books)
             for c, cv in enumerate(book)],
            "sub int, code int, cv array<double>")
         .coalesce(1).write.mode("overwrite")
         .parquet(os.path.join(path, "pq_books")))
    # build-time mean assignment cosine — the reference point for the
    # centroid-drift metric (:func:`ann_index_drift`): append batches are
    # assigned against the FROZEN build centroids forever, so a drifted
    # corpus degrades IVF recall silently unless this is watched.  One
    # extra scan of the just-written corpus at build time, never touched
    # again on the query path.
    mean_cos = None
    if cents:
        mean_cos = (spark.read.parquet(os.path.join(path, "corpus"))
                    .agg(F.avg(F.expr(_assign_cos_expr(vec_col, cents)))
                         .alias("m")).collect()[0]["m"])
        mean_cos = None if mean_cos is None else float(mean_cos)
    # probe-count autotune (r11): measure the recall curve on a bounded
    # sample of the just-written layout (centroid assignments come off
    # storage, no re-assign) and record the smallest n_probe meeting the
    # target in the meta sidecar — build-time work, like refinement; the
    # quality knob ivf_recall_audit made measurable now has a regulator.
    n_probe = None
    if target_recall is not None and cents:
        layout = spark.read.parquet(os.path.join(path, "corpus"))
        n_probe, _ = pick_ivf_n_probe(
            layout, layout, centroids=cents, k=tune_k,
            target_recall=target_recall, id_col=id_col, vec_col=vec_col)
    (spark.createDataFrame(
        [(bits, seed, n_centroids, dim, refine_iterations, mean_cos,
          quantize, pq_m if pq else None, pq_ks if pq else None,
          n_probe)],
        "bits int, seed string, n_centroids int, dim int, "
        "refine_iterations int, mean_assign_cos double, quantized boolean, "
        "pq_m int, pq_ks int, n_probe int")
     .coalesce(1).write.mode("overwrite")
     .parquet(os.path.join(path, "meta")))
    # write-through: a rebuild at the same path in one process must not
    # leave load_ann_index_meta serving the PREVIOUS build's (bits, seed) —
    # the plan-time guard in lsh_topk would then reject valid queries or,
    # worse, admit a same-width/different-seed query against stale metadata.
    _META_CACHE[path] = {"bits": bits, "seed": seed,
                         "n_centroids": n_centroids, "dim": dim,
                         "refine_iterations": refine_iterations,
                         "mean_assign_cos": mean_cos,
                         "quantized": quantize,
                         "pq_m": pq_m if pq else None,
                         "pq_ks": pq_ks if pq else None,
                         "n_probe": n_probe}
    return cents


def _pq_codes_storage_expr(vec_col: str, books) -> str:
    """The pq_codes STORAGE projection: encode, then narrow the element
    type to TINYINT when the code range allows (ks ≤ 128 — the default
    and the FAISS-typical 8-bit regime), so the persisted layout holds
    true 1-byte codes like the SQ8 `q` column."""
    from .quantize import pq_encode_expr

    enc = pq_encode_expr(vec_col, books)
    if len(books[0]) <= 128:
        return f"transform({enc}, x -> CAST(x AS TINYINT))"
    return enc


def sidecar_n_probe(spark, path: str, default: int) -> int:
    """The probe count an index-over consumer should use: the n_probe the
    build-time autotune recorded in the meta sidecar when
    ``build_ann_index(target_recall=...)`` was set, else `default`.

    This closes the r11 half-open loop (VERDICT item 3): the regulator
    existed — ``pick_ivf_n_probe`` ran at build and wrote the sidecar —
    but every consumer still hand-set its probe count.  Consumers that
    read a layout should call this instead of carrying a constant, so a
    rebuilt index with a different recall/price trade-off changes the
    query path without touching consumer code (the tuned value is part
    of the layout, exactly like bits/seed/dim)."""
    n_probe = load_ann_index_meta(spark, path).get("n_probe")
    return int(n_probe) if n_probe is not None else default


def load_pq_books(spark, path: str) -> "list[list[list[float]]]":
    """The PQ codebooks recorded by :func:`build_ann_index(pq=True)` —
    books[sub][code] = subvector, the shape every operators/quantize.py
    consumer takes.  Codebook size is meta-bounded (pq_m × pq_ks rows),
    so the collect is sidecar-sized like the centroid list."""
    import os

    rows = spark.read.parquet(os.path.join(path, "pq_books")).collect()
    if not rows:
        raise ValueError(f"empty pq_books sidecar at {path}")
    by: dict = {}
    for r in rows:
        by[(r["sub"], r["code"])] = [float(x) for x in r["cv"]]
    m = 1 + max(s for s, _ in by)
    ks = 1 + max(c for _, c in by)
    return [[by[(s, c)] for c in range(ks)] for s in range(m)]


def _assign_cos_expr(vec_col: str, cents) -> str:
    """Cosine between a row's vector and its ASSIGNED centroid (the
    stored `centroid_id`), as one CASE expression over the inlined
    centroid set — centroid norms are driver-precomputed literals, the
    row norm reuses the stored `norm` column."""
    import math

    branches = " ".join(
        f"WHEN centroid_id = {D.q(cid)} THEN "
        f"({_lit_dot_sql(vec_col, cv)}) / "
        f"(norm * {math.sqrt(sum(x * x for x in cv))!r}D)"
        for cid, cv in cents
        if any(x != 0 for x in cv))
    if not branches:
        return "CAST(NULL AS DOUBLE)"
    # zero-norm rows (and zero centroids) yield NULL, which avg() skips —
    # a cosine against nothing is undefined, not 0
    return f"CASE WHEN norm > 0 THEN (CASE {branches} END) END"


def load_ann_index(spark, path: str,
                   with_centroids: bool = True) -> "tuple[DataFrame, list]":
    """(indexed corpus, collected centroid list) written by
    :func:`build_ann_index`.  The corpus DataFrame carries `bucket`,
    `centroid_id` and `norm`, which :func:`lsh_topk` / :func:`ivf_topk`
    detect and reuse instead of recomputing.

    The meta sidecar (bits, seed, dim) is read here and stamped onto the
    `bucket` column as COLUMN METADATA, so :func:`lsh_topk` can reject a
    query whose (bits, seed) differ from what the index was built with —
    same-width/different-seed previously passed the runtime width guard
    and silently returned wrong neighbors.  The metadata rides the schema
    through select/filter, costing nothing at run time.

    `with_centroids=False` skips the sidecar collect (a small Spark job)
    and returns an empty list — for LSH-only consumers or callers that
    cache the centroid list across queries."""
    import os

    corpus = spark.read.parquet(os.path.join(path, "corpus"))
    meta = load_ann_index_meta(spark, path)
    if "bucket" in corpus.columns:
        corpus = corpus.withColumn("bucket", F.col("bucket").alias(
            "bucket", metadata={"rs_ann_bits": meta["bits"],
                                "rs_ann_seed": meta["seed"],
                                "rs_ann_dim": meta["dim"]}))
    cents = _collect_centroids(spark.read.parquet(
        os.path.join(path, "centroids"))) if with_centroids else []
    return corpus, cents


# meta changes only when build_ann_index rewrites the directory, and that
# function writes the cache entry through (see its tail) — caching keeps
# the per-query warm path free of an extra 1-row Spark job while a
# same-process rebuild still refreshes the entry
_META_CACHE: dict[str, dict] = {}


def load_ann_index_meta(spark, path: str, use_cache: bool = True) -> dict:
    """The (bits, seed, n_centroids, dim) row recorded at build time.
    Always reads storage when `use_cache=False` (or on first sight of
    `path`) and refreshes the in-process cache either way."""
    import os

    if use_cache and path in _META_CACHE:
        return _META_CACHE[path]
    try:
        meta = spark.read.parquet(os.path.join(path, "meta")).collect()[0] \
            .asDict()
    except Exception as exc:
        # plan-time contract error, not a raw path traceback (the CLI
        # convention maps ValueError -> `error: ...`, exit 2)
        raise ValueError(
            f"no ANN index at {path} (missing/unreadable meta sidecar — "
            f"build one with `corpus eindex` / build_ann_index): "
            f"{type(exc).__name__}") from exc
    _META_CACHE[path] = meta
    return meta


def embedding_near_dup_pairs(vectors: DataFrame, threshold: float = 0.4,
                             id_col: str = "vec_id",
                             vec_col: str = "embedding") -> DataFrame:
    """All pairs with cosine ≥ threshold — EXACT and QUADRATIC.

    Ground-truth/verification path only; the scale path is
    :func:`embedding_near_dup_pairs_bucketed` (bounded bucket joins)."""
    a = fan_out(vectors).select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"),
                                F.expr(norm_sql(D.SPARK, vec_col)).alias("na"))
    b = vectors.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"),
                       F.expr(norm_sql(D.SPARK, vec_col)).alias("nb"))
    return (a.crossJoin(b)
            .filter(F.col("id_a") < F.col("id_b"))
            .withColumn("cosine", F.expr(
                f"round({dot_sql(D.SPARK, 'va', 'vb')} / (na * nb), 6)"))
            .filter(F.col("cosine") >= threshold)
            .select("id_a", "id_b", "cosine")
            .orderBy("id_a", "id_b"))


def rp_multi_table_buckets(vectors: DataFrame, bits: int = 4, tables: int = 8,
                           seed: str = "rp", id_col: str = "vec_id",
                           vec_col: str = "embedding",
                           dim: int | None = None) -> DataFrame:
    """(id, vec, tbl, bucket): each vector hashed into `tables` independent
    RP-LSH tables of `bits` hyperplanes each (seeds `{seed}t0..`).  All
    tables come from ONE pass (explode over an inline array), so the corpus
    is scanned once."""
    entries = [
        F.struct(F.lit(t).alias("tbl"),
                 F.expr(rp_bucket_sql(D.SPARK, vec_col, bits, f"{seed}t{t}", dim))
                 .alias("bucket"))
        for t in range(tables)
    ]
    return (fan_out(vectors)
            .select(F.col(id_col), F.col(vec_col),
                    F.explode(F.array(*entries)).alias("e"))
            .select(F.col(id_col), F.col(vec_col),
                    F.col("e.tbl").alias("tbl"), F.col("e.bucket").alias("bucket")))


def embedding_near_dup_pairs_bucketed(vectors: DataFrame,
                                      threshold: float = 0.4,
                                      bits: int = 4, tables: int = 8,
                                      seed: str = "rp",
                                      id_col: str = "vec_id",
                                      vec_col: str = "embedding",
                                      dim: int | None = None) -> DataFrame:
    """Near-dup pairs via multi-table RP-LSH bucketing — the SCALE path.

    Candidates are pairs sharing a bucket in ANY of the `tables` hash
    tables; exact cosine then filters within candidates.  Join fan-out is
    bounded by bucket sizes (N/2^bits per table on balanced data), never the
    full cross product.  Recall is probabilistic: a pair at angle θ shares
    one table's bucket with p = (1-θ/π)^bits; tables multiply the chance
    (1-(1-p)^tables — e.g. cosine 0.9, bits=4, tables=8 → ~0.998).  The
    exact quadratic :func:`embedding_near_dup_pairs` is the ground-truth
    verification path for recall tests.
    """
    # eagerly materialize: both self-join sides reference bk, and the bucket
    # expressions (bits × tables RP projections per vector) are the expensive
    # part.  Unpersisted, the subtree evaluates twice; LAZILY persisted it is
    # far worse — both join-side stages race to fill the same cache blocks
    # (measured 138 s vs 8 s at sf0.1).  localCheckpoint computes it exactly
    # once, before the join stages launch.
    bk = (rp_multi_table_buckets(vectors, bits, tables, seed, id_col, vec_col,
                                 dim)
          .withColumn("nrm", F.expr(norm_sql(D.SPARK, vec_col)))
          .localCheckpoint(eager=True))
    a = bk.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"),
                  F.col("nrm").alias("na"), "tbl", "bucket")
    b = bk.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"),
                  F.col("nrm").alias("nb"), "tbl", "bucket")
    # score BEFORE the cross-table dedup (r14): cosine is a deterministic
    # function of the pair, so every duplicate candidate (same pair found
    # by several tables) carries the identical value and dropDuplicates
    # afterwards keeps the same rows.  Scoring first means the dedup
    # exchange moves (id_a, id_b, cosine) — three scalars — instead of
    # two full embedding payloads per candidate: 237 MB → ~2 MB shuffled
    # at sf0.1 (the pair stage was the whole query).  A pair found by k
    # tables folds the dot product k times — map-side compute, measured
    # cheaper than shuffling payload bytes at every benched shape (the
    # guide's decide-with-small-rows rule).  The threshold filter also
    # drops below the exchange for free: equal-cosine duplicates pass or
    # fail together.  Norms ride along from the checkpointed frame: one
    # fold per (vector, table) row at build time, not two per candidate.
    return (a.join(b, on=["tbl", "bucket"])
            .filter(F.col("id_a") < F.col("id_b"))
            .withColumn("cosine", F.expr(
                f"round({dot_sql(D.SPARK, 'va', 'vb')} / (na * nb), 6)"))
            .filter(F.col("cosine") >= threshold)
            .select("id_a", "id_b", "cosine")
            .dropDuplicates(["id_a", "id_b"])
            .orderBy("id_a", "id_b"))


def hash_embedding_from_md5_sql(d: str, h: str, dim: int = 16) -> str:
    """Deterministic pseudo-embedding from a precomputed md5-hex column:
    hex pair k → ((value in [0,255]) − 127.5) / 127.5 ∈ [−1, 1].

    NOT a semantic embedder — the cross-engine TEST-VECTOR generator for
    pipelines whose real embedder is an external model (the multimodal
    deterministic-fake pattern applied to text): the Spark plumbing —
    schema, chunk addressing, bucketing, top-k — is real and
    oracle-checked, only the vector values are a stand-in.  Pass the md5
    as a materialized COLUMN (`h`), not an inline call, or it would be
    re-evaluated once per dimension.  Never zero-norm: each component is
    an odd multiple of 1/255, so the [-1,1] grid excludes exact 0."""
    if not 1 <= dim <= 16:
        raise ValueError(f"dim must be in [1, 16] (one md5 = 32 hex chars), "
                         f"got {dim}")
    comps = []
    for k2 in range(dim):
        p1, p2 = 2 * k2 + 1, 2 * k2 + 2
        if d == D.SPARK:
            val = f"CAST(conv(substr({h}, {p1}, 2), 16, 10) AS DOUBLE)"
        else:
            val = (f"((instr('0123456789abcdef', substr({h}, {p1}, 1)) - 1) "
                   f"* 16.0 + "
                   f"(instr('0123456789abcdef', substr({h}, {p2}, 1)) - 1))")
        comps.append(f"(({val}) - 127.5) / 127.5")
    if d == D.SPARK:
        return "array(" + ", ".join(comps) + ")"
    return "[" + ", ".join(comps) + "]"


# ---------------------------------------------------------------------------
# semantic incremental admit against the materialized ANN index (round 8)
# ---------------------------------------------------------------------------

def probe_bucket_exprs(d: str, bucket: str, bits: int,
                       multi_probe: int = 1) -> "list[str]":
    """The probe set for one bucket expression: itself plus (when
    `multi_probe`) every bucket at Hamming distance 1 — bits+1 equi-join
    keys instead of a distance predicate, so the candidate join stays a
    hash join in BOTH engines (and partition-prunes when the corpus is
    laid out by bucket).  Identical text in Spark SQL and DuckDB —
    substr/CASE/|| only."""
    probes = [bucket]
    if multi_probe:
        for j in range(bits):
            flip = (f"(CASE WHEN substr({bucket}, {j + 1}, 1) = '1' "
                    f"THEN '0' ELSE '1' END)")
            probes.append(
                f"substr({bucket}, 1, {j}) || {flip} || "
                f"substr({bucket}, {j + 2}, {bits - j - 1})")
    return probes


def rp_collision_prob(cosine: float) -> float:
    """P(one random hyperplane leaves a pair at this cosine on the same
    side) = 1 - θ/π (Goemans-Williamson / Charikar's SimHash bound) — the
    hyperplane analogue of the MinHash property P(h_a = h_b) = J."""
    import math

    return 1.0 - math.acos(max(-1.0, min(1.0, cosine))) / math.pi


def rp_flag_prob(cosine: float, bits: int, multi_probe: int = 0) -> float:
    """P(a pair at this cosine becomes a candidate) under `bits` planes
    with Hamming <= `multi_probe` probing: Σ_{j<=m} C(b,j) p^(b-j)(1-p)^j
    where p = :func:`rp_collision_prob` (independent-plane model — the
    same approximation the MinHash S-curve makes)."""
    import math

    p = rp_collision_prob(cosine)
    return sum(math.comb(bits, j) * p ** (bits - j) * (1.0 - p) ** j
               for j in range(multi_probe + 1))


def pick_rp_params(target_cosine: float, target_recall: float = 0.8,
                   reject_cosine: float = 0.0, max_bits: int = 16,
                   max_probe: int = 1) -> "tuple[int, int]":
    """(bits, multi_probe) for the hyperplane-LSH family — the embedding
    sibling of dedup.pick_lsh_params, closing the r8 gap where the
    MinHash side had an S-curve picker but (bits, multi_probe) were
    hand-set.

    Among configurations whose :func:`rp_flag_prob` reaches
    `target_recall` at `target_cosine`, picks the one MINIMIZING the
    candidate rate for dissimilar pairs at `reject_cosine` — the cost
    that scales with the corpus (every candidate pays an exact-cosine
    verify; for a random far pair the flag probability IS the expected
    fraction of a balanced corpus each probe touches).  Ties prefer
    fewer probes (each probe key multiplies the batch explode), then
    fewer bits (shorter bucket ids, fewer partitions).  `max_probe`
    defaults to 1 because :func:`probe_bucket_exprs` implements Hamming
    <= 1 probing; raise it only alongside that operator.  Raises when no
    configuration reaches the recall target — loud, not a silent recall
    shortfall."""
    best = None
    for bits in range(1, max_bits + 1):
        for m in range(0, min(max_probe, bits) + 1):
            if rp_flag_prob(target_cosine, bits, m) < target_recall:
                continue
            key = (rp_flag_prob(reject_cosine, bits, m), m, bits)
            if best is None or key < best[0]:
                best = (key, (bits, m))
    if best is None:
        raise ValueError(
            f"no (bits <= {max_bits}, multi_probe <= {max_probe}) reaches "
            f"recall >= {target_recall} at cosine {target_cosine}")
    return best[1]


def pick_ivf_n_probe(vectors: DataFrame, queries: DataFrame,
                     centroids=None, k: int = 5,
                     target_recall: float = 0.8, n_centroids: int = 16,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     max_queries: int = 64
                     ) -> "tuple[int, dict[int, float]]":
    """Smallest ``n_probe`` whose measured recall@k reaches
    ``target_recall`` on a held-out query sample, plus the whole recall
    curve ``{n_probe: recall}`` — the IVF member of the param-picker
    family (dedup.pick_lsh_params / :func:`pick_rp_params`), closing the
    r10 gap where :func:`~..workload.similarity_queries.ivf_recall_audit`
    measured the probe path's recall (0.37 at 2/16 on the isotropic
    fixture) and nothing consumed the gauge.

    Unlike the LSH pickers there is no closed form — IVF recall depends
    on how the data clusters — so this is the empirical tune FAISS-style
    deployments run at index-build time, in ONE pass: with exact
    scoring inside probed cells, a true top-k neighbor is retrieved iff
    its cell is probed (its exact cosine beats every non-top-k
    candidate), so recall(p) = fraction of exact-top-k neighbors whose
    cell sits within the query's first p probe ranks.  One bounded
    brute-force pass over a ≤``max_queries`` md5-deterministic query
    sample yields EVERY point of the curve — no per-candidate-p rerun.

    Cost shape at 100 TB: the brute pass over the sample is index-BUILD
    work (amortized like centroid refinement), never per-query; every
    collect is ≤ max_queries·k rows.  Always terminates: probing all
    cells is recall 1.0 by construction, so the returned n_probe is at
    most n_cells."""
    import bisect

    cents = _collect_centroids(
        centroids if centroids is not None
        else default_centroids(vectors, n_centroids, id_col, vec_col))
    q = (queries.orderBy(F.md5(F.col(id_col).cast("string")),
                         F.col(id_col))
         .limit(max_queries))
    brute = brute_force_topk(vectors, q, k=k, id_col=id_col,
                             vec_col=vec_col)
    cells = (vectors if "centroid_id" in vectors.columns
             else fan_out(vectors).withColumn(
                 "centroid_id", F.expr(_assign_expr(vec_col, cents))))
    order = q.select(F.col(id_col).alias("query_id"),
                     ivf_probe_col(vec_col, cents,
                                   len(cents)).alias("__cells"))
    ranks = (brute.select("query_id", "neighbor_id")
             .join(cells.select(F.col(id_col).alias("neighbor_id"),
                                "centroid_id"), "neighbor_id")
             .join(order, "query_id")
             .select(F.expr("CAST(array_position(__cells, centroid_id) "
                            "AS INT)").alias("pr")))
    prs = sorted(r["pr"] for r in ranks.collect())
    curve: "dict[int, float]" = {}
    best = None
    for p in range(1, len(cents) + 1):
        r = (bisect.bisect_right(prs, p) / len(prs)) if prs else 1.0
        curve[p] = round(r, 6)
        if best is None and r >= target_recall:
            best = p
    return (best if best is not None else len(cents)), curve


def plan_size_bytes(df: DataFrame) -> int:
    """Catalyst's sizeInBytes estimate for a frame's optimized plan —
    COUNT-FREE (no job runs): parquet sources report file-size statistics,
    projections/filters scale them.  A coarse estimate (explodes multiply
    by worst-case row width, filters by a fixed selectivity), which is
    exactly what a broadcast guard needs: the question is "could this be
    hundreds of gigabytes", not "is this 12.3 or 14.1 MB".  Sources with
    no statistics (an ExistingRDD from createDataFrame) report the
    Long.MaxValue sentinel — guards built on this therefore treat UNKNOWN
    as too-big and skip the hint, the conservative direction (a lost
    broadcast costs one shuffle; a wrong one OOMs the driver)."""
    return int(str(df._jdf.queryExecution().optimizedPlan()
                   .stats().sizeInBytes()))


def embedding_index_flagged_pairs(new_vecs: DataFrame, path: str,
                                  threshold: float = 0.9,
                                  id_col: str = "vec_id",
                                  vec_col: str = "embedding",
                                  multi_probe: int = 1,
                                  broadcast_batch_limit: int =
                                  256 * 1024 * 1024) -> DataFrame:
    """(id_new, id_corpus, cosine) for batch vectors semantically
    near-duplicate (cosine ≥ threshold) to an INDEXED corpus vector —
    the embedding sibling of dedup's minhash_index_flagged_pairs,
    completing incremental ingest across all three dedup modalities
    (exact fingerprint / lexical MinHash / semantic embedding).

    Corpus-side cost is the stored build_ann_index layout only: bucket
    and norm are read back from parquet, nothing is re-hashed, and with
    `partition_by_bucket=True` the probe join prunes to (1 + bits)/2^bits
    of the corpus.  Only the batch computes buckets, exploded into its
    multi-probe set (bits+1 distinct keys at `multi_probe=1`); the
    exploded probe frame gets an explicit broadcast hint only while its
    plan-stats size estimate stays under `broadcast_batch_limit` bytes
    (the lm.py broadcast_vocab_limit pattern, made count-free via
    :func:`plan_size_bytes`) — a corpus-scale admit batch (a 1 TB crawl
    snapshot) degrades to a planner-chosen shuffled bucket equi-join
    instead of a forced-broadcast OOM.  Verification is exact cosine off
    the stored norm.

    Recall is the LSH approximation and is stated, not hidden: an exact
    embedding copy always flags (identical bucket, Hamming 0); for
    near-but-not-identical pairs the flag probability is
    :func:`rp_flag_prob` (e.g. ~0.85 at cosine 0.9 with the
    picker-chosen 5 bits + 1-flip probing) — choose (bits, multi_probe)
    with :func:`pick_rp_params` against a target recall at a target
    cosine.  The candidate rule (shared original-or-flipped bucket ⇔
    Hamming ≤ 1) is deterministic, so the SQL oracle reproduces the
    flagged set bit-exactly."""
    spark = new_vecs.sparkSession
    meta = load_ann_index_meta(spark, path)
    bits, seed, dim = meta["bits"], meta["seed"], meta["dim"]
    corpus, _ = load_ann_index(spark, path, with_centroids=False)
    qb = rp_lsh_buckets(new_vecs, bits, seed, vec_col, dim)
    probes = [F.expr(p) for p in
              probe_bucket_exprs(D.SPARK, "bucket", bits, multi_probe)]
    q = (qb.withColumn("bucket", F.explode(F.array(*probes)))
         .select(F.col(id_col).alias("id_new"),
                 F.col(vec_col).alias("qv"),
                 F.expr(norm_sql(D.SPARK, vec_col)).alias("qn"), "bucket"))
    v = corpus.select(F.col(id_col).alias("id_corpus"),
                      F.col(vec_col).alias("nv"),
                      F.col("norm").alias("nn"), "bucket")
    # no dedup shuffle: the probe set is all-distinct buckets and a corpus
    # vector lives in exactly one, so each (new, corpus) pair joins once
    probe = (F.broadcast(q)
             if plan_size_bytes(q) <= broadcast_batch_limit else q)
    return (probe.join(v, "bucket")
            .withColumn("cosine", F.expr(
                f"round({dot_sql(D.SPARK, 'qv', 'nv')} / (qn * nn), 6)"))
            .filter(F.col("cosine") >= threshold)
            .select("id_new", "id_corpus", "cosine")
            .orderBy("id_new", "id_corpus"))


def embedding_index_admit(new_vecs: DataFrame, path: str,
                          threshold: float = 0.9,
                          id_col: str = "vec_id",
                          vec_col: str = "embedding",
                          multi_probe: int = 1,
                          broadcast_batch_limit: int =
                          256 * 1024 * 1024) -> DataFrame:
    """Batch vectors that are NOT semantic near-dups of the indexed
    corpus (the admit step of embedding-level incremental ingest)."""
    flagged = (embedding_index_flagged_pairs(new_vecs, path, threshold,
                                             id_col, vec_col, multi_probe,
                                             broadcast_batch_limit)
               .select(F.col("id_new").alias(id_col)).distinct())
    return new_vecs.join(flagged, on=id_col, how="left_anti")


def append_ann_index(new_vecs: DataFrame, path: str,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding",
                     verify: bool = False) -> None:
    """Extend a materialized ANN index with an ADMITTED batch — the
    embedding sibling of dedup.append_minhash_index, closing the
    semantic ingest loop (embedding_index_admit → extend → next batch).

    The batch's bucket / norm / centroid assignment are computed with
    the parameters and centroid set recorded at build time (read from
    the sidecars, the same plan-time contract queries enforce), then
    parquet-APPENDED under corpus/ — existing files never rewritten.
    Centroids are NOT refit here: assignment against the frozen build
    set keeps every stored row's cell valid (watch
    :func:`ann_index_drift` for when that stops being a good idea);
    periodic re-build (with refine_iterations) is the compaction story,
    not per-batch work.  Caller contract: append only vectors that
    passed admission; `verify=True` adds the operator-misuse guard — a
    semi-join of batch ids against the stored corpus, raising before
    anything is written if any id is already indexed."""
    import os

    spark = new_vecs.sparkSession
    meta = load_ann_index_meta(spark, path)
    bits, seed, dim = meta["bits"], meta["seed"], meta["dim"]
    if verify:
        stored = spark.read.parquet(os.path.join(path, "corpus")) \
            .select(id_col)
        clash = (stored.join(new_vecs.select(id_col), on=id_col,
                             how="left_semi").limit(5).collect())
        if clash:
            raise ValueError(
                f"append_ann_index(verify=True): batch ids already "
                f"indexed at {path} (e.g. "
                f"{sorted(r[0] for r in clash)}) — re-appended batch or "
                f"unfiltered admit output?")
    cents = _collect_centroids(
        spark.read.parquet(os.path.join(path, "centroids")))
    indexed = (rp_lsh_buckets(new_vecs, bits, seed, vec_col, dim)
               .withColumn("norm", F.expr(norm_sql(D.SPARK, vec_col))))
    if cents:
        indexed = indexed.withColumn(
            "centroid_id", F.expr(_assign_expr(vec_col, cents)))
    else:
        indexed = indexed.withColumn(
            "centroid_id", F.lit(None).cast("string"))
    corpus_dir = os.path.join(path, "corpus")
    # honor a partitioned/quantized build: the corpus SCHEMA decides the
    # layout (robust even against a pre-quantize meta sidecar) — an
    # appended batch missing the code columns would silently fracture the
    # parquet schema and break every later codes-only scan
    existing = spark.read.parquet(corpus_dir)
    if "q" in existing.columns:
        from .quantize import qscale_sql, quantize_sql

        indexed = (indexed
                   .withColumn("qscale", F.expr(qscale_sql(D.SPARK, vec_col)))
                   .withColumn("q", F.expr(
                       quantize_sql(D.SPARK, vec_col, "qscale"))))
    if "pq_codes" in existing.columns:
        # encode against the FROZEN build codebooks (the sidecar), with
        # the same element-type rule as the build — a batch stored as
        # array<int> against an array<tinyint> corpus would fracture the
        # parquet schema for every later codes-only scan
        books = load_pq_books(spark, path)
        indexed = indexed.withColumn(
            "pq_codes", F.expr(_pq_codes_storage_expr(vec_col, books)))
    if "bucket_part" in existing.columns:
        (indexed.withColumn("bucket_part",
                            F.concat(F.lit("b"), F.col("bucket")))
         .write.mode("append").partitionBy("bucket_part")
         .parquet(corpus_dir))
    else:
        indexed.write.mode("append").parquet(corpus_dir)


# mean assignment cosine this far below the build-time mean ⇒ the frozen
# build centroids no longer describe the corpus: rebuild the index (with
# refine_iterations) instead of appending further.  0.05 is the documented
# maintenance default — at that gap a vector's "nearest" build centroid is
# routinely not its true nearest, so IVF n_probe recall decays.
DRIFT_REBUILD_THRESHOLD = 0.05


def ann_index_drift(spark, path: str) -> dict:
    """Centroid-drift visibility for the frozen-centroid append path:
    appended batches are assigned to BUILD-TIME centroids forever
    (append_ann_index), so a corpus whose distribution shifts degrades
    IVF recall silently.  Compares the corpus-wide mean assignment cosine
    NOW (one scan over the stored layout — embedding, centroid_id and
    norm are all in the index, nothing recomputed) against the build-time
    mean recorded in the meta sidecar.

    Returns {build_mean_assign_cos, current_mean_assign_cos, drift,
    rebuild_recommended} — drift = build − current (positive = corpus
    moved away from the centroids), rebuild recommended at
    :data:`DRIFT_REBUILD_THRESHOLD`.  Pre-r9 indexes (no recorded build
    mean) and centroid-less builds report all-None: unknown, not 0."""
    import os

    meta = load_ann_index_meta(spark, path)
    build_mean = meta.get("mean_assign_cos")
    cents = _collect_centroids(
        spark.read.parquet(os.path.join(path, "centroids")))
    if build_mean is None or not cents:
        return {"build_mean_assign_cos": None,
                "current_mean_assign_cos": None,
                "drift": None, "rebuild_recommended": None}
    vec_col = "embedding"
    cur = (spark.read.parquet(os.path.join(path, "corpus"))
           .agg(F.avg(F.expr(_assign_cos_expr(vec_col, cents)))
                .alias("m")).collect()[0]["m"])
    if cur is None:
        return {"build_mean_assign_cos": float(build_mean),
                "current_mean_assign_cos": None,
                "drift": None, "rebuild_recommended": None}
    drift = float(build_mean) - float(cur)
    return {"build_mean_assign_cos": round(float(build_mean), 6),
            "current_mean_assign_cos": round(float(cur), 6),
            "drift": round(drift, 6),
            "rebuild_recommended": drift > DRIFT_REBUILD_THRESHOLD}


def compact_ann_index(spark, path: str,
                      max_records_per_file: int = 2_000_000) -> dict:
    """Consolidate an append-grown ANN index's corpus/ layout (the
    dedup-index compaction story applied to the embedding side);
    preserves a bucket-partitioned build's partitioning column.
    Centroids/meta sidecars are single-file and untouched.  Compaction is
    the maintenance cadence, so this is also where centroid drift gets
    measured (:func:`ann_index_drift`) — the CLI surfaces the rebuild
    recommendation alongside the file counts."""
    import os

    from ..util import compact_parquet_dir, recover_directory

    corpus_dir = os.path.join(path, "corpus")
    recover_directory(spark, corpus_dir)  # crashed previous compaction
    part = ("bucket_part"
            if "bucket_part" in spark.read.parquet(corpus_dir).columns
            else None)
    return {"corpus": compact_parquet_dir(spark, corpus_dir,
                                          max_records_per_file,
                                          partition_by=part)}
