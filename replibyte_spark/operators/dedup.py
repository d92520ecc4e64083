"""Deduplication family — exact, MinHash-LSH, SimHash, n-gram Jaccard.

The reference's dedup is a per-statement spill-to-disk set keyed by
md5(db-table) with linear probing (/root/reference/subset/src/dedup.rs:9-63) —
exact dedup only, single-node.  This module generalizes it into the dedup
operators a 100 TB training-data pipeline needs (BASELINE.json north star):

- :func:`exact_dedup` — hash-groupBy; one shuffle, map-side partial agg.
- :func:`minhash_signatures` / :func:`minhash_near_dup_pairs` — shingle →
  minhash → banded LSH bucket join → verified Jaccard.  The shuffle is on
  band keys (small), candidate verification touches only bucket-collision
  pairs — never the full cross product.
- :func:`simhash_signatures` — frequency-weighted n-bit signature; near-dup
  blocking on signature prefix.
- :func:`ngram_jaccard_pairs` — exact pairwise Jaccard via shared-shingle
  join (quadratic in colliding docs; the LSH path is the scale path, this is
  the ground-truth/verification path).

Every hash is md5-derived through the shared dialect builder, so the DuckDB
oracle replicates signatures and candidate sets bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .. import dialect as D

# ---------------------------------------------------------------------------
# shared cross-dialect expression fragments
# ---------------------------------------------------------------------------


def word_ngrams_sql(d: str, text: str, n: int = 3) -> str:
    """List of word n-grams of `text` (whitespace-tokenized)."""
    toks = D.split_ws(d, text)
    joined = " || ' ' || ".join(
        (f"element_at(_t, i + {k})" if d == D.SPARK else f"_t[i + {k}]")
        for k in range(n)
    )
    if d == D.SPARK:
        return (f"transform(sequence(1, greatest(size({toks}) - {n - 1}, 0)), "
                f"i -> {joined.replace('_t', toks)})")
    return (f"list_transform(generate_series(1, greatest(len({toks}) - {n - 1}, 0)), "
            f"i -> {joined.replace('_t', toks)})")


def minhash_sql(d: str, gram: str, i: int) -> str:
    """The i-th hash of a shingle: md5 with a per-hash salt; the MIN of this
    hex string over a doc's shingles is its i-th minhash (string min is
    total-ordered identically in both engines for lowercase hex)."""
    return f"md5('h{i}:' || {gram})"


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(df: DataFrame, key_cols: list[str], order_col: str) -> DataFrame:
    """Keep one row per key: the one with the smallest `order_col`.

    Semantics of the reference's emitted-set check (dedup.rs:9-63) — first
    occurrence wins — expressed as a single hash aggregation (one shuffle,
    map-side combine) instead of a driver-side set.
    """
    return df.groupBy(*key_cols).agg(F.min(order_col).alias(order_col))


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """(id, gram) distinct shingle pairs."""
    grams = F.expr(word_ngrams_sql(D.SPARK, text_col, n))
    return (df.select(F.col(id_col), F.explode(grams).alias("gram")).distinct())


def minhash_signatures(df: DataFrame, id_col: str, text_col: str,
                       n_hashes: int = 12, n: int = 3) -> DataFrame:
    """id → h0..h{n_hashes-1} minhash signature columns.

    min() is idempotent over duplicates, so no distinct before aggregation —
    the explode feeds straight into a partial-agg groupBy (one shuffle).
    """
    grams = F.expr(word_ngrams_sql(D.SPARK, text_col, n))
    exploded = df.select(F.col(id_col), F.explode(grams).alias("gram"))
    aggs = [F.min(F.expr(minhash_sql(D.SPARK, "gram", i))).alias(f"h{i}")
            for i in range(n_hashes)]
    return exploded.groupBy(id_col).agg(*aggs)


def lsh_band_keys(sig: DataFrame, id_col: str, bands: int, rows: int) -> DataFrame:
    """(id, band, band_key) — one md5 key per band of `rows` signature rows."""
    parts = []
    for b in range(bands):
        cols = [f"h{b * rows + r}" for r in range(rows)]
        key = F.md5(F.concat_ws("|", *cols))
        parts.append(sig.select(F.col(id_col), F.lit(b).alias("band"),
                                key.alias("band_key")))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def minhash_candidate_pairs(df: DataFrame, id_col: str, text_col: str,
                            n_hashes: int = 12, bands: int = 4,
                            n: int = 3) -> DataFrame:
    """Distinct (id_a < id_b) pairs sharing at least one LSH band bucket."""
    rows = n_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, n_hashes, n)
    bk = lsh_band_keys(sig, id_col, bands, rows)
    a = bk.select(F.col(id_col).alias("id_a"), "band", "band_key")
    b = bk.select(F.col(id_col).alias("id_b"), "band", "band_key")
    return (a.join(b, on=["band", "band_key"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b").distinct())


def jaccard_for_pairs(pairs: DataFrame, sh: DataFrame, id_col: str) -> DataFrame:
    """True Jaccard for candidate pairs via the distinct shingle sets."""
    card = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("c"))
    xa = sh.select(F.col(id_col).alias("id_a"), "gram")
    xb = sh.select(F.col(id_col).alias("id_b"), "gram")
    inter = (pairs.join(xa, "id_a").join(xb, ["id_b", "gram"])
             .groupBy("id_a", "id_b").agg(F.count(F.lit(1)).alias("i")))
    ca = card.select(F.col(id_col).alias("id_a"), F.col("c").alias("ca"))
    cb = card.select(F.col(id_col).alias("id_b"), F.col("c").alias("cb"))
    return (inter.join(ca, "id_a").join(cb, "id_b")
            .withColumn("jaccard",
                        F.round(F.col("i") / (F.col("ca") + F.col("cb") - F.col("i")), 6))
            .select("id_a", "id_b", "jaccard"))


def minhash_near_dup_pairs(df: DataFrame, id_col: str, text_col: str,
                           threshold: float = 0.8, n_hashes: int = 12,
                           bands: int = 4, n: int = 3) -> DataFrame:
    """LSH candidates filtered by true Jaccard ≥ threshold."""
    pairs = minhash_candidate_pairs(df, id_col, text_col, n_hashes, bands, n)
    sh = shingles(df, id_col, text_col, n)
    return (jaccard_for_pairs(pairs, sh, id_col)
            .filter(F.col("jaccard") >= threshold)
            .orderBy("id_a", "id_b"))


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_bit_sql(d: str, tok: str, j: int) -> str:
    """±1 contribution of a token to signature bit j (md5 hex-digit parity)."""
    return (f"CASE WHEN substr(md5('s:' || {tok}), {j + 1}, 1) "
            f"IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END")


def simhash_signatures(df: DataFrame, id_col: str, text_col: str,
                       bits: int = 16) -> DataFrame:
    """Frequency-weighted SimHash: bit j = sign of Σ_tokens ±1.

    One explode + one groupBy with `bits` sum aggregates — a single shuffle
    with map-side partial sums, no UDF.
    """
    toks = F.expr(D.split_ws(D.SPARK, text_col))
    exploded = df.select(F.col(id_col), F.explode(toks).alias("tok"))
    aggs = [F.sum(F.expr(simhash_bit_sql(D.SPARK, "tok", j))).alias(f"b{j}")
            for j in range(bits)]
    summed = exploded.groupBy(id_col).agg(*aggs)
    sig = F.concat(*[F.when(F.col(f"b{j}") > 0, "1").otherwise("0")
                     for j in range(bits)])
    return summed.select(F.col(id_col), sig.alias("simhash"))


def simhash_near_dup_pairs(df: DataFrame, id_col: str, text_col: str,
                           bits: int = 16, prefix: int = 8) -> DataFrame:
    """Blocking near-dup: pairs sharing a signature prefix whose Hamming
    distance over the full signature is ≤ 2 (prefix blocking keeps the join
    linear in block sizes — the scale path for SimHash)."""
    sig = simhash_signatures(df, id_col, text_col, bits)
    a = sig.select(F.col(id_col).alias("id_a"), F.col("simhash").alias("sig_a"))
    b = sig.select(F.col(id_col).alias("id_b"), F.col("simhash").alias("sig_b"))
    block = (a.join(b, F.expr(f"substr(sig_a, 1, {prefix}) = substr(sig_b, 1, {prefix})"))
             .filter(F.col("id_a") < F.col("id_b")))
    hamming = sum(
        (F.substring("sig_a", j + 1, 1) != F.substring("sig_b", j + 1, 1)).cast("int")
        for j in range(bits)
    )
    return (block.withColumn("hamming", hamming)
            .filter(F.col("hamming") <= 2)
            .select("id_a", "id_b", "hamming")
            .orderBy("id_a", "id_b"))


# ---------------------------------------------------------------------------
# exact n-gram Jaccard (ground truth / verification path)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(df: DataFrame, id_col: str, text_col: str,
                        threshold: float = 0.5, n: int = 3,
                        max_gram_freq: int | None = None) -> DataFrame:
    """All pairs with Jaccard ≥ threshold via shared-shingle join.

    `max_gram_freq` drops shingles occurring in more than that many docs
    before pairing (standard stop-shingle trick: at scale a single
    ubiquitous shingle would otherwise quadratically blow up the join).
    Note: dropping shingles changes Jaccard values — it is an approximation
    switch, off by default and off in the oracle-checked gate query.
    """
    sh = shingles(df, id_col, text_col, n)
    if max_gram_freq is not None:
        freq = sh.groupBy("gram").agg(F.count(F.lit(1)).alias("f"))
        sh = sh.join(freq.filter(F.col("f") <= max_gram_freq).select("gram"), "gram")
    pairs = (sh.select(F.col(id_col).alias("id_a"), "gram")
             .join(sh.select(F.col(id_col).alias("id_b"), "gram"), "gram")
             .filter(F.col("id_a") < F.col("id_b"))
             .select("id_a", "id_b").distinct())
    return (jaccard_for_pairs(pairs, sh, id_col)
            .filter(F.col("jaccard") >= threshold)
            .orderBy("id_a", "id_b"))
