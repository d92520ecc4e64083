"""The composite training-corpus pipeline — the engine's flagship use-case,
every stage an operator this repo already gates individually:

    quality-score → filter → MinHash near-dup removal (canonical survivor
    per cluster) → token counting → per-source sequence packing

One DataFrame plan end to end: Catalyst fuses the scoring projection into
the scan, the dedup is the bucketed LSH path (never quadratic), and packing
is one per-group window — no driver-side loops between stages.  The oracle
composes the SAME CTE fragments the individual gates use, so the composite
is value-checked end to end, not just its parts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import dialect as D
from ..catalog import load_table
from ..functions import text as T
from ..operators import dedup as DD
from ..operators.grouped import pack_token_budget
from ..util import fan_out
from . import Query, register
from .dedup_queries import BANDS, JACCARD_T, N_HASHES, NGRAM, _minhash_ctes
from .text_queries import PACK_BUDGET

QUALITY_FLOOR = 0.5


def training_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → curated, deduplicated, packed corpus.

    Returns one row per surviving doc: (doc_id, source, quality, n_tokens,
    bin_id).  Near-dup pairs are computed AMONG the quality-filtered docs
    (a low-quality near-dup of a kept doc must not knock the kept doc out).
    """
    d = D.SPARK
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    scored = docs.selectExpr(
        "doc_id", "source", "text",
        f"round({T.quality_score_sql(d, 'text')}, 6) AS quality",
        f"CAST({T.token_count_sql(d, 'text')} AS BIGINT) AS n_tokens",
    )
    # The shared frame is persisted PRE-filter (r12 — it was `kept`,
    # post-filter, through r11): Catalyst pushes the quality FILTER below
    # fan_out's round-robin exchange (PushPredicateThroughNonJoin treats
    # sinking a filter under an Exchange as always-beneficial), so the
    # whole quality-score predicate — the most expensive expression in
    # the pipeline — evaluated on the ONE pre-repartition scan partition,
    # single-task.  The scoring PROJECTION stays above the exchange
    # (no rule moves non-pruning projects through Exchange), so
    # persisting `scored` makes the cache the pushdown barrier: scoring
    # runs once, parallel, and the filter becomes a cached-column
    # compare each consumer applies for free.  Interleaved same-window
    # A/B at sf0.1: 8.29→5.34 s and 5.65→4.74 s.
    # Cache-manager persist + eager fill — NOT localCheckpoint: blocks
    # stay reclaimable by clearCache (round 4's checkpoint here pinned a
    # MapPartitionsRDD past every cleanup bench.py could issue).  Eager
    # fill via noop WRITE, not count(): the write streams each cached
    # batch straight to the null sink with no aggregation plan on top
    # (r6 A/B, SCALE.md).
    scored = scored.persist()
    scored.write.mode("overwrite").format("noop").save()
    kept = scored.filter(F.col("quality") >= QUALITY_FLOOR)
    # checkpoint_candidates=True (r15): kept reads through the persisted
    # scored frame, which breaks AQE's dedup of the twin verification
    # gram aggregates (see minhash_near_dup_pairs docstring)
    pairs = DD.minhash_near_dup_pairs(kept, "doc_id", "text",
                                      threshold=JACCARD_T,
                                      n_hashes=N_HASHES, bands=BANDS, n=NGRAM,
                                      checkpoint_candidates=True)
    survivors = DD.keep_canonical(kept, pairs, "doc_id").drop("text")
    packed = pack_token_budget(survivors, "source", "doc_id",
                               "n_tokens", PACK_BUDGET)
    return (packed.select("doc_id", "source", "quality", "n_tokens",
                          F.col("bin_id").cast("long").alias("bin_id"))
            .orderBy("source", "doc_id"))


def _corpus_oracle() -> str:
    d = D.DUCK
    return f"""
WITH RECURSIVE kept AS (
  SELECT doc_id, source, text,
         round({T.quality_score_sql(d, 'text')}, 6) AS quality,
         CAST({T.token_count_sql(d, 'text')} AS BIGINT) AS n_tokens
  FROM documents
  WHERE round({T.quality_score_sql(d, 'text')}, 6) >= {QUALITY_FLOOR}
), {_minhash_ctes(src='kept')}, nodes AS (
  SELECT id_a AS n FROM nd UNION SELECT id_b FROM nd
), edges AS (
  SELECT id_a AS src, id_b AS dst FROM nd UNION ALL SELECT id_b, id_a FROM nd
), reach(node, root) AS (
  SELECT n, n FROM nodes
  UNION
  SELECT e.dst, r.root FROM reach r JOIN edges e ON e.src = r.node
  WHERE r.root < e.dst
), labels AS (
  SELECT node, min(root) AS cluster_id FROM reach GROUP BY node
), surv AS (
  SELECT doc_id, source, quality, n_tokens FROM kept
  WHERE doc_id NOT IN (SELECT node FROM labels WHERE node <> cluster_id)
), p AS (
  SELECT doc_id, source, quality, n_tokens,
         coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         AS prefix
  FROM surv
)
SELECT doc_id, source, quality, n_tokens,
       CAST(floor(prefix / {PACK_BUDGET}.0) AS BIGINT) AS bin_id
FROM p ORDER BY source, doc_id
"""


# driver-visible (round-4 promotion: the engine's flagship query deserves a
# driver row; the registry slot came from folding the two salted-skew gates
# into `salted_skew_ops`)
register(Query("training_corpus_pipeline", training_corpus_pipeline,
               _corpus_oracle(), tags=("text", "dedup", "pipeline"),
               bench=True))


# ---------------------------------------------------------------------------
# v2: the FULL modern curation chain — quality → decontaminate (vs a held-
# out benchmark slice) → MinHash near-dup survivors → token-budget language
# mixing → per-source packing, still ONE declarative plan per stage with the
# two shared frames eagerly materialized.  The oracle composes the same CTE
# fragments the standalone gates use (decon grams, minhash nd, mix
# thresholds, pack prefix window), so the composite is value-checked end to
# end.  doc_id % DECON_MOD == 0 plays the benchmark set.
# ---------------------------------------------------------------------------

from ..operators.sample import token_budget_mix, token_budget_thresholds
from .dedup_queries import DECON_MOD, DECON_N
from .subset_queries import MIX_BUDGET, MIX_WEIGHTS


def curation_pipeline_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = D.SPARK
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    bench = docs.filter(F.col("doc_id") % DECON_MOD == 0)
    scored = docs.filter(F.col("doc_id") % DECON_MOD != 0).selectExpr(
        "doc_id", "source", "lang", "text",
        f"round({T.quality_score_sql(d, 'text')}, 6) AS quality",
        f"CAST({T.token_count_sql(d, 'text')} AS BIGINT) AS n_tokens",
    ).persist()
    # persist BEFORE the quality filter (r12, same fix as v1): lazily,
    # Catalyst sinks the quality predicate below fan_out's exchange and
    # the most expensive expression in the pipeline evaluates single-task
    # on the one-split scan; cached, scoring runs once in parallel and
    # the filter is a column compare.  The cheap doc_id % filter above
    # MAY sink — pruning rows before the shuffle is what pushdown is for.
    scored.write.mode("overwrite").format("noop").save()
    kept0 = scored.filter(F.col("quality") >= QUALITY_FLOOR)
    # decontaminated corpus feeds pair generation AND the survivor
    # anti-join — same persist + noop-fill materialization as v1's `kept`
    clean = DD.decontaminate(kept0, bench, n=DECON_N).persist()
    clean.write.mode("overwrite").format("noop").save()
    pairs = DD.minhash_near_dup_pairs(clean, "doc_id", "text",
                                      threshold=JACCARD_T,
                                      n_hashes=N_HASHES, bands=BANDS, n=NGRAM,
                                      checkpoint_candidates=True)
    surv = DD.keep_canonical(clean, pairs, "doc_id").drop("text").persist()
    thr = token_budget_thresholds(surv, MIX_WEIGHTS, MIX_BUDGET,
                                  stratum_col="lang", tokens_col="n_tokens")
    mixed = token_budget_mix(surv, MIX_WEIGHTS, MIX_BUDGET,
                             stratum_col="lang", thresholds=thr)
    packed = pack_token_budget(mixed, "source", "doc_id", "n_tokens",
                               PACK_BUDGET)
    return (packed.select("doc_id", "source", "lang", "quality", "n_tokens",
                          F.col("bin_id").cast("long").alias("bin_id"))
            .orderBy("source", "doc_id"))


def _curation_v2_oracle() -> str:
    d = D.DUCK
    g8 = DD.word_ngrams_sql(d, "text", DECON_N)
    wsum = float(sum(MIX_WEIGHTS.values()))
    budget_case = " ".join(
        f"WHEN {D.q(s)} THEN {MIX_BUDGET * (w / wsum)!r}"
        for s, w in sorted(MIX_WEIGHTS.items()))
    combined = f"({D.to_str(d, 'doc_id')} || '|' || {D.to_str(d, 'lang')})"
    draw = D.hash_uniform_mod(d, combined, "mix", 1_000_000)
    return f"""
WITH RECURSIVE bench AS (
  SELECT doc_id, text FROM documents WHERE doc_id % {DECON_MOD} = 0
), kept0 AS (
  SELECT doc_id, source, lang, text,
         round({T.quality_score_sql(d, 'text')}, 6) AS quality,
         CAST({T.token_count_sql(d, 'text')} AS BIGINT) AS n_tokens
  FROM documents
  WHERE doc_id % {DECON_MOD} <> 0
    AND round({T.quality_score_sql(d, 'text')}, 6) >= {QUALITY_FLOOR}
), kg AS (
  SELECT DISTINCT doc_id, unnest({g8}) AS gram FROM kept0
), bgr AS (
  SELECT DISTINCT unnest({g8}) AS gram FROM bench
), flagged AS (
  SELECT DISTINCT kg.doc_id FROM kg JOIN bgr USING (gram)
), kept AS (
  SELECT * FROM kept0 WHERE doc_id NOT IN (SELECT doc_id FROM flagged)
), {_minhash_ctes(src='kept')}, nodes AS (
  SELECT id_a AS n FROM nd UNION SELECT id_b FROM nd
), edges AS (
  SELECT id_a AS src, id_b AS dst FROM nd UNION ALL SELECT id_b, id_a FROM nd
), reach(node, root) AS (
  SELECT n, n FROM nodes
  UNION
  SELECT e.dst, r.root FROM reach r JOIN edges e ON e.src = r.node
  WHERE r.root < e.dst
), labels AS (
  SELECT node, min(root) AS cluster_id FROM reach GROUP BY node
), surv AS (
  SELECT doc_id, source, lang, quality, n_tokens FROM kept
  WHERE doc_id NOT IN (SELECT node FROM labels WHERE node <> cluster_id)
), tot AS (
  SELECT lang, sum(n_tokens) AS t FROM surv GROUP BY lang
), thr AS (
  SELECT lang, CASE WHEN coalesce(t, 0) > 0 THEN
    CAST(floor(least(1.0, (CASE lang {budget_case} ELSE 0 END) / t)
               * 1000000) AS BIGINT) ELSE 0 END AS thr
  FROM tot
), mixed AS (
  SELECT s.* FROM surv s JOIN thr USING (lang) WHERE {draw} < thr
), p AS (
  SELECT doc_id, source, lang, quality, n_tokens,
         coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         AS prefix
  FROM mixed
)
SELECT doc_id, source, lang, quality, n_tokens,
       CAST(floor(prefix / {PACK_BUDGET}.0) AS BIGINT) AS bin_id
FROM p ORDER BY source, doc_id
"""


# EXTRA since round 13 (still oracle-checked by pytest): its REGISTRY
# slot went to partitioned_events_revenue — v2's decontamination/mixing/
# near-dup chain is subsumed by the gated curation_pipeline_v4 (same
# stages plus the r9/r10 operators), while the time-partitioned layout's
# planning-time pruning is a scan-correctness surface only an oracle
# catches (was driver-visible round 7-12).
register(Query("curation_pipeline_v2", curation_pipeline_v2,
               _curation_v2_oracle(), tags=("text", "dedup", "pipeline")),
         extra=True)


# ---------------------------------------------------------------------------
# v3 (round 10): the same chain with the r9/r10 operators swapped into
# their slots — the PUBLISHED Gopher rule set (functions/gopher.py)
# replaces the heuristic quality floor, and temperature-flattened mixing
# (the mT5/unimax rule, operators/sample.py) replaces hand-written
# per-language weights; decontamination, MinHash near-dup survivors and
# per-source packing are unchanged.  One declarative plan per stage, the
# two shared frames eagerly materialized exactly like v2; the oracle
# composes the same CTE fragments the standalone gates already proved.
# ---------------------------------------------------------------------------

TMIX3_BUDGET, TMIX3_T = 1000, 3.0
# the synthetic fixture's whole vocabulary contains exactly ONE of the
# eight Gopher required stop words ('the'), so the published >= 2 bar
# empties the corpus — the pipeline runs the rule at >= 1 here (the
# BM25 max_df_ratio precedent); the published default stays the library
# default and its drop-everything edge is unit-tested directly
GQ3_MIN_STOP = 1


def curation_pipeline_v3(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.gopher import gopher_flags
    from ..operators.sample import temperature_mix

    d = D.SPARK
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    bench = docs.filter(F.col("doc_id") % DECON_MOD == 0)
    # persist the flagged frame, filter from cache (the v4/r12 pattern):
    # lazily, Catalyst inlines the gopher_pass conjunction into one
    # predicate and sinks it below fan_out's exchange — the whole rule
    # set single-task on the one-split scan
    flagged3 = (gopher_flags(docs.filter(F.col("doc_id") % DECON_MOD != 0),
                             min_stop_hits=GQ3_MIN_STOP)
                .select("doc_id", "source", "lang", "text", "gopher_pass")
                .persist())
    flagged3.write.mode("overwrite").format("noop").save()
    kept0 = (flagged3.filter(F.col("gopher_pass"))
             .selectExpr(
                 "doc_id", "source", "lang", "text",
                 f"CAST({T.token_count_sql(d, 'text')} AS BIGINT)"
                 f" AS n_tokens"))
    clean = DD.decontaminate(kept0, bench, n=DECON_N).persist()
    clean.write.mode("overwrite").format("noop").save()
    pairs = DD.minhash_near_dup_pairs(clean, "doc_id", "text",
                                      threshold=JACCARD_T,
                                      n_hashes=N_HASHES, bands=BANDS,
                                      n=NGRAM, checkpoint_candidates=True)
    # survivors feed the temperature totals collect AND the mix filter;
    # the collect inside temperature_mix fills this persist (v2's
    # thresholds-collect pattern)
    surv = DD.keep_canonical(clean, pairs, "doc_id").drop("text").persist()
    mixed = temperature_mix(surv, TMIX3_BUDGET, temperature=TMIX3_T,
                            stratum_col="lang", tokens_col="n_tokens")
    packed = pack_token_budget(mixed, "source", "doc_id", "n_tokens",
                               PACK_BUDGET)
    return (packed.select("doc_id", "source", "lang", "n_tokens",
                          F.col("bin_id").cast("long").alias("bin_id"))
            .orderBy("source", "doc_id"))


def _curation_v3_oracle() -> str:
    from ..functions.gopher import gopher_flag_sqls, gopher_stats_sql

    d = D.DUCK
    g8 = DD.word_ngrams_sql(d, "text", DECON_N)
    gq = " AND ".join(
        gopher_flag_sqls(gopher_stats_sql(d, "text"),
                         min_stop_hits=GQ3_MIN_STOP).values())
    alpha = 1.0 / TMIX3_T
    combined = f"({D.to_str(d, 'doc_id')} || '|' || {D.to_str(d, 'lang')})"
    draw = D.hash_uniform_mod(d, combined, "tmix", 1_000_000)
    return f"""
WITH RECURSIVE bench AS (
  SELECT doc_id, text FROM documents WHERE doc_id % {DECON_MOD} = 0
), kept0 AS (
  SELECT doc_id, source, lang, text,
         CAST({T.token_count_sql(d, 'text')} AS BIGINT) AS n_tokens
  FROM documents
  WHERE doc_id % {DECON_MOD} <> 0 AND ({gq})
), kg AS (
  SELECT DISTINCT doc_id, unnest({g8}) AS gram FROM kept0
), bgr AS (
  SELECT DISTINCT unnest({g8}) AS gram FROM bench
), flagged AS (
  SELECT DISTINCT kg.doc_id FROM kg JOIN bgr USING (gram)
), kept AS (
  SELECT * FROM kept0 WHERE doc_id NOT IN (SELECT doc_id FROM flagged)
), {_minhash_ctes(src='kept')}, nodes AS (
  SELECT id_a AS n FROM nd UNION SELECT id_b FROM nd
), edges AS (
  SELECT id_a AS src, id_b AS dst FROM nd UNION ALL SELECT id_b, id_a FROM nd
), reach(node, root) AS (
  SELECT n, n FROM nodes
  UNION
  SELECT e.dst, r.root FROM reach r JOIN edges e ON e.src = r.node
  WHERE r.root < e.dst
), labels AS (
  SELECT node, min(root) AS cluster_id FROM reach GROUP BY node
), surv AS (
  SELECT doc_id, source, lang, n_tokens FROM kept
  WHERE doc_id NOT IN (SELECT node FROM labels WHERE node <> cluster_id)
), tot AS (
  SELECT lang, sum(n_tokens) AS t FROM surv
  WHERE lang IS NOT NULL GROUP BY lang
), wsum AS (
  SELECT list_reduce(list_prepend(CAST(0 AS DOUBLE),
             list(pow(t, {D.dlit(d, alpha)}) ORDER BY lang)),
             (a, x) -> a + x) AS w
  FROM tot WHERE t > 0
), thr AS (
  SELECT lang,
         CAST(floor(least(1.0,
              ({TMIX3_BUDGET} * (pow(t, {D.dlit(d, alpha)}) / wsum.w)) / t)
              * 1000000) AS BIGINT) AS thr
  FROM tot, wsum WHERE t > 0
), mixed AS (
  SELECT s.* FROM surv s JOIN thr USING (lang) WHERE {draw} < thr
), p AS (
  SELECT doc_id, source, lang, n_tokens,
         coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         AS prefix
  FROM mixed
)
SELECT doc_id, source, lang, n_tokens,
       CAST(floor(prefix / {PACK_BUDGET}.0) AS BIGINT) AS bin_id
FROM p ORDER BY source, doc_id
"""


# EXTRA (r10): the v2 composite stays driver-gated; v3 swaps in the
# published Gopher rules + temperature mixing and is pytest-oracle-checked
register(Query("curation_pipeline_v3", curation_pipeline_v3,
               _curation_v3_oracle(), tags=("text", "dedup", "pipeline")),
         extra=True)


# --- v4 (late r10): published filters → model-based selection ---------------
# repetition rules ∧ C4 page rules gate the corpus, then DSIR picks the
# documents whose hashed-n-gram profile matches a target domain — the
# modern curation shape (filter for quality, SELECT for distribution)
# composed from three operators this round gates individually.

V4_M = 2048        # DSIR hash buckets
V4_K = 64          # selected docs
V4_TARGET = "src3"
V4_SEED = "v4"


def curation_pipeline_v4(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.c4 import c4_flags
    from ..operators.dsir import dsir_select
    from ..operators.repetition import repetition_flags
    from .text_queries import _C4_GATE_PARAMS

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    # published separators here (unlike the word-segment gate): on this
    # corpus the differential repetition signal is the top-3/4-gram
    # rules; the word-segment line rules would empty the corpus
    rep = repetition_flags(docs)
    both = c4_flags(rep, **_C4_GATE_PARAMS)
    # persist + materialize the FLAGGED frame, then filter FROM CACHE:
    # DSIR reads the survivors four times (target model, raw model,
    # scoring features, payload join), and filtering the lazy frame
    # would push the pass-conjunction down through the staged flag
    # projections — Catalyst inlines the per-rule expressions into one
    # predicate whose interpreted higher-order functions re-evaluate
    # per row at ~2× the staged projection cost (and 10× before the
    # repetition _let hardening).  Above an InMemoryRelation the filter
    # is a cached-boolean scan.  (r10 persisted the filtered survivors
    # for the same four-reads reason; the flagged frame is the same
    # corpus plus booleans.)
    flagged = (both.select("doc_id", "source", "text",
                           "repetition_pass", "c4_pass").persist())
    flagged.write.mode("overwrite").format("noop").save()
    surv = (flagged.filter(F.col("repetition_pass") & F.col("c4_pass"))
            .select("doc_id", "source", "text"))
    target = surv.filter(F.col("source") == V4_TARGET)
    # cache_features=False (r14): surv derives from the persisted
    # flagged frame, so DSIR's feature recompute is a cached-column
    # scan; stacking a second persist on top measured 6.3 → 8.5-12.2 s
    # at sf0.1/32c (see dsir_weights docstring)
    sel = dsir_select(surv, target, k=V4_K, m=V4_M, seed=V4_SEED,
                      cache_features=False)
    return (sel.join(surv.select("doc_id", "source"), "doc_id")
            .select("doc_id", "source", "n_feats", "logw", "key")
            .orderBy(F.col("key").desc(), "doc_id"))


def _curation_v4_oracle() -> str:
    from ..functions.c4 import c4_flag_sqls, c4_stats_sql, kept_lines_sql
    from ..operators import repetition as R
    from ..operators.dsir import dsir_oracle_ctes, gumbel_sql
    from .text_queries import _C4_GATE_PARAMS

    d = D.DUCK
    rep_ctes = R.ngram_stats_oracle_ctes()
    stat_cols = (["n_words", "word_chars"]
                 + [f"top{n}_chars" for n in R.TOP_NS]
                 + [f"dup{n}_chars" for n in R.DUP_NS])
    rep_flags = {
        **R.seg_flag_sqls(R.seg_rep_stats_sql(d, "d.text", "\n"),
                          "line"),
        **R.seg_flag_sqls(R.seg_rep_stats_sql(d, "d.text", "\n\n"),
                          "para"),
        **R.ngram_flag_sqls({c: f"s.{c}" for c in stat_cols})}
    p = _C4_GATE_PARAMS
    kept = kept_lines_sql(d, "d.text", p["terminal_punct"],
                          p["min_words_per_line"])
    c4 = c4_flag_sqls(
        c4_stats_sql(d, "d.text", kept=kept,
                     terminal_punct=p["terminal_punct"],
                     bad_words=p["bad_words"]),
        p["min_sentences"])
    all_pass = " AND ".join([*rep_flags.values(), *c4.values()])
    dsir = dsir_oracle_ctes("v4_surv", f"source = {D.q(V4_TARGET)}",
                            V4_M)
    g = gumbel_sql(d, "w.doc_id", V4_SEED)
    return f"""
WITH {rep_ctes.strip()},
v4_surv AS (
  SELECT d.doc_id, d.source, d.text
  FROM documents d JOIN rep_stats s ON d.doc_id = s.doc_id
  WHERE {all_pass}),
{dsir.strip()}
SELECT w.doc_id, s.source, w.n_feats, w.logw,
       round(w.logw + {g}, 6) AS key
FROM dsir_w w JOIN v4_surv s ON w.doc_id = s.doc_id
ORDER BY key DESC, w.doc_id LIMIT {V4_K}
"""


# bench=True: the composed filter→select plan (repetition explode + C4
# projection + two DSIR passes) — the end-to-end curation headline
# driver-gated since round 11 (swapped in for customers_without_orders):
# the end-to-end curation headline belongs in the driver window
register(Query("curation_pipeline_v4", curation_pipeline_v4,
               _curation_v4_oracle(),
               tags=("text", "quality", "sampling", "pipeline"),
               bench=True))
