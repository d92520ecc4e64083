"""Model-based classification gate — multinomial Naive Bayes (operators/
classify.py): the fastText-style model-based filter component (CCNet LID /
DCLM quality classifier analogue) restated as pure counting + deterministic
fold so the DuckDB oracle replays training AND inference bit-for-bit."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import dialect as D
from ..catalog import load_table
from ..functions import text as T
from . import Query, register

NB_MOD = 4      # doc_id % 4 == 0 -> held-out quarter (the lm.py split)
NB_K = 0.5      # add-k smoothing


def nb_lang_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train multinomial NB on 3/4 of the corpus with `lang` as the label,
    classify the held-out quarter: (doc_id, actual, pred_label, score).
    Training is one word-count aggregation; scoring a vocabulary-bounded
    broadcast join + per-(doc, class) sorted fold — see operators/
    classify.py for the algebra and the 100 TB shape."""
    from ..operators.classify import (class_priors, nb_classify,
                                      train_naive_bayes)

    docs = load_table(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % NB_MOD != 0)
    held = docs.filter(F.col("doc_id") % NB_MOD == 0)
    model = train_naive_bayes(train, label_col="lang")
    priors = class_priors(train, label_col="lang")
    pred = nb_classify(held, model, priors, k=NB_K)
    return (held.select("doc_id", F.col("lang").alias("actual"))
            .join(pred, on="doc_id")
            .orderBy("doc_id"))


def _nb_oracle(label_expr: str = "CAST(lang AS VARCHAR)",
               actual_alias: str = "actual") -> str:
    """The NB train+score oracle, parameterized by the LABEL EXPRESSION —
    reused by the lang gate (label = the lang column) and the quality
    distillation gate (label = the heuristic keep/drop verdict), so the
    replay logic lives once."""
    d = D.DUCK
    toks = D.split_ws(d, "lower(text)")
    k = NB_K
    return f"""
WITH tr AS (
  SELECT {label_expr} AS label, unnest({toks}) AS token
  FROM documents
  WHERE doc_id % {NB_MOD} <> 0 AND ({label_expr}) IS NOT NULL
), model AS (
  SELECT label, token, CAST(count(*) AS BIGINT) AS n FROM tr
  WHERE token <> '' GROUP BY label, token
), priors AS (
  SELECT {label_expr} AS label, CAST(count(*) AS BIGINT) AS n_docs
  FROM documents
  WHERE doc_id % {NB_MOD} <> 0 AND ({label_expr}) IS NOT NULL
  GROUP BY 1
), tot AS (
  SELECT CAST(sum(n_docs) AS BIGINT) AS total_docs FROM priors
), voc AS (
  SELECT count(DISTINCT token) AS v FROM model
), totals AS (
  SELECT label, CAST(sum(n) AS BIGINT) AS total FROM model GROUP BY label
), cls AS (
  SELECT p.label,
         ln(p.n_docs / CAST(t.total_docs AS DOUBLE)) AS lp,
         ln({k} / (coalesce(tt.total, 0) + {k} * (voc.v + 1))) AS lnu
  FROM priors p
  LEFT JOIN totals tt ON tt.label = p.label
  CROSS JOIN tot t CROSS JOIN voc
), ht AS (
  SELECT doc_id, unnest({toks}) AS token
  FROM documents WHERE doc_id % {NB_MOD} = 0
), tf AS (
  SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf FROM ht
  WHERE token <> '' GROUP BY doc_id, token
), corr AS (
  SELECT tf.doc_id, m.label,
         list_reduce(list(tf.tf * (ln(m.n + {k}) - ln({k}))
                          ORDER BY tf.token), (a, b) -> a + b) AS corr
  FROM tf JOIN model m USING (token)
  GROUP BY tf.doc_id, m.label
), lens AS (
  SELECT doc_id,
         coalesce(CAST({T.token_count_sql(d, 'text')} AS BIGINT), 0)
           AS n_tokens
  FROM documents WHERE doc_id % {NB_MOD} = 0
), scores AS (
  SELECT l.doc_id, c.label,
         round(c.lp + l.n_tokens * c.lnu + coalesce(co.corr, 0.0), 6)
           AS score
  FROM lens l CROSS JOIN cls c
  LEFT JOIN corr co ON co.doc_id = l.doc_id AND co.label = c.label
), ranked AS (
  SELECT doc_id, label, score,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, label ASC) AS rn
  FROM scores
)
SELECT d.doc_id, {label_expr} AS {actual_alias}, r.label AS pred_label,
       r.score
FROM documents d JOIN ranked r ON r.doc_id = d.doc_id AND r.rn = 1
WHERE d.doc_id % {NB_MOD} = 0
ORDER BY d.doc_id
"""


register(Query("nb_lang_classifier", nb_lang_classifier, _nb_oracle(),
               tags=("text", "classifier"), bench=True))


# --- heuristic-filter distillation (round 9) ---------------------------------
# the DCLM/FineWeb-edu deployment pattern: an expensive labeler (there, a
# strong LM grading documents; here, standing in, the composite heuristic
# quality verdict) labels the training split once, a FAST linear
# classifier is trained on those labels, and the trained classifier — one
# broadcast join instead of the full labeler — is what scores the other
# 100 TB.  Oracle-checked end to end via the parameterized NB oracle.

NB_Q_FLOOR = 0.5   # the corpus pipeline's QUALITY_FLOOR


def _quality_label_expr(d: str) -> str:
    return (f"CASE WHEN {T.quality_score_sql(d, 'text')} >= {NB_Q_FLOOR} "
            f"THEN 'keep' ELSE 'drop' END")


def nb_quality_distilled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distill the heuristic quality filter into NB: label the training
    3/4 with the heuristic keep/drop verdict, train, predict the held-out
    quarter; (doc_id, heuristic_label, pred_label, score) — agreement
    between columns 2 and 3 is the distillation fidelity."""
    from ..operators.classify import (class_priors, nb_classify,
                                      train_naive_bayes)

    d = D.SPARK
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "hl", F.expr(_quality_label_expr(d)))
    train = docs.filter(F.col("doc_id") % NB_MOD != 0)
    held = docs.filter(F.col("doc_id") % NB_MOD == 0)
    model = train_naive_bayes(train, label_col="hl")
    priors = class_priors(train, label_col="hl")
    pred = nb_classify(held, model, priors, k=NB_K)
    return (held.select("doc_id", F.col("hl").alias("heuristic_label"))
            .join(pred, on="doc_id")
            .orderBy("doc_id"))


register(Query("nb_quality_distilled", nb_quality_distilled,
               _nb_oracle(_quality_label_expr(D.DUCK), "heuristic_label"),
               tags=("text", "classifier")), extra=True)
