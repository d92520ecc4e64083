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


def _nb_oracle() -> str:
    d = D.DUCK
    toks = D.split_ws(d, "lower(text)")
    k = NB_K
    return f"""
WITH tr AS (
  SELECT CAST(lang AS VARCHAR) AS label, unnest({toks}) AS token
  FROM documents WHERE doc_id % {NB_MOD} <> 0 AND lang IS NOT NULL
), model AS (
  SELECT label, token, CAST(count(*) AS BIGINT) AS n FROM tr
  WHERE token <> '' GROUP BY label, token
), priors AS (
  SELECT CAST(lang AS VARCHAR) AS label, CAST(count(*) AS BIGINT) AS n_docs
  FROM documents WHERE doc_id % {NB_MOD} <> 0 AND lang IS NOT NULL
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
SELECT d.doc_id, d.lang AS actual, r.label AS pred_label, r.score
FROM documents d JOIN ranked r ON r.doc_id = d.doc_id AND r.rn = 1
WHERE d.doc_id % {NB_MOD} = 0
ORDER BY d.doc_id
"""


register(Query("nb_lang_classifier", nb_lang_classifier, _nb_oracle(),
               tags=("text", "classifier"), bench=True))
