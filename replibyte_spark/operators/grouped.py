"""Grouped-map operators via `applyInPandas` — the per-group Python surface
(complement of the scalar pandas UDF and the streaming stateful op).

Shape: `groupBy(key).applyInPandas(fn)` ships each group to a Python worker
as ONE Arrow batch.  Right for per-group algorithms that are awkward in SQL
but small per group (term statistics, per-group model scoring); wrong for
anything whose group can exceed worker memory — at 100 TB you bound group
size by construction (here: groups are corpus sources, vocabulary-bounded).
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
from pyspark.sql import DataFrame

TOP_TERMS_SCHEMA = "source string, token string, freq long, rank int"


def top_terms_per_source(docs: DataFrame, k: int = 5,
                         source_col: str = "source",
                         text_col: str = "text") -> DataFrame:
    """Top-k tokens by frequency per source (deterministic tie-break:
    frequency desc, then token asc — mirrored exactly by the SQL oracle)."""

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        counts: Counter = Counter()
        for text in pdf[text_col]:
            if text:
                counts.update(str(text).split())
        ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        src = pdf[source_col].iloc[0]
        return pd.DataFrame(
            [(src, tok, freq, i + 1) for i, (tok, freq) in enumerate(ranked)],
            columns=["source", "token", "freq", "rank"])

    return (docs.select(source_col, text_col)
            .groupBy(source_col)
            .applyInPandas(per_group, schema=TOP_TERMS_SCHEMA)
            .orderBy("source", "rank"))
