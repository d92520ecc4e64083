"""Grouped-map operators via `applyInPandas` — the per-group Python surface
(complement of the scalar pandas UDF and the streaming stateful op).

Shape: `groupBy(key).applyInPandas(fn)` ships each group to a Python worker
as ONE Arrow batch.  Right for per-group algorithms that are awkward in SQL
but small per group (term statistics, per-group model scoring); wrong for
anything whose group can exceed worker memory — at 100 TB you bound group
size by construction (here: groups are corpus sources, vocabulary-bounded).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

TOP_TERMS_SCHEMA = "source string, token string, freq long, rank int"


def top_terms_per_source(docs: DataFrame, k: int = 5,
                         source_col: str = "source",
                         text_col: str = "text") -> DataFrame:
    """Top-k tokens by frequency per source (deterministic tie-break:
    frequency desc, then token asc — mirrored exactly by the SQL oracle).

    Scale shape (r10 — the r9 verdict's one applyInPandas caveat): the
    word count happens DECLARATIVELY first (explode → groupBy(source,
    token) — the distributed map-side-combined shuffle), and only the
    per-(source, token) frequency rows reach the grouped-map stage.  The
    Arrow batch a Python worker receives is therefore VOCABULARY-sized
    (sublinear in corpus size, Heaps' law), not corpus-sized — a 100 TB
    source no longer ships its raw text to one worker.  The pandas fn
    keeps doing real per-group work (merge + rank + truncate), so this
    stays the repo's grouped-map surface demo."""
    from pyspark.sql import functions as F

    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    counts = (docs
              .filter(F.length(F.trim(F.col(text_col))) > 0)
              .select(F.col(source_col).alias("source"),
                      F.explode(toks).alias("token"))
              .groupBy("source", "token")
              .agg(F.count(F.lit(1)).cast("long").alias("freq")))

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        ranked = sorted(zip(pdf["token"], pdf["freq"]),
                        key=lambda kv: (-kv[1], kv[0]))[:k]
        src = pdf["source"].iloc[0]
        return pd.DataFrame(
            [(src, tok, int(freq), i + 1)
             for i, (tok, freq) in enumerate(ranked)],
            columns=["source", "token", "freq", "rank"])

    return (counts.groupBy("source")
            .applyInPandas(per_group, schema=TOP_TERMS_SCHEMA)
            .orderBy("source", "rank"))


def pack_token_budget(df, group_col: str, order_col: str, token_col,
                      budget: int, bin_alias: str = "bin_id"):
    """Assign each document a sequence-packing bin: within a group, in
    deterministic `order_col` order, bin = floor(exclusive-prefix-sum of
    tokens / budget).

    The prefix-sum packing (vs. greedy first-fit) is chosen BECAUSE it is
    order-deterministic and engine-reproducible — the property a resumable
    100 TB packing job needs (greedy bin state isn't associative; a prefix
    sum is one per-group window, shuffles once on the group key).  Bins can
    overshoot by at most one document — the standard trade for determinism.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    w = (Window.partitionBy(group_col).orderBy(order_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    prefix = F.coalesce(F.sum(token_col).over(w), F.lit(0))
    return df.withColumn(bin_alias, F.floor(prefix / budget))


def assemble_packed_sequences(df, group_col: str, order_col: str,
                              token_col: str, text_col: str, budget: int,
                              sep: str = "\n"):
    """Turn token-budget bins into actual training sequences: per
    (group, bin), concatenate the member docs' text in `order_col` order
    and carry per-doc token OFFSETS, so a reader can mask attention at
    document boundaries without re-tokenizing.

    Two windows, both partitioned by (group) then (group, bin) — never a
    global sort; sequence text is built by one ordered collect_list per
    bin, whose size is budget-bounded by construction (a bin holds
    ~`budget` tokens, so the concatenated string is bounded regardless of
    corpus size — the property that makes this safe at 100 TB where an
    unbounded per-group collect would not be)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    packed = pack_token_budget(df, group_col, order_col, token_col, budget)
    wb = (Window.partitionBy(group_col, "bin_id").orderBy(order_col)
          .rowsBetween(Window.unboundedPreceding, -1))
    with_off = packed.withColumn(
        "tok_offset", F.coalesce(F.sum(token_col).over(wb), F.lit(0)))
    entry = F.struct(F.col(order_col), F.col(text_col).alias("__t"),
                     F.col("tok_offset").alias("__o"),
                     F.col(token_col).alias("__n"))
    return (with_off.groupBy(group_col, "bin_id")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(token_col).cast("long").alias("seq_tokens"),
                 F.array_join(
                     F.transform(F.array_sort(F.collect_list(entry)),
                                 lambda s: s["__t"]), sep).alias("seq_text"),
                 F.transform(F.array_sort(F.collect_list(entry)),
                             lambda s: F.struct(
                                 s["__o"].cast("long").alias("start"),
                                 (s["__o"] + s["__n"]).cast("long")
                                 .alias("end"))).alias("doc_offsets")))


def chunk_documents(df, id_col: str = "doc_id", text_col: str = "text",
                    chunk_tokens: int = 128, overlap: int = 32):
    """Fixed-stride overlapping token windows per document — the
    retrieval/embedding ingestion shape (embed each chunk, keep (doc,
    chunk) addressing back to the source).

    Output: (id, chunk_idx, tok_start, n_tokens, chunk_text), one row per
    window; starts run 1, 1+stride, ... (stride = chunk_tokens - overlap),
    the final window may be short, and empty/NULL docs yield no chunks.
    Starts are capped at max(1, n - overlap): a window starting past that
    ends exactly where the previous one did (its tokens are a strict
    subsequence), and a RAG index built from such windows surfaces
    duplicate retrieval hits — so every chunk after the first introduces
    at least one new token.  Pure per-row explode — no shuffle, no UDF;
    at corpus scale the cost is the scan plus the output write."""
    from pyspark.sql import functions as F

    from .. import dialect as D

    if chunk_tokens < 1:
        raise ValueError(f"chunk_tokens must be >= 1, got {chunk_tokens}")
    if not 0 <= overlap < chunk_tokens:
        # a NEGATIVE overlap (easy to typo on the CLI) would make the
        # stride exceed the window and silently drop tokens from every
        # chunk — the corpus would be gap-riddled with exit code 0
        raise ValueError(
            f"overlap must be in [0, chunk_tokens), got {overlap} "
            f"(chunk_tokens={chunk_tokens})")
    stride = chunk_tokens - overlap
    toks = D.split_ws(D.SPARK, text_col)
    # NULL guard first: with ANSI off, size(NULL) = -1, so without it the
    # sequence() below throws on NULL text and aborts the whole job.
    # The sequence cap at greatest(1, n - overlap) suppresses trailing
    # windows that introduce no new token (strict subsequences of their
    # predecessor — see docstring); the cap keeps a contiguous prefix of
    # the stride grid, so chunk_idx from posexplode stays dense.
    e = (f"CASE WHEN __toks IS NULL OR size(__toks) = 0 "
         f"OR __toks = array('') THEN array() ELSE "
         f"transform(sequence(1, greatest(1, size(__toks) - {overlap}), "
         f"{stride}), "
         f"s -> struct(s AS tok_start, "
         f"slice(__toks, s, {chunk_tokens}) AS w)) END")
    # r13 fan_out sweep: tokenize+explode is a heavy zero-shuffle per-row
    # stage — on a one-split scan it runs single-task (the r12
    # repetition/gopher trap); no-op on already-wide inputs
    from ..util import fan_out

    return (fan_out(df).select(F.col(id_col), F.expr(toks).alias("__toks"))
            .select(F.col(id_col),
                    F.posexplode(F.expr(e)).alias("chunk_idx", "c"))
            .select(F.col(id_col),
                    F.col("chunk_idx").cast("long"),
                    F.col("c.tok_start").cast("long").alias("tok_start"),
                    F.size("c.w").cast("long").alias("n_tokens"),
                    F.array_join("c.w", " ").alias("chunk_text")))
