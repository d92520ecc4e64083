"""C4 cleaning rules — the published heuristics that produced the C4
corpus (Raffel et al. 2020, "Exploring the Limits of Transfer Learning
with a Unified Text-to-Text Transformer", §2.2), restated as ONE
whole-stage-codegen projection per document:

line-level (a line survives only if ALL hold):

1. ends in a terminal punctuation mark (period, exclamation mark,
   question mark, end quotation mark)
2. contains at least 3 words
3. does not contain the word "javascript" (case-insensitive)

page-level (a page survives only if ALL hold, evaluated on kept lines
where sentence-derived):

4. at least 5 sentences (pinned definition: a sentence is a non-empty
   terminal-punctuation-delimited segment of the kept lines — i.e. the
   count of terminal punctuation marks in kept lines, each closing one
   sentence)
5. does not contain "lorem ipsum" (case-insensitive)
6. does not contain a curly brace ``{``
7. contains no word from the bad-word list (the published filter uses
   the "List of Dirty, Naughty, Obscene or Otherwise Bad Words" — a
   deployment-supplied wordlist; ``bad_words`` is the parameter, empty
   by default so the rule is opt-in)

The published pipeline also deduplicates three-sentence spans across
pages — that step exists in this repo as the span-dedup operator
(operators/dedup.py::span_dedup_pairs family); chain it after this
filter rather than reimplementing it here.

All counts are integers and all predicates are boolean string tests, so
the Spark plan and the DuckDB oracle agree bit-trivially.  No explode,
no join, no shuffle: at 100 TB the cost is the scan itself.

Parameterization caveat (recorded, not hidden): ``terminal_punct=None``
disables rule 1 and makes rule 4 count KEPT LINES instead of sentences —
for corpora with no sentence punctuation at all (the synthetic test
fixture is one); the published behavior is the default.

Reference analogue: none — Replibyte has no text analytics (SURVEY.md
§2.9); this sits beside functions/gopher.py and operators/repetition.py
as the third published curation rule set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import dialect as D

TERMINAL_PUNCT = (".", "!", "?", '"')
MIN_WORDS_PER_LINE = 3
MIN_SENTENCES = 5

#: doc-level rule name -> description (drives flag columns + summaries)
C4_DOC_RULES = {
    "min_sentences": ">= 5 sentences across kept lines",
    "lorem_ipsum": "page does not contain 'lorem ipsum'",
    "curly_brace": "page does not contain '{'",
    "bad_words": "page contains no bad-word-list word",
}


def _lines_sql(d: str, text: str) -> str:
    if d == D.SPARK:
        return f"split(coalesce({text}, ''), '\\n')"
    return f"string_split(coalesce({text}, ''), chr(10))"


def _line_words(d: str, x: str) -> str:
    """Whitespace word count of one line (trimmed; empty line -> 0)."""
    toks = D.split_ws(d, f"lower({x})")
    return (f"size(filter({toks}, t -> t <> ''))" if d == D.SPARK
            else f"len(list_filter({toks}, t -> t <> ''))")


def line_kept_sql(d: str, x: str = "x",
                  terminal_punct: "tuple[str, ...] | None" = TERMINAL_PUNCT,
                  min_words_per_line: int = MIN_WORDS_PER_LINE) -> str:
    """Boolean body of the line-survival lambda (variable ``x``)."""
    preds = []
    if terminal_punct is not None:
        ends = " OR ".join(
            f"right(rtrim({x}), 1) = {D.q(p)}" for p in terminal_punct)
        preds.append(f"({ends})")
    preds.append(f"{_line_words(d, x)} >= {min_words_per_line}")
    if d == D.SPARK:
        preds.append(f"NOT lower({x}) RLIKE 'javascript'")
    else:
        preds.append(f"NOT regexp_matches(lower({x}), 'javascript')")
    return " AND ".join(preds)


def kept_lines_sql(d: str, text: str,
                   terminal_punct=TERMINAL_PUNCT,
                   min_words_per_line: int = MIN_WORDS_PER_LINE) -> str:
    ln = _lines_sql(d, text)
    body = line_kept_sql(d, "x", terminal_punct, min_words_per_line)
    return D.array_filter(d, ln, f"x -> {body}")


def c4_stats_sql(d: str, text: str, kept: str | None = None,
                 terminal_punct=TERMINAL_PUNCT,
                 min_words_per_line: int = MIN_WORDS_PER_LINE,
                 bad_words: "tuple[str, ...]" = ()) -> "dict[str, str]":
    """Integer/boolean per-document statistics.  Pass ``kept`` as a
    STAGED column reference on hot paths (the line filter runs once);
    defaults inline it."""
    k = kept or kept_lines_sql(d, text, terminal_punct,
                               min_words_per_line)
    t = f"coalesce({text}, '')"
    if terminal_punct is not None:
        # sentences = terminal punctuation marks in kept lines
        per_line = " + ".join(
            f"(length(x) - length(replace(x, {D.q(p)}, '')))"
            for p in terminal_punct if p != '"')
        if d == D.SPARK:
            n_sent = (f"aggregate(transform({k}, x -> {per_line}), 0, "
                      f"(acc, x) -> acc + x)")
        else:
            n_sent = (f"coalesce(list_sum(list_transform({k}, "
                      f"x -> {per_line})), 0)")
    else:
        n_sent = D.array_len(d, k)
    if bad_words:
        toks = D.split_ws(d, f"lower({t})")
        hits = " OR ".join(
            (f"array_contains({toks}, {D.q(w)})" if d == D.SPARK
             else f"list_contains({toks}, {D.q(w)})")
            for w in bad_words)
    else:
        hits = "FALSE"
    contains_ci = (lambda pat:
                   f"contains(lower({t}), {D.q(pat)})" if d == D.SPARK
                   else f"contains(lower({t}), {D.q(pat)})")
    return {
        "n_lines": D.array_len(d, _lines_sql(d, text)),
        "n_kept_lines": D.array_len(d, k),
        "n_sentences": n_sent,
        "has_lorem": contains_ci("lorem ipsum"),
        "has_brace": f"contains({t}, '{{')",
        "has_bad_word": f"({hits})",
    }


def c4_flag_sqls(stats: "dict[str, str]",
                 min_sentences: int = MIN_SENTENCES) -> "dict[str, str]":
    s = stats
    return {
        "min_sentences": f"({s['n_sentences']} >= {min_sentences})",
        "lorem_ipsum": f"(NOT {s['has_lorem']})",
        "curly_brace": f"(NOT {s['has_brace']})",
        "bad_words": f"(NOT {s['has_bad_word']})",
    }


def c4_flags(df: DataFrame, text_col: str = "text",
             terminal_punct=TERMINAL_PUNCT,
             min_words_per_line: int = MIN_WORDS_PER_LINE,
             min_sentences: int = MIN_SENTENCES,
             bad_words: "tuple[str, ...]" = (),
             prefix: str = "c4_") -> DataFrame:
    """Append the cleaned text (``c4_text`` — kept lines re-joined), the
    per-document integer stats, one boolean per page rule
    (``c4_<rule>``) and the conjunction ``c4_pass``.  One staged line
    filter feeds every stat — a single codegen projection chain."""
    # widen a narrow scan before the per-row line machinery (no-op when
    # already wide; see repetition_flags' r12 note)
    from ..util import fan_out

    df = fan_out(df)
    d = D.SPARK
    kc = "__c4_kept"
    staged = df.withColumn(kc, F.expr(kept_lines_sql(
        d, text_col, terminal_punct, min_words_per_line)))
    stats = c4_stats_sql(d, text_col, kept=kc,
                         terminal_punct=terminal_punct,
                         bad_words=bad_words)
    stat_cols = {k: f"__c4_{k}" for k in stats}
    for k, expr in stats.items():
        staged = staged.withColumn(stat_cols[k], F.expr(expr))
    flags = c4_flag_sqls(stat_cols, min_sentences)
    for rule, expr in flags.items():
        staged = staged.withColumn(prefix + rule, F.expr(expr))
    passed = " AND ".join(prefix + r for r in flags)
    return (staged
            .withColumn("c4_pass", F.expr(passed))
            .withColumn("c4_text", F.array_join(F.col(kc), "\n"))
            .withColumn("c4_lines_kept",
                        F.col(stat_cols["n_kept_lines"]).cast("long"))
            .withColumn("c4_lines_total",
                        F.col(stat_cols["n_lines"]).cast("long"))
            .drop(kc, *stat_cols.values()))


def c4_filter(df: DataFrame, text_col: str = "text",
              terminal_punct=TERMINAL_PUNCT,
              min_words_per_line: int = MIN_WORDS_PER_LINE,
              min_sentences: int = MIN_SENTENCES,
              bad_words: "tuple[str, ...]" = ()) -> DataFrame:
    """Surviving pages with ``text`` REPLACED by the cleaned text (the
    published pipeline trains on the kept lines, not the raw page).
    Chain span dedup (operators/dedup.py) after this, as C4 did."""
    flagged = c4_flags(df, text_col, terminal_punct,
                       min_words_per_line, min_sentences, bad_words)
    keep = [c for c in df.columns if c != text_col]
    return (flagged.filter(F.col("c4_pass"))
            .select(*keep, F.col("c4_text").alias(text_col)))
