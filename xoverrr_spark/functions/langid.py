"""Language identification as pure Column expressions (JVM-side).

A fastText-style classifier is approximated by a stopword-membership
heuristic (spec: ``rulespec.STOPWORDS``): tokenize once (split on
whitespace, lowercased), count tokens belonging to each language's
stopword set (compiles to an ``InSet`` hash lookup — no regex in the hot
path), argmax with ties to the earlier language in ``rulespec.LANGS``,
'und' when nothing matches. Zero Python; the same spec replays in ANSI SQL
(``list_filter(tokens, x -> x IN (...))``) for the DuckDB oracle.

Perf note: an earlier regexp_count formulation cost ~56 us/row/core — the
token-membership form is ~20x cheaper and shares its tokenization with the
quality rules (computed once per row in quality_filter's feature
projection).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from . import rulespec as R


def tokens_column(text: Column) -> Column:
    """Lowercased whitespace tokens ('' yields [''] — callers guard)."""
    return F.split(F.lower(F.trim(text)), R.WORD_SPLIT_RE)


def word_count(text: Column) -> Column:
    trimmed = F.trim(text)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, R.WORD_SPLIT_RE))
    )


def stopword_hits(tokens: Column, lang: str) -> Column:
    """Count of tokens in the language's stopword set (repeats counted)."""
    sw = R.STOPWORDS[lang]
    return F.size(F.filter(tokens, lambda w: w.isin(*sw)))


def lang_from_scores(scores: dict[str, Column]) -> tuple[Column, Column]:
    """(lang, top_score) from materialized per-language score columns.

    Argmax, ties to the earlier language in rulespec.LANGS; 0 => 'und'.
    Callers MUST pass plain attribute columns (not expression trees) —
    each score is referenced several times here.
    """
    m = F.greatest(*[scores[lang] for lang in R.LANGS])
    lang = F.when(m == 0, F.lit("und"))
    for cand in R.LANGS[:-1]:
        lang = lang.when(scores[cand] == m, F.lit(cand))
    lang = lang.otherwise(F.lit(R.LANGS[-1]))
    return lang, m


def lang_columns(text: Column) -> tuple[Column, Column]:
    """(lang, lang_conf) as self-contained Column expressions.

    Convenience form for one-off queries; the pipeline materializes scores
    first (see quality_filter.annotate) to avoid recomputing them.
    """
    toks = tokens_column(text)
    scores = {lang: stopword_hits(toks, lang) for lang in R.LANGS}
    lang, top = lang_from_scores(scores)
    words = word_count(text)
    conf = F.least(top.cast("double") / F.greatest(words, F.lit(1)), F.lit(1.0))
    return lang, conf
