"""Language identification as pure Column expressions (JVM-side).

A fastText-style classifier is approximated by a stopword-alternation
n-gram heuristic (spec: ``rulespec.STOPWORDS``): count anchored stopword
matches per language over the lowercased text, argmax with a fixed
tie-break order, 'und' when nothing matches. Being pure ``regexp_count``
expressions, language-ID runs inside whole-stage codegen — zero Python —
and the same spec is replayable in ANSI SQL for the DuckDB oracle.

(If a real fastText model were available it would slot in as one
Series->Series pandas UDF behind the same (lang, lang_conf) contract.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from . import rulespec as R


def lang_scores(text: Column) -> dict[str, Column]:
    low = F.lower(text)
    return {lang: F.regexp_count(low, F.lit(R.lang_pattern(lang))) for lang in R.LANGS}


def lang_columns(text: Column) -> tuple[Column, Column]:
    """(lang, lang_conf) columns. conf = top stopword hits / word count."""
    scores = lang_scores(text)
    best_lang = F.lit("und")
    best_score = F.lit(0)
    # reverse order so earlier languages win ties (strict > comparison)
    for lang in reversed(R.LANGS):
        cond = scores[lang] > best_score
        best_lang = F.when(cond, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(cond, scores[lang]).otherwise(best_score)
    # recompute winner score by re-selecting (cheap: codegen'd CASE)
    words = word_count(text)
    conf = F.least(best_score.cast("double") / F.greatest(words, F.lit(1)), F.lit(1.0))
    return best_lang, conf


def word_count(text: Column) -> Column:
    trimmed = F.trim(text)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, R.WORD_SPLIT_RE))
    )
