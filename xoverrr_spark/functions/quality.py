"""Heuristic caption-quality rules as Column expressions.

Generalizes the reference's row-level validation convention
(``xsniff_passed`` y/n, ``/root/reference/src/xoverrr/utils.py:262-303``)
into a battery of vectorized rules producing ``drop_reasons:
array<string>`` (the per-reason analogue of the reference's per-column
issue counters, ``utils.py:340-402``). All rules are JVM-side expressions;
thresholds live in ``rulespec``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from . import rulespec as R
from .langid import word_count
from .scrub import has_toxic


def norm_caption(text: Column) -> Column:
    """Trim + textual-null canonicalization (reference utils.py:814-823):
    whitespace-only / 'None' / 'nan' / 'NaT' (any case) -> 'N/A'."""
    t = F.trim(F.coalesce(text, F.lit("")))
    return F.when(t.rlike(R.NULLISH_RE), F.lit(R.NULL_REPLACEMENT)).otherwise(t)


def alpha_ratio(text: Column) -> Column:
    n = F.length(text)
    letters = F.length(F.regexp_replace(text, r"[^\p{L}]", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(letters.cast("double") / n)


def digit_ratio(text: Column) -> Column:
    n = F.length(text)
    digits = F.length(F.regexp_replace(text, r"[^0-9]", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(digits.cast("double") / n)


def distinct_word_ratio(text: Column) -> Column:
    words = F.split(F.lower(F.trim(text)), R.WORD_SPLIT_RE)
    n = F.size(words)
    return F.when(n == 0, F.lit(1.0)).otherwise(
        F.size(F.array_distinct(words)).cast("double") / n
    )


def en_stopword_hits(text: Column) -> Column:
    return F.regexp_count(F.lower(text), F.lit(R.lang_pattern("en")))


def drop_reasons(
    caption_norm: Column, lang: Column, ppl: Column | None
) -> Column:
    """array<string> of fired rules, in ``rulespec.ALL_REASONS`` order.

    An 'empty' caption short-circuits to exactly ['empty'] (nothing else is
    meaningful on a null payload). ``ppl`` may be None to build a plan
    without the perplexity stage.
    """
    is_empty = caption_norm == R.NULL_REPLACEMENT
    n = F.length(caption_norm)
    words = word_count(caption_norm)

    checks = [
        (R.REASON_TOO_SHORT, n < R.MIN_CAPTION_CHARS),
        (R.REASON_TOO_LONG, n > R.MAX_CAPTION_CHARS),
        (R.REASON_TOO_FEW_WORDS, words < R.MIN_WORDS),
        (R.REASON_LOW_ALPHA, alpha_ratio(caption_norm) < R.MIN_ALPHA_RATIO),
        (R.REASON_HIGH_DIGIT, digit_ratio(caption_norm) > R.MAX_DIGIT_RATIO),
        (
            R.REASON_REPETITIVE,
            (words >= R.REPETITION_MIN_WORDS)
            & (distinct_word_ratio(caption_norm) < R.MIN_DISTINCT_RATIO),
        ),
        (
            R.REASON_LOW_STOPWORD,
            (lang == "en")
            & (words >= R.STOPWORD_RULE_MIN_WORDS)
            & (
                en_stopword_hits(caption_norm).cast("double") / words
                < R.MIN_STOPWORD_RATIO
            ),
        ),
        (
            R.REASON_LANG,
            (lang == "und") & (words >= R.LANG_RULE_MIN_WORDS),
        ),
    ]
    if ppl is not None:
        checks.append((R.REASON_PPL, (lang == "en") & (ppl > R.PPL_MAX)))
    checks.append((R.REASON_TOXIC, has_toxic(caption_norm)))

    fired = F.array_compact(
        F.array(*[F.when(cond, F.lit(code)) for code, cond in checks])
    )
    return F.when(is_empty, F.array(F.lit(R.REASON_EMPTY))).otherwise(fired)
