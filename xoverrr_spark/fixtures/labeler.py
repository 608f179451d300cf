"""Independent golden labeler: the 'reference pipeline' for label parity.

A pure pandas/python-re implementation of the rule spec
(``functions/rulespec.py``). This file deliberately shares NO code with the
Spark pipeline beyond the constants module — it is the oracle the Spark
pipeline must match at F1 >= 0.99 (BASELINE.json metric), playing the role
of the reference's golden-label fixtures (FIXTURES.md F1).

Word-boundary patterns are compiled with ``re.ASCII`` so ``\\b`` and ``\\s``
agree with Java regex / RE2 ASCII semantics; the letter class uses unicode
mode to match ``\\p{L}``.
"""

from __future__ import annotations

import re

import pandas as pd

from ..functions import rulespec as R
from ..functions.perplexity import scalar_perplexity

_NULLISH = re.compile(R.NULLISH_RE, re.ASCII)
_STOPSETS = {lang: set(R.STOPWORDS[lang]) for lang in R.LANGS}
_LETTERS = re.compile(r"[^\W\d_]")  # unicode letters (== Java \p{L} here)
_DIGITS = re.compile(r"[0-9]")
_SPLIT = re.compile(R.WORD_SPLIT_RE)
_EMAIL = re.compile(R.EMAIL_RE)
_PHONE = re.compile(R.PHONE_RE)
_TOXIC = re.compile(R.TOXIC_RE.replace("(?i)", ""), re.IGNORECASE | re.ASCII)


def label_row(caption: str | None) -> dict:
    # explicit ASCII whitespace set — str.strip() with no args strips
    # unicode whitespace, which Spark/DuckDB regexp trimming does not
    t = "" if caption is None else str(caption).strip(R.WS_CHARS)
    if _NULLISH.match(t):
        t = R.NULL_REPLACEMENT

    low = t.lower()
    words = _SPLIT.split(t) if t else []
    words = [w for w in words if w]
    n_words = len(words)

    # token-membership stopword counting (matches the Spark InSet form)
    lwords = _SPLIT.split(low) if low else []
    scores = {lang: sum(1 for w in lwords if w in _STOPSETS[lang]) for lang in R.LANGS}
    lang, best = "und", 0
    for cand in R.LANGS:
        if scores[cand] > best:
            lang, best = cand, scores[cand]
    conf = min(best / max(n_words, 1), 1.0)
    ppl = scalar_perplexity(t)

    reasons = []
    if t == R.NULL_REPLACEMENT:
        reasons = [R.REASON_EMPTY]
    else:
        n = len(t)
        alpha = len(_LETTERS.findall(t)) / n if n else 0.0
        digit = len(_DIGITS.findall(t)) / n if n else 0.0
        distinct = len(set(lwords)) / n_words if n_words else 1.0
        if n < R.MIN_CAPTION_CHARS:
            reasons.append(R.REASON_TOO_SHORT)
        if n > R.MAX_CAPTION_CHARS:
            reasons.append(R.REASON_TOO_LONG)
        if n_words < R.MIN_WORDS:
            reasons.append(R.REASON_TOO_FEW_WORDS)
        if alpha < R.MIN_ALPHA_RATIO:
            reasons.append(R.REASON_LOW_ALPHA)
        if digit > R.MAX_DIGIT_RATIO:
            reasons.append(R.REASON_HIGH_DIGIT)
        if n_words >= R.REPETITION_MIN_WORDS and distinct < R.MIN_DISTINCT_RATIO:
            reasons.append(R.REASON_REPETITIVE)
        if (
            lang == "en"
            and n_words >= R.STOPWORD_RULE_MIN_WORDS
            and scores["en"] / n_words < R.MIN_STOPWORD_RATIO
        ):
            reasons.append(R.REASON_LOW_STOPWORD)
        if lang == "und" and n_words >= R.LANG_RULE_MIN_WORDS:
            reasons.append(R.REASON_LANG)
        if lang == "en" and ppl > R.PPL_MAX:
            reasons.append(R.REASON_PPL)
        if _TOXIC.search(t):
            reasons.append(R.REASON_TOXIC)

    scrubbed = _EMAIL.sub(R.EMAIL_TOKEN, t)
    scrubbed = _PHONE.sub(R.PHONE_TOKEN, scrubbed)
    scrubbed = _TOXIC.sub(R.TOXIC_MASK, scrubbed)

    return {
        "lang": lang,
        "lang_conf": conf,
        "ppl": ppl,
        "keep": len(reasons) == 0,
        "drop_reasons": reasons,
        "caption_scrubbed": scrubbed,
    }


def label_frame(pdf: pd.DataFrame, caption_col: str = "caption") -> pd.DataFrame:
    """Golden labels for a fixture frame: (image_id, keep, drop_reasons,
    caption_scrubbed, lang, lang_conf, ppl)."""
    recs = [label_row(c) for c in pdf[caption_col]]
    out = pd.DataFrame(recs)
    out.insert(0, "image_id", pdf["image_id"].to_numpy())
    return out
