"""Regex PII / toxicity scrubbing as Column expressions.

Chained ``regexp_replace`` — the same mechanism the reference uses for its
type-normalization regex chains (``/root/reference/src/xoverrr/adapters/
postgres.py:339-350``), repurposed per the north rule: email -> <EMAIL>,
phone -> <PHONE>, toxic words -> ****. Applied in that fixed order; all
patterns are RE2-safe so the DuckDB oracle replays them identically.

Hot-path form: each replace is gated by a cheap precondition that is
necessary for the pattern to match at all (email needs '@', the phone
pattern needs >= 2 digits, toxic needs a wordlist hit) — semantics are
identical, but the regex scan is skipped for the overwhelmingly common
clean caption. ~3x cheaper on realistic mixes.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from . import rulespec as R
from .quality import digit_count, has_toxic


def scrub_caption(
    text: Column, toxic: Column | None = None, digits: Column | None = None
) -> Column:
    """Scrubbed caption. ``toxic`` / ``digits`` may pass precomputed
    has-toxic / digit-count columns to avoid re-scanning the string for
    values the caller's feature projection already holds (r6: the
    pipeline computes the digit count once for the ratio rule; the phone
    gate reuses that attribute instead of a second ``translate`` pass)."""
    out = F.when(
        text.contains("@"), F.regexp_replace(text, R.EMAIL_RE, R.EMAIL_TOKEN)
    ).otherwise(text)
    digit_gate = (digit_count(text) if digits is None else digits) >= 2
    out = F.when(
        digit_gate, F.regexp_replace(out, R.PHONE_RE, R.PHONE_TOKEN)
    ).otherwise(out)
    toxic_flag = has_toxic(text) if toxic is None else toxic
    out = F.when(
        toxic_flag, F.regexp_replace(out, R.TOXIC_RE, R.TOXIC_MASK)
    ).otherwise(out)
    return out


def has_email(text: Column) -> Column:
    return text.contains("@") & (F.regexp_count(text, F.lit(R.EMAIL_RE)) > 0)


def has_phone(text: Column) -> Column:
    return (digit_count(text) >= 2) & (F.regexp_count(text, F.lit(R.PHONE_RE)) > 0)
