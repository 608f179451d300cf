"""Regex PII / toxicity scrubbing as Column expressions.

Chained ``regexp_replace`` — the same mechanism the reference uses for its
type-normalization regex chains (``/root/reference/src/xoverrr/adapters/
postgres.py:339-350``), repurposed per the north rule: email -> <EMAIL>,
phone -> <PHONE>, toxic words -> ****. Applied in that fixed order; all
patterns are RE2-safe so the DuckDB oracle replays them identically.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from . import rulespec as R


def scrub_caption(text: Column) -> Column:
    out = F.regexp_replace(text, R.EMAIL_RE, R.EMAIL_TOKEN)
    out = F.regexp_replace(out, R.PHONE_RE, R.PHONE_TOKEN)
    out = F.regexp_replace(out, R.TOXIC_RE, R.TOXIC_MASK)
    return out


def has_toxic(text: Column) -> Column:
    return F.regexp_count(text, F.lit(R.TOXIC_RE)) > 0


def has_email(text: Column) -> Column:
    return F.regexp_count(text, F.lit(R.EMAIL_RE)) > 0


def has_phone(text: Column) -> Column:
    return F.regexp_count(text, F.lit(R.PHONE_RE)) > 0
