"""Explicit salted joins: the skew mitigation AQE cannot give you.

AQE's skew-join splitting detects skew from COMPRESSED shuffle-block
bytes (tests/test_skew_aqe.py pins this), so a hot join key whose
shuffled payload compresses to almost nothing — a constant or
low-cardinality column left behind by pruning — is NEVER split, with or
without ``forceOptimizeSkewedJoin``. The straggler is row-bound, not
byte-bound, and the only fix is to change the key itself:

    big side:   _salt = deterministic hash of the whole row, mod k
    small side: replicated k times, one copy per salt value
    join on     keys + _salt  ->  the hot key's rows spread over k
                                  partitions instead of one

Results are EXACTLY the plain join's (every big row meets every small
row of its key exactly once — via the single replica carrying its salt),
at the cost of scanning the small side k times' worth of rows through
the shuffle. Use when the small side is modest (a dimension too big or
too dynamic to broadcast) and one key dominates; for map-stage skew
(not join skew) use plain repartition-salting as ``pipeline.runner``
does (``xxhash64(id)`` full-cardinality — CLAUDE.md trap: ``pmod`` of a
hash re-hashed by the partitioner collides the k values).

The reference engine is single-process pandas (no shuffle, no skew
concept — core.py merges in one address space); this is Spark-physical
design per SURVEY §6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_SALT = "_salt"

_SUPPORTED = ("inner", "left", "left_outer", "leftouter",
              "left_semi", "leftsemi", "left_anti", "leftanti")


def salted_join(
    big: DataFrame,
    small: DataFrame,
    keys: list[str] | tuple[str, ...],
    salt: int = 16,
    how: str = "inner",
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Join ``big`` to ``small`` on ``keys`` with the hot-key rows of
    ``big`` spread over ``salt`` shuffle partitions.

    Left-side-preserving joins only (inner / left outer / semi / anti):
    the big side is salted, so every big row appears once; the small side
    is replicated per salt value, so right-preserving joins would count
    each small-only row ``salt`` times.

    The salt MUST be a deterministic function of the row — a ``rand()``
    salt re-rolls on task retries, and a partial stage recompute then
    ships some rows under two different salts (the classic
    nondeterministic-shuffle duplication/loss bug). Default: xxhash64
    over every hashable column (MapType is unhashable in Spark and is
    skipped). For rows carrying large binary payloads, pass
    ``salt_cols`` (e.g. the id column) so the hash doesn't walk the
    payload bytes; low-cardinality salt_cols merely spread less —
    identical rows co-locating is harmless.
    """
    if salt < 2:
        raise ValueError(f"salt must be >= 2 (got {salt}); 1 is a plain join")
    if how not in _SUPPORTED:
        raise ValueError(
            f"salted_join supports left-preserving joins {_SUPPORTED}, got {how!r}")
    keys = list(keys)
    missing = [k for k in keys if k not in big.columns]
    missing += [k for k in keys if k not in small.columns]
    if missing:
        raise ValueError(f"join keys not found: {missing}")
    for side in (big, small):
        if _SALT in side.columns:
            raise ValueError(f"reserved column {_SALT!r} already present")
    if salt_cols is not None:
        missing = [c for c in salt_cols if c not in big.columns]
        if missing or not salt_cols:
            raise ValueError(f"salt_cols not found in big side: {missing}")
        hash_cols = list(salt_cols)
    else:
        from pyspark.sql.types import MapType

        hash_cols = [f.name for f in big.schema.fields
                     if not isinstance(f.dataType, MapType)]
        if not hash_cols:  # all-map row: fall back to the join keys
            hash_cols = keys
    salted_big = big.withColumn(
        _SALT, F.pmod(F.xxhash64(*hash_cols), F.lit(salt)).cast("int"))
    replicated = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
    return (
        salted_big.join(replicated, keys + [_SALT], how)
        .drop(_SALT)
    )
