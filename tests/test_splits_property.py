"""Property-based twins for the split family: a pure-Python md5 replay of
the 60-bit threshold assignment (catches hash-spec drift the oracle
cannot — the oracle replays the SAME spec, the r01 MinHash lesson) and
integer-identity checks for the token-budget epoch/ppm math on random
weights/budgets."""

import hashlib

from hypothesis import HealthCheck, given, settings, strategies as st

from xoverrr_spark.operators.splits import (
    SPLIT_SPACE,
    assign_splits,
    split_thresholds,
    token_budget_mixture,
)

_PPM = 1_000_000


def _md5_long_py(s: str) -> int:
    """Pure-Python replay of tokens.md5_long (first 15 md5 hex chars)."""
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _assign_py(doc_id, fractions, seed):
    key = f"{seed}:" + ("\x00<null-id>" if doc_id is None else str(doc_id))
    h = _md5_long_py(key)
    ths = split_thresholds(fractions)
    for name, t in ths:
        if h < t:
            return name
    return ths[-1][0]  # unreachable: last threshold is SPLIT_SPACE


_FRACS = st.sampled_from([
    {"train": 0.8, "val": 0.1, "test": 0.1},
    {"a": 0.5, "b": 0.5},
    {"train": 0.98, "holdout": 0.02},
    {"x": 0.25, "y": 0.25, "z": 0.25, "w": 0.25},
])
_IDS = st.lists(
    st.one_of(st.none(), st.integers(min_value=-10**12, max_value=10**12)),
    min_size=0, max_size=30, unique=True,
)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ids=_IDS, fractions=_FRACS, seed=st.integers(min_value=0, max_value=999))
def test_assign_splits_matches_python_md5_replay(spark, ids, fractions, seed):
    rows = [(i,) for i in ids]
    df = (spark.createDataFrame(rows, "doc_id bigint") if rows
          else spark.createDataFrame([], "doc_id bigint"))
    got = {r["doc_id"]: r["split"]
           for r in assign_splits(df, "doc_id", fractions, seed=seed).collect()}
    assert got == {i: _assign_py(i, fractions, seed) for i in ids}


_SOURCES = ["s0", "s1", "s2", None]
_DOCS = st.lists(
    st.tuples(st.sampled_from(_SOURCES), st.integers(min_value=0, max_value=40)),
    min_size=0, max_size=16,
)
_WEIGHTS = st.dictionaries(
    st.sampled_from(["s0", "s1", "s2"]),
    st.floats(min_value=0.1, max_value=5.0, allow_nan=False),
    min_size=0, max_size=3,
)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=_DOCS, weights=_WEIGHTS,
       budget=st.integers(min_value=0, max_value=10_000),
       upsample=st.booleans())
def test_token_budget_mixture_integer_identities(
        spark, docs, weights, budget, upsample):
    rows = [(f"d{i}", s, "w " * n) for i, (s, n) in enumerate(docs)]
    df = (spark.createDataFrame(rows, "doc_id string, source string, text string")
          if rows else
          spark.createDataFrame([], "doc_id string, source string, text string"))
    out = token_budget_mixture(
        df, "source", "text", weights, budget, allow_upsample=upsample
    ).collect()

    wsum = sum(weights.values())
    tokens = {}
    for s, n in docs:
        tokens[s] = tokens.get(s, 0) + n
    assert {r["source"] for r in out} == set(tokens)  # every source visible
    for r in out:
        target = (int(budget * weights[r["source"]] / wsum)
                  if r["source"] in weights and wsum > 0 else 0)
        n = tokens[r["source"]]
        assert (r["n_tokens"], r["target_tokens"]) == (n, target)
        if n == 0:
            assert (r["epochs"], r["rate_ppm"], r["planned_tokens"]) == (0, 0, 0)
        elif upsample:
            # exact integer identities of the epoch decomposition
            assert r["epochs"] == target // n
            assert r["rate_ppm"] == ((target % n) * _PPM) // n
            assert r["planned_tokens"] == target
            assert r["epochs"] * n + (target % n) == target
        else:
            assert r["epochs"] == 0
            assert r["rate_ppm"] == min(_PPM, (target * _PPM) // n)
            assert r["planned_tokens"] == min(target, n)
        assert 0 <= r["rate_ppm"] <= _PPM


def _fp_py(text):
    import re
    if text is None:
        return "\x00<null-text>"
    canon = re.sub(r"\s+", " ", text.lower(), flags=re.ASCII).strip()
    return hashlib.md5(canon.encode()).hexdigest()


_TEXTS = st.one_of(st.none(), st.sampled_from(
    ["dup one", "DUP   one", "dup two", "unique a", "unique b", "  ", ""]))
_SPLITS = st.one_of(st.none(), st.sampled_from(["train", "val", "test"]))
_CORPUS = st.lists(st.tuples(_TEXTS, _SPLITS), min_size=0, max_size=14)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=_CORPUS)
def test_split_leakage_matches_set_replay(spark, corpus):
    from xoverrr_spark.operators.splits import split_leakage

    rows = [(i, t, s) for i, (t, s) in enumerate(corpus)]
    df = (spark.createDataFrame(rows, "doc_id bigint, text string, split string")
          if rows else
          spark.createDataFrame([], "doc_id bigint, text string, split string"))
    got = {(r["doc_id"], r["split"], r["n_splits"], r["splits"])
           for r in split_leakage(df, "doc_id", "text", "split").collect()}

    by_fp = {}
    for i, (t, s) in enumerate(corpus):
        by_fp.setdefault(_fp_py(t), set()).add(
            s if s is not None else "\x00<null-split>")
    expect = set()
    for i, (t, s) in enumerate(corpus):
        spans = by_fp[_fp_py(t)]
        if len(spans) >= 2:
            expect.add((i, s if s is not None else "\x00<null-split>",
                        len(spans), ",".join(sorted(spans))))
    assert got == expect
