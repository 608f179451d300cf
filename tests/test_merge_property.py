"""Property-based check: apply_changes agrees with a sequential dict
replay of the merge spec on randomized feeds (dup change keys, null keys,
deletes of absent keys, version ordering)."""

from hypothesis import HealthCheck, given, settings, strategies as st

from xoverrr_spark.operators.merge import apply_changes

_KEYS = st.one_of(st.none(), st.integers(min_value=0, max_value=5))
_BASE_ROWS = st.lists(
    st.tuples(_KEYS, st.sampled_from(["a", "b", "c"])),
    min_size=0, max_size=8, unique_by=lambda r: r[0],
)
_CHANGE_ROWS = st.lists(
    st.tuples(
        _KEYS,
        st.sampled_from(["x", "y", "z"]),
        st.sampled_from(["U", "D"]),
        st.integers(min_value=0, max_value=9),
    ),
    min_size=0, max_size=12,
)


def _sequential_merge(base_rows, change_rows):
    state = {k: v for k, v in base_rows}
    # winner per key: highest version; ties -> max (v, op) struct mirrors
    # the operator's max-value-struct tiebreak ordering (_ver, then the
    # non-key value struct)
    winners = {}
    for k, v, op, ver in change_rows:
        cur = winners.get(k)
        if cur is None or (ver, (v, op)) > (cur[3], (cur[1], cur[2])):
            winners[k] = (k, v, op, ver)
    for k, v, op, _ in winners.values():
        if op == "D":
            state.pop(k, None)
        else:
            state[k] = v
    return state


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(base_rows=_BASE_ROWS, change_rows=_CHANGE_ROWS)
def test_apply_changes_matches_sequential_replay(spark, base_rows, change_rows):
    base = spark.createDataFrame(base_rows, "k bigint, v string") if base_rows \
        else spark.createDataFrame([], "k bigint, v string")
    ch = (
        spark.createDataFrame(change_rows, "k bigint, v string, op string, ver bigint")
        if change_rows
        else spark.createDataFrame([], "k bigint, v string, op string, ver bigint")
    )
    got = {r.k: r.v for r in
           apply_changes(base, ch, ["k"], op_col="op", version_col="ver").collect()}
    assert got == _sequential_merge(base_rows, change_rows)
