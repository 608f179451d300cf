"""As-of join semantics + plan shape (tagged-union + window, zero joins)."""

from xoverrr_spark.operators.timeseries import asof_join


def _mk(spark):
    left = spark.createDataFrame(
        [(1, "u1", 100), (2, "u1", 205), (3, "u2", 50), (4, "u3", 10)],
        "id int, k string, t long",
    )
    right = spark.createDataFrame(
        [("u1", 100, 1.0), ("u1", 200, 2.0), ("u1", 300, 3.0), ("u2", 60, 9.0)],
        "k string, t long, v double",
    )
    return left, right


def test_asof_join_semantics(spark):
    left, right = _mk(spark)
    out = {
        r["id"]: (r["ref_t"], r["ref_v"])
        for r in asof_join(left, right, ["k"], "t", "t", ["v"]).collect()
    }
    assert out[1] == (100, 1.0)      # tie: inclusive (right.ts == left.ts)
    assert out[2] == (200, 2.0)      # most recent at-or-before, not later
    assert out[3] == (None, None)    # right rows exist but all later
    assert out[4] == (None, None)    # key absent on right (left-outer)


def test_asof_join_dedupes_equal_timestamps_deterministically(spark):
    left = spark.createDataFrame([(1, "u1", 100)], "id int, k string, t long")
    right = spark.createDataFrame(
        [("u1", 90, 5.0), ("u1", 90, 7.0)], "k string, t long, v double"
    )
    rows = asof_join(left, right, ["k"], "t", "t", ["v"]).collect()
    assert rows[0]["ref_v"] == 7.0   # max value struct wins, not row order


def test_asof_join_plan_single_shuffle_no_join(spark):
    left, right = _mk(spark)
    plan = (
        asof_join(left, right, ["k"], "t", "t", ["v"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the whole point of the tagged-union formulation: a range join would
    # be a BroadcastNestedLoop/theta join; this is one exchange + window
    assert "Join" not in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Window" in plan, plan


def test_asof_join_keeps_all_left_columns(spark):
    left, right = _mk(spark)
    got = asof_join(left, right, ["k"], "t", "t", ["v"])
    assert got.columns == ["id", "k", "t", "ref_t", "ref_v"]
    assert got.count() == left.count()


def test_asof_join_matches_pandas_merge_asof_property(spark):
    # independent twin: pandas merge_asof(direction='backward',
    # allow_exact_matches=True) implements the identical semantics
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(17)
    n_l, n_r = 300, 500
    lpdf = pd.DataFrame({
        "id": np.arange(n_l),
        "k": rng.integers(0, 12, n_l).astype(str),
        "t": rng.integers(0, 1000, n_l).astype(np.int64),
    })
    rpdf = pd.DataFrame({
        "k": rng.integers(0, 12, n_r).astype(str),
        "t": rng.integers(0, 1000, n_r).astype(np.int64),
        "v": np.round(rng.random(n_r), 6),
    })
    # pandas needs unique right (k, t) for a deterministic pick — apply the
    # SAME max-value dedupe rule the operator guarantees
    rded = rpdf.groupby(["k", "t"], as_index=False)["v"].max()
    expected = pd.merge_asof(
        lpdf.sort_values("t"), rded.sort_values("t"),
        on="t", by="k", direction="backward", allow_exact_matches=True,
    ).sort_values("id")

    got = (
        asof_join(
            spark.createDataFrame(lpdf, "id long, k string, t long"),
            spark.createDataFrame(rpdf, "k string, t long, v double"),
            ["k"], "t", "t", ["v"],
        )
        .toPandas().sort_values("id")
    )
    assert list(got["ref_v"].fillna(-1)) == list(expected["v"].fillna(-1))


def test_asof_join_rejects_colliding_output_names(spark):
    import pytest

    left = spark.createDataFrame([(1, "k", 10, 0.0)], "id int, k string, t long, ref_v double")
    right = spark.createDataFrame([("k", 5, 1.0)], "k string, t long, v double")
    with pytest.raises(ValueError, match="ref_v"):
        asof_join(left, right, ["k"], "t", "t", ["v"])


# ----------------------------------------------------------- range_join ----

def _rj_frames(spark):
    from datetime import datetime as dt
    L = spark.createDataFrame(
        [(1, 10, dt(2024, 1, 1, 0, 0, 0)),
         (2, 10, dt(2024, 1, 1, 1, 0, 0)),
         (3, 20, dt(2024, 1, 1, 0, 2, 30)),
         (4, None, dt(2024, 1, 1, 0, 0, 0)),
         (5, 10, None)],
        "lid bigint, user_id bigint, ts timestamp")
    R = spark.createDataFrame(
        [(100, 10, dt(2024, 1, 1, 0, 0, 0)),      # == left ts: excluded (strict)
         (101, 10, dt(2024, 1, 1, 0, 4, 59)),     # in window of lid=1
         (102, 10, dt(2024, 1, 1, 0, 5, 0)),      # exactly +300s: INCLUDED
         (103, 10, dt(2024, 1, 1, 0, 5, 0, 1)),   # +300s +1us: excluded
         (104, 20, dt(2024, 1, 1, 0, 3, 0)),      # other key, in lid=3 window
         (105, None, dt(2024, 1, 1, 0, 0, 30)),   # null key matches lid=4
         (106, 10, None)],                        # null right ts: never matches
        "rid bigint, user_id bigint, ts timestamp")
    return L, R


def test_range_join_boundary_and_null_semantics(spark):
    from xoverrr_spark.operators.timeseries import range_join
    L, R = _rj_frames(spark)
    got = range_join(L, R, ["user_id"], "ts", "ts", ["rid"], 300)
    pairs = sorted((r.lid, r.r_rid) for r in got.collect())
    assert pairs == [(1, 101), (1, 102), (3, 104), (4, 105)]


def test_range_join_crosses_bin_boundary(spark):
    """A match in the NEXT bin (left near end of its bin) is still found."""
    from datetime import datetime as dt
    from xoverrr_spark.operators.timeseries import range_join
    L = spark.createDataFrame([(1, 1, dt(2024, 1, 1, 0, 4, 59))],
                              "lid bigint, k bigint, ts timestamp")
    R = spark.createDataFrame([(9, 1, dt(2024, 1, 1, 0, 7, 0))],
                              "rid bigint, k bigint, ts timestamp")
    assert range_join(L, R, ["k"], "ts", "ts", ["rid"], 300).count() == 1


def test_range_join_plan_is_hash_join(spark):
    """The binned formulation must plan as a hash equi-join — never a
    nested-loop/cartesian (what the raw theta-join would give)."""
    from xoverrr_spark.operators.timeseries import range_join
    L, R = _rj_frames(spark)
    plan = range_join(L, R, ["user_id"], "ts", "ts", ["rid"], 300)._jdf\
        .queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan, plan


def test_range_join_matches_pandas_twin_property(spark):
    import pandas as pd
    from xoverrr_spark.operators.timeseries import range_join
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    left = ev.filter("event_type = 'error'").select("event_id", "user_id", "ts")
    got = sorted(
        (r.event_id, r.r_event_id)
        for r in range_join(left, ev, ["user_id"], "ts", "ts",
                            ["event_id"], 86400).collect()
    )
    pe = ev.toPandas()
    le = pe[pe.event_type == "error"]
    m = le.merge(pe, on="user_id", suffixes=("_l", "_r"))
    m = m[(m.ts_r > m.ts_l) & (m.ts_r <= m.ts_l + pd.Timedelta(seconds=86400))]
    want = sorted(zip(m.event_id_l, m.event_id_r))
    assert got == want and len(got) > 100


def test_range_join_rejects_colliding_output_names(spark):
    import pytest
    from xoverrr_spark.operators.timeseries import range_join
    L, R = _rj_frames(spark)
    with pytest.raises(ValueError, match="already exist"):
        range_join(L.withColumnRenamed("lid", "r_ts"), R,
                   ["user_id"], "ts", "ts", ["rid"], 300)


def test_range_join_matches_sequential_twin_property(spark):
    """Randomized keys/timestamps (incl. nulls and bin-edge values) vs a
    plain O(n*m) python replay of the interval spec."""
    from datetime import datetime as dt, timedelta as td
    from hypothesis import HealthCheck, given, settings, strategies as st
    from xoverrr_spark.operators.timeseries import range_join

    base = dt(2024, 1, 1)
    ts = st.one_of(
        st.none(),
        st.integers(0, 900).map(lambda s: base + td(seconds=s)),
    )
    keys = st.one_of(st.none(), st.integers(0, 2))
    rows = st.lists(st.tuples(keys, ts), min_size=0, max_size=10)

    @settings(max_examples=20, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(lrows=rows, rrows=rows)
    def run(lrows, rrows):
        L = spark.createDataFrame(
            [(i, k, t) for i, (k, t) in enumerate(lrows)],
            "lid bigint, k bigint, ts timestamp")
        R = spark.createDataFrame(
            [(100 + i, k, t) for i, (k, t) in enumerate(rrows)],
            "rid bigint, k bigint, ts timestamp")
        got = sorted((r.lid, r.r_rid) for r in
                     range_join(L, R, ["k"], "ts", "ts", ["rid"], 300).collect())
        want = sorted(
            (li, 100 + ri)
            for li, (lk, lt) in enumerate(lrows)
            for ri, (rk, rt) in enumerate(rrows)
            if lk == rk or (lk is None and rk is None)
            if lt is not None and rt is not None
            and lt < rt <= lt + td(seconds=300)
        )
        assert got == want

    run()
