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
