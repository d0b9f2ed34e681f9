"""As-of join semantics (pinned against DuckDB ASOF in the gate)."""

from pyspark.sql import functions as F

from janus_spark.operators.asof import asof_join


def _frames(spark):
    left = spark.createDataFrame(
        [(1, 1, 100), (2, 1, 205), (3, 1, 300), (4, 2, 150), (5, 3, 100)],
        "id long, k long, ts long",
    )
    right = spark.createDataFrame(
        [(1, 100, 1.0), (1, 200, 2.0), (1, 250, None), (2, 160, 9.0)],
        "k long, ts long, v double",
    )
    return left, right


def test_asof_backward_inclusive_and_nulls(spark):
    left, right = _frames(spark)
    out = {
        r["id"]: r["v_asof"]
        for r in asof_join(left, right, ts_col="ts", by=("k",), value_cols=("v",)).collect()
    }
    assert out[1] == 1.0  # equal ts matches (inclusive)
    assert out[2] == 2.0  # most recent prior
    assert out[3] == 2.0  # null right value at 250 is "no observation", carried past
    assert out[4] is None  # right row for k=2 is later than the left row
    assert out[5] is None  # key with no right rows at all
    # all left rows survive (left join)
    assert len(out) == 5


def test_asof_single_shuffle(spark):
    left, right = _frames(spark)
    plan = (
        asof_join(left, right, ts_col="ts", by=("k",), value_cols=("v",))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, "one shuffle on the key, no range join"
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_asof_forward_and_nearest_hand_computed(spark):
    from janus_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [("u", 10, 1), ("u", 25, 2), ("u", 40, 3)], "user_id string, ts long, event int"
    )
    right = spark.createDataFrame(
        [("u", 10, 100.0), ("u", 30, 300.0)], "user_id string, ts long, value double"
    )
    fwd = {
        r["event"]: r["value_asof"]
        for r in asof_join(left, right, ts_col="ts", direction="forward").collect()
    }
    # equal instant matches forward too; nothing at-or-after 40
    assert fwd == {1: 100.0, 2: 300.0, 3: None}
    near = {
        r["event"]: r["value_asof"]
        for r in asof_join(left, right, ts_col="ts", direction="nearest").collect()
    }
    # 25 is 15 from 10 and 5 from 30 -> forward; 40 -> backward to 30
    assert near == {1: 100.0, 2: 300.0, 3: 300.0}


def test_asof_nearest_tie_prefers_backward(spark):
    from janus_spark.operators.asof import asof_join

    left = spark.createDataFrame([("u", 20, 1)], "user_id string, ts long, event int")
    right = spark.createDataFrame(
        [("u", 10, 1.0), ("u", 30, 2.0)], "user_id string, ts long, value double"
    )
    r = asof_join(left, right, ts_col="ts", direction="nearest").collect()[0]
    assert r["value_asof"] == 1.0
