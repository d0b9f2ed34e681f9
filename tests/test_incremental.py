"""IncrementalAgg: batch-fold ≡ full recompute, versioning, vacuum."""

import tempfile

import pytest
from pyspark.sql import functions as F

from janus_spark.operators.incremental import IncrementalAgg


@pytest.fixture()
def events(spark):
    rows = [
        (i, f"t{i % 3}", float(i % 7) + 0.25, i % 5) for i in range(200)
    ] + [(200, "t0", None, 1)]
    return spark.createDataFrame(rows, ["event_id", "event_type", "value", "user_id"])


def _full(spark, ev):
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("decimal(38,0)")
    return {
        r["event_type"]: r
        for r in ev.where(F.col("value").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(cents).cast("double") / 100, 2).alias("sum_v"),
            F.min("value").alias("min_v"),
            F.max("value").alias("max_v"),
            F.countDistinct("user_id").alias("nd"),
        )
        .collect()
    }


def test_incremental_equals_recompute(spark, events):
    with tempfile.TemporaryDirectory() as root:
        inc = IncrementalAgg(spark, f"{root}/r", ["event_type"], distinct_col="user_id")
        # uneven batches, including an empty one
        for cond in [F.col("event_id") < 50, F.col("event_id") >= 50,
                     F.col("event_id") < 0]:
            inc.update(events.where(cond))
        got = {r["event_type"]: r for r in inc.read().collect()}
        want = _full(spark, events)
        assert set(got) == set(want)
        for k in want:
            assert got[k]["n"] == want[k]["n"]
            assert got[k]["sum_v"] == want[k]["sum_v"]
            assert got[k]["min_v"] == want[k]["min_v"]
            assert got[k]["max_v"] == want[k]["max_v"]
            # det-HLL at p=12 on ≤5 distinct users: linear-counting regime → near-exact
            assert got[k]["approx_distinct"] == pytest.approx(want[k]["nd"], rel=0.01)


def test_versions_time_travel_and_vacuum(spark, events):
    with tempfile.TemporaryDirectory() as root:
        inc = IncrementalAgg(spark, f"{root}/r", ["event_type"])
        v1 = inc.update(events.where(F.col("event_id") < 30))
        v2 = inc.update(events.where(F.col("event_id").between(30, 99)))
        assert (v1, v2) == (1, 2)
        n1 = sum(r["n"] for r in inc.read(version=1).collect())
        n2 = sum(r["n"] for r in inc.read(version=2).collect())
        assert n1 == 30 and n2 == 100
        assert inc.vacuum_versions(keep=1) == 1
        assert inc.current_version() == 2
        assert sum(r["n"] for r in inc.read().collect()) == 100


def test_update_commit_is_atomic_rename(spark, events):
    """Crash-safety contract: a half-written (staging) version is never
    visible to current_version()/read(), survives as ignorable garbage
    after a simulated crash between the aggs and hll writes, and is
    cleaned by the next successful update + vacuum."""
    import os
    import shutil

    with tempfile.TemporaryDirectory() as root:
        path = f"{root}/r"
        inc = IncrementalAgg(spark, path, ["event_type"], distinct_col="user_id")
        v1 = inc.update(events.where(F.col("event_id") < 50))
        assert v1 == 1 and inc.current_version() == 1

        # simulate a crash mid-update: staging dir with only the aggs leg
        stage = f"{path}/.staging-v=2"
        shutil.copytree(f"{path}/v=1/aggs", f"{stage}/aggs")
        # torn state is invisible: version and read() are unaffected
        assert inc.current_version() == 1
        assert inc.read().count() > 0

        # the next update reuses/clears staging and commits atomically
        v2 = inc.update(events.where(F.col("event_id") >= 50))
        assert v2 == 2 and inc.current_version() == 2
        assert os.path.isdir(f"{path}/v=2/hll")  # both legs present
        assert not os.path.isdir(stage)

        # leftover staging garbage (different version) is vacuumed
        os.makedirs(f"{path}/.staging-v=9/aggs", exist_ok=True)
        inc.vacuum_versions(keep=2)
        assert not os.path.isdir(f"{path}/.staging-v=9")
