"""sessionize / asof_join / interval_join vs brute-force pandas references."""

from __future__ import annotations

import datetime as dt
import random

import pandas as pd
import pytest

from pyspark.sql import functions as F

from project_gutenberg_full_text_search_spark.operators.temporal import (
    asof_join,
    interval_join,
    sessionize,
)

T0 = dt.datetime(2024, 1, 1)


def _ts(minutes: float) -> dt.datetime:
    return T0 + dt.timedelta(minutes=minutes)


# ---------------------------------------------------------------- sessionize


def _ref_sessionize(rows, gap_sec):
    """rows: list[(key, ts, id)] → {id: session_seq} via a plain scan."""
    out = {}
    by_key = {}
    for k, ts, i in sorted(rows, key=lambda r: (r[0], r[1], r[2])):
        last, seq = by_key.get(k, (None, 0))
        if last is None or (ts - last).total_seconds() > gap_sec:
            seq += 1
        by_key[k] = (ts, seq)
        out[i] = seq
    return out


def test_sessionize_matches_reference_scan(spark):
    rng = random.Random(7)
    rows = []
    i = 0
    for k in range(8):
        t = 0.0
        for _ in range(rng.randint(1, 40)):
            t += rng.choice([1, 5, 29, 30, 31, 200])  # minutes
            rows.append((k, _ts(t), i))
            i += 1
    df = spark.createDataFrame(rows, "user_id int, ts timestamp, event_id int")
    got = {
        r["event_id"]: r["session_seq"]
        for r in sessionize(
            df.repartition(5), gap_sec=1800, tiebreak_col="event_id"
        ).collect()
    }
    assert got == _ref_sessionize(rows, 1800)


def test_sessionize_gap_boundary_is_exclusive(spark):
    # gap exactly == gap_sec stays in-session; one second more breaks.
    rows = [
        (1, _ts(0), 0),
        (1, _ts(30), 1),  # 1800 s later: same session
        (1, _ts(60.02), 2),  # 1801.2 s later: new session
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp, event_id int")
    got = {
        r["event_id"]: r["session_seq"]
        for r in sessionize(df, gap_sec=1800, tiebreak_col="event_id").collect()
    }
    assert got == {0: 1, 1: 1, 2: 2}


def test_sessionize_single_shuffle(spark):
    df = spark.createDataFrame(
        [(1, _ts(0), 0), (1, _ts(1), 1)], "user_id int, ts timestamp, event_id int"
    )
    plan = sessionize(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.lower().count("exchange") <= 1


# ----------------------------------------------------------------- asof_join


def _ref_asof(left, right, direction, tolerance_sec=None):
    """left: [(key, ts, id)], right: [(key, ts, val)] → {id: (rts, val)|None}."""
    out = {}
    for k, ts, i in left:
        if direction == "backward":
            cands = [(rts, v) for rk, rts, v in right if rk == k and rts <= ts]
            best = max(cands) if cands else None
        else:
            cands = [(rts, v) for rk, rts, v in right if rk == k and rts >= ts]
            best = min(cands) if cands else None
        if best is not None and tolerance_sec is not None:
            if abs((best[0] - ts).total_seconds()) > tolerance_sec:
                best = None
        out[i] = best
    return out


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_join_matches_bruteforce(spark, direction):
    rng = random.Random(13)
    left = [
        (rng.randint(0, 5), _ts(rng.randint(0, 500)), i) for i in range(120)
    ]
    right = [
        (rng.randint(0, 5), _ts(rng.randint(0, 500)), float(i)) for i in range(60)
    ]
    # make right (key, ts) unique so the reference argmax is well-defined
    seen, uniq = set(), []
    for k, ts, v in right:
        if (k, ts) not in seen:
            seen.add((k, ts))
            uniq.append((k, ts, v))
    ldf = spark.createDataFrame(left, "user_id int, ts timestamp, event_id int")
    rdf = spark.createDataFrame(uniq, "user_id int, ts timestamp, val double")
    got = {
        r["event_id"]: (
            None if r["ts_asof"] is None else (r["ts_asof"], r["val"])
        )
        for r in asof_join(
            ldf.repartition(7), rdf, "user_id", direction=direction
        ).collect()
    }
    assert got == _ref_asof(left, uniq, direction)


def test_asof_join_equal_ts_is_inclusive_and_tolerance_nulls(spark):
    ldf = spark.createDataFrame(
        [(1, _ts(10), 0), (1, _ts(500), 1)], "user_id int, ts timestamp, event_id int"
    )
    rdf = spark.createDataFrame(
        [(1, _ts(10), 2.0)], "user_id int, ts timestamp, val double"
    )
    rows = {
        r["event_id"]: r
        for r in asof_join(
            ldf, rdf, "user_id", tolerance_sec=3600.0
        ).collect()
    }
    assert rows[0]["val"] == 2.0  # equal ts matches
    assert rows[1]["val"] is None  # 490 min > 1 h tolerance


def test_asof_join_no_anchor_yields_nulls(spark):
    ldf = spark.createDataFrame(
        [(9, _ts(10), 0)], "user_id int, ts timestamp, event_id int"
    )
    rdf = spark.createDataFrame([], "user_id int, ts timestamp, val double")
    row = asof_join(ldf, rdf, "user_id").collect()[0]
    assert row["ts_asof"] is None and row["val"] is None
    assert row["event_id"] == 0


def test_asof_join_colliding_value_col_gets_suffix(spark):
    ldf = spark.createDataFrame(
        [(1, _ts(10), 5.0)], "user_id int, ts timestamp, val double"
    )
    rdf = spark.createDataFrame(
        [(1, _ts(5), 7.0)], "user_id int, ts timestamp, val double"
    )
    row = asof_join(ldf, rdf, "user_id").collect()[0]
    assert row["val"] == 5.0 and row["val_asof"] == 7.0


def test_asof_join_single_shuffle(spark):
    ldf = spark.createDataFrame(
        [(1, _ts(10), 0)], "user_id int, ts timestamp, event_id int"
    )
    rdf = spark.createDataFrame(
        [(1, _ts(5), 1.0)], "user_id int, ts timestamp, val double"
    )
    plan = (
        asof_join(ldf, rdf, "user_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # one exchange per union branch feeding the single window sort
    assert plan.lower().count("exchange") <= 2
    assert "sortmergejoin" not in plan.lower()


def test_sessionize_and_asof_work_on_timestamp_ntz(spark):
    # parquet event tables load as TIMESTAMP_NTZ — the gap/tolerance math
    # must be interval-based, not an epoch cast (which NTZ forbids)
    rows = [(1, _ts(0), 0), (1, _ts(29), 1), (1, _ts(120), 2)]
    df = spark.createDataFrame(
        rows, "user_id int, ts timestamp, event_id int"
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    got = {
        r["event_id"]: r["session_seq"]
        for r in sessionize(df, gap_sec=1800, tiebreak_col="event_id").collect()
    }
    assert got == {0: 1, 1: 1, 2: 2}
    rdf = spark.createDataFrame(
        [(1, _ts(25), 1.0)], "user_id int, ts timestamp, val double"
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    rows2 = {
        r["event_id"]: r["val"]
        for r in asof_join(df, rdf, "user_id", tolerance_sec=600.0).collect()
    }
    assert rows2 == {0: None, 1: 1.0, 2: None}  # 4 min ok, 95 min > 10 min tol


# -------------------------------------------------------------- interval_join


def _rand_intervals(rng, n, span=1000.0):
    out = []
    for i in range(n):
        lo = rng.uniform(0, span)
        out.append((i, lo, lo + rng.uniform(0, span / 10)))
    return out


def test_interval_join_binned_matches_broadcast(spark):
    rng = random.Random(99)
    pts = [(i, rng.uniform(0, 1100.0)) for i in range(300)]
    ivs = _rand_intervals(rng, 40)
    pdf = spark.createDataFrame(pts, "pid int, x double")
    idf = spark.createDataFrame(ivs, "iid int, lo double, hi double")
    ref = sorted(
        (r["pid"], r["iid"])
        for r in interval_join(pdf, idf, "x", "lo", "hi").collect()
    )
    for width in (10.0, 50.0, 400.0):
        got = sorted(
            (r["pid"], r["iid"])
            for r in interval_join(
                pdf, idf, "x", "lo", "hi", strategy="binned", bin_width=width
            ).collect()
        )
        assert got == ref, f"bin_width={width}"
    assert ref  # non-degenerate fixture


def test_interval_join_rejects_collisions_and_bad_args(spark):
    pdf = spark.createDataFrame([(1, 1.0)], "pid int, x double")
    idf = spark.createDataFrame([(1, 0.0, 2.0)], "pid int, lo double, hi double")
    with pytest.raises(ValueError, match="colliding"):
        interval_join(pdf, idf, "x", "lo", "hi")
    idf2 = idf.withColumnRenamed("pid", "iid")
    with pytest.raises(ValueError, match="bin_width"):
        interval_join(pdf, idf2, "x", "lo", "hi", strategy="binned")
    with pytest.raises(ValueError, match="strategy"):
        interval_join(pdf, idf2, "x", "lo", "hi", strategy="nested")


def test_interval_join_empty_and_inverted_intervals(spark):
    pdf = spark.createDataFrame([(1, 5.0)], "pid int, x double")
    idf = spark.createDataFrame(
        [(1, 9.0, 3.0)], "iid int, lo double, hi double"  # lo > hi: matches nothing
    )
    assert interval_join(pdf, idf, "x", "lo", "hi").count() == 0
    assert (
        interval_join(
            pdf, idf, "x", "lo", "hi", strategy="binned", bin_width=1.0
        ).count()
        == 0
    )
