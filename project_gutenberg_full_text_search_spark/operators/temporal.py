"""Temporal operators: sessionize, as-of join, interval (range) join.

None of these exist natively in the reference (its event handling is
plain SQL over Postgres, e.g. the access-log style rollups the search
service logs feed; full_text_search.py has no temporal plane) or in
Spark's DataFrame API — they are the classic "custom operator"
compositions this engine adds for event/training-data pipelines:

- ``sessionize``: gap-based session assignment — one shuffle on the
  entity key; the session id is a per-key running sum of gap breaks, so
  no global ordering or driver state is involved.
- ``asof_join``: for every left row, the nearest right row at-or-before
  (backward) or at-or-after (forward) its timestamp, per key. Implemented
  as union → single window pass (running last non-null), i.e. ONE shuffle
  on the key and one sort — never the quadratic
  join-on-key-then-filter-then-argmax, whose per-key cost is
  |left_k| × |right_k| and which collapses on hot keys.
- ``interval_join``: point-in-interval join. Small interval tables are
  broadcast (Spark then uses a nested-loop against the broadcast side —
  fine for dimension-sized band tables); large ones go through bucket
  binning so the join is an equi-join on bucket id plus a residual range
  filter, which scales to interval tables far beyond driver memory.

All three are pure DataFrame compositions — no UDFs, fully
whole-stage-codegen'd except the window sorts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sessionize(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_sec: int = 1800,
    tiebreak_col: str | None = None,
    out_col: str = "session_seq",
) -> DataFrame:
    """Assign gap-based session numbers per key.

    A new session starts at a row whose gap since the previous row of the
    same key is STRICTLY greater than ``gap_sec`` (a gap of exactly
    ``gap_sec`` stays in-session), or at the key's first row. The output
    adds ``out_col``: a dense 1-based per-key sequence, so
    (key, session_seq) identifies a session.

    Scale: one shuffle on ``key_col``; both window expressions (the lag
    and the running sum) share the same partitioning+ordering so Catalyst
    plans a single sort. Session numbering is per-key, so there is no
    global coordination and skew is bounded by the hottest key's row
    count (per-key work is a linear scan).

    ``tiebreak_col`` breaks equal-timestamp ordering deterministically
    (recommended whenever (key, ts) is not unique).
    """
    order = [F.col(ts_col).asc()]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(key_col).orderBy(*order)
    prev_ts = F.lag(F.col(ts_col)).over(w)
    # interval comparison, not epoch casts: exact to the microsecond and
    # valid for both TIMESTAMP and TIMESTAMP_NTZ (parquet) columns
    gap = F.expr(f"INTERVAL '{float(gap_sec)}' SECOND")
    brk = F.when(
        prev_ts.isNull() | (F.col(ts_col) - prev_ts > gap),
        F.lit(1),
    ).otherwise(F.lit(0))
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        df.withColumn("_brk", brk)
        .withColumn(out_col, F.sum("_brk").over(running).cast("bigint"))
        .drop("_brk")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance_sec: float | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: attach to every left row the single nearest right
    row of the same key at-or-before (``backward``) / at-or-after
    (``forward``) its timestamp; ``None``s when no such row exists
    (left-outer semantics). ``tolerance_sec`` additionally nulls matches
    farther than that many seconds away.

    Matched columns come back as ``{right_ts}{suffix}`` plus each value
    column under its own name, suffixed only on collision with a left
    column.

    Equal timestamps on opposite sides match (inclusive). If the right
    side has several rows at one (key, ts), the one with the greatest
    (backward) / least (forward) value tuple wins — deterministic, but
    usually you want to pre-aggregate such ties away.

    Scale: the two sides are unioned (right rows carry their values in a
    struct, left rows carry null) and a single running
    ``last(values, ignorenulls=True)`` window per key fills each left row
    with the nearest preceding right struct. That is ONE shuffle on
    ``key_col`` + one sort, linear per key — the same plan shape Spark
    gives a windowed dedup, and the standard scalable formulation (vs the
    naive equi-join + argmax, which is quadratic on hot keys).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (key_col, right_ts)]

    rv = F.struct(
        F.col(right_ts).alias("_rts"), *[F.col(c) for c in value_cols]
    )
    r2 = right.select(
        F.col(key_col).alias("_k"),
        F.col(right_ts).alias("_ts"),
        rv.alias("_rv"),
        F.lit(0).alias("_side"),
    )
    rv_type = r2.schema["_rv"].dataType
    l2 = left.select(
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
        F.col(key_col).alias("_k"),
        F.col(left_ts).alias("_ts"),
    )
    lrow_type = l2.schema["_lrow"].dataType
    l2 = l2.withColumn("_rv", F.lit(None).cast(rv_type)).withColumn(
        "_side", F.lit(1)
    )
    r2 = r2.withColumn("_lrow", F.lit(None).cast(lrow_type))
    u = l2.unionByName(r2)

    # Backward: ascending time; at equal ts right rows (_side 0) sort
    # before left rows so an equal-ts anchor is visible to the left row;
    # _rv as final key makes the winner among same-ts anchors the max
    # value tuple. Forward mirrors it with descending time.
    if direction == "backward":
        order = [F.col("_ts").asc(), F.col("_side").asc(), F.col("_rv").asc()]
    else:
        order = [F.col("_ts").desc(), F.col("_side").asc(), F.col("_rv").desc()]
    w = (
        Window.partitionBy("_k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.withColumn("_m", F.last("_rv", ignorenulls=True).over(w)).filter(
        F.col("_side") == 1
    )
    if tolerance_sec is not None:
        tol = F.expr(f"INTERVAL '{float(tolerance_sec)}' SECOND")
        neg_tol = F.expr(f"INTERVAL '-{float(tolerance_sec)}' SECOND")
        diff = F.col("_ts") - F.col("_m._rts")
        filled = filled.withColumn(
            "_m", F.when((diff <= tol) & (diff >= neg_tol), F.col("_m"))
        )

    out_cols = [F.col(f"_lrow.{c}").alias(c) for c in left.columns]
    out_cols.append(F.col("_m._rts").alias(f"{right_ts}{suffix}"))
    for c in value_cols:
        name = f"{c}{suffix}" if c in left.columns else c
        out_cols.append(F.col(f"_m.{c}").alias(name))
    return filled.select(*out_cols)


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    strategy: str = "broadcast",
    bin_width: float | None = None,
) -> DataFrame:
    """Join every point row to every interval row with
    ``lo <= point <= hi`` (inner, inclusive on both ends; intervals with
    ``lo > hi`` match nothing). Output = point columns + interval columns
    (names must not collide).

    ``strategy``:

    - ``broadcast`` — for dimension-sized interval tables: broadcast +
      theta-join; Spark executes it as a nested loop against the
      broadcast side, which is the right plan when |intervals| is small.
    - ``binned`` — for large interval tables: each interval is exploded
      to the ``bin_width``-wide buckets it overlaps, each point hashed to
      its single bucket, and the join becomes a shuffled EQUI-join on
      bucket id plus the residual range filter. No row is duplicated in
      the output (an interval appears once per bucket but a point lives
      in exactly one bucket). Choose ``bin_width`` near the typical
      interval length: wider bins → fewer interval replicas but more
      false candidates per bucket; at 100 TB this is the knob that keeps
      the shuffle linear instead of |points| × |intervals|.
    """
    dup = set(points.columns) & set(intervals.columns)
    if dup:
        raise ValueError(f"colliding column names between sides: {sorted(dup)}")
    cond = (F.col(point_col) >= F.col(lo_col)) & (
        F.col(point_col) <= F.col(hi_col)
    )
    if strategy == "broadcast":
        return points.join(F.broadcast(intervals), cond, "inner")
    if strategy != "binned":
        raise ValueError(f"strategy must be broadcast|binned, got {strategy!r}")
    if not bin_width or bin_width <= 0:
        raise ValueError("binned strategy requires a positive bin_width")

    width = float(bin_width)
    ivals = intervals.filter(F.col(lo_col) <= F.col(hi_col))
    lo_bin = F.floor(F.col(lo_col).cast("double") / width).cast("bigint")
    hi_bin = F.floor(F.col(hi_col).cast("double") / width).cast("bigint")
    binned_ivals = ivals.withColumn(
        "_bin", F.explode(F.sequence(lo_bin, hi_bin))
    )
    binned_points = points.withColumn(
        "_bin", F.floor(F.col(point_col).cast("double") / width).cast("bigint")
    )
    return (
        binned_points.join(binned_ivals, on="_bin", how="inner")
        .filter(cond)
        .drop("_bin")
    )
