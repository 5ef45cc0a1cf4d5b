"""Structured Streaming operators: watermarked windowed aggregation and a
custom stateful exact-dedup via ``applyInPandasWithState``.

The reference's only "streaming" is its timer-driven MV refresh (covered
by streaming/incremental.py); these are the engine-level stream operators
a training-data ingest pipeline needs on top:

* ``windowed_rollup`` — event-time tumbling/sliding window aggregation
  with a watermark, so late data inside the lateness bound is folded in
  and data later than the bound is dropped deterministically (the only
  way state stays BOUNDED on an unbounded stream: without the watermark,
  every window ever opened lives in the state store forever).
* ``stream_dedup_exact`` — keep only the FIRST occurrence of each
  content hash across the whole stream, with per-key occurrence counts,
  as an ``applyInPandasWithState`` stateful operator. Built-in
  ``dropDuplicates`` can do the keep-first part but cannot report how
  many duplicates it suppressed; the custom state (first_seen flag +
  running count) is the shape every bespoke stateful operator takes.
  State is keyed by the content hash itself → the state store scales
  with DISTINCT documents and shards across executors by key, exactly
  like the batch exact-dedup's groupBy.

Both run identically under ``trigger(availableNow=True)`` for batch-like
catch-up and continuous micro-batches in production; checkpointing makes
watermark + state exactly-once across restarts (tested).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def windowed_rollup(
    events: DataFrame,
    window: str = "1 day",
    slide: str | None = None,
    watermark: str = "2 days",
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Event-time windowed rollup (count, sum, avg per window × type).

    Works on a streaming OR batch DataFrame (same plan; watermark is a
    no-op in batch — which is what makes the batch twin an oracle for the
    streaming run's on-time subset).
    """
    w = (
        F.window(F.col(ts_col), window, slide)
        if slide
        else F.window(F.col(ts_col), window)
    )

    # half_away_col, not F.round: sum/avg of limited-precision values can
    # land exactly on the .00005 half grid, where Spark's shortest-repr
    # half-up disagrees with the DuckDB oracle's binary rounding —
    # observed on the sf0.001 avg_value (38.3788 vs 38.3787; a
    # pre-round-6 latent divergence caught by the full small-SF sweep).
    from project_gutenberg_full_text_search_spark.functions.rounding import (
        half_away_col as _round4_binary,
    )

    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        src.groupBy(w.alias("win"), F.col(type_col))
        .agg(
            F.count(F.lit(1)).alias("n"),
            _round4_binary(F.sum(value_col)).alias("sum_value"),
            _round4_binary(F.avg(value_col)).alias("avg_value"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col(type_col),
            "n",
            "sum_value",
            "avg_value",
        )
    )


_DEDUP_STATE = T.StructType([T.StructField("count", T.LongType())])


def _dedup_out_schema(df: DataFrame) -> T.StructType:
    return T.StructType(
        list(df.schema.fields) + [T.StructField("batch_dupes", T.LongType())]
    )


def stream_dedup_exact(
    stream_df: DataFrame,
    text_col: str = "text",
    hash_col: str = "_content_hash",
    order_col: str | None = "doc_id",
) -> DataFrame:
    """First-occurrence filter over a stream, keyed by content hash.

    Emits each distinct content exactly once (its first arrival), tagged
    with ``batch_dupes`` = how many same-hash duplicates arrived in the
    SAME micro-batch and were suppressed with it (0 for a clean first
    sight). Re-occurrences in later batches are suppressed entirely — the
    per-key state (occurrence count) survives in the checkpointed state
    store across batches and restarts.

    Survivor choice within a micro-batch is DETERMINISTIC: row order
    inside a shuffled group is not stable across runs/restarts, so the
    survivor is the row with the smallest ``order_col`` (doc_id by
    default) among the batch's duplicates — reruns of the same input emit
    the same rows.  Pass ``order_col=None`` only when no stable key
    exists; the survivor's non-key columns are then arbitrary per run
    (first physical row).
    """
    hashed = stream_df.withColumn(hash_col, F.md5(F.col(text_col)))
    out_schema = _dedup_out_schema(hashed)
    if order_col is not None and order_col not in hashed.columns:
        raise ValueError(
            f"order_col {order_col!r} not in stream columns {hashed.columns}; "
            "pass order_col=None to accept an arbitrary within-batch survivor"
        )

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (count,) = state.get if state.exists else (0,)
        best = None  # (order key, single-row frame)
        batch_n = 0
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            if count == 0:
                if order_col is None:
                    if best is None:
                        best = (None, pdf.iloc[[0]].copy())
                else:
                    i = pdf[order_col].idxmin()
                    k = pdf[order_col].loc[i]
                    if best is None or k < best[0]:
                        best = (k, pdf.loc[[i]].copy())
            batch_n += len(pdf)
        if best is not None:
            first_rows = best[1]
            first_rows["batch_dupes"] = batch_n - 1
            yield first_rows
        state.update((count + batch_n,))

    return hashed.groupBy(hash_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=_DEDUP_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
