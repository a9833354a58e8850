"""Stateful streaming sessionization over transcript turns.

The reference's investigation workflows group a conversation's turns into
activity sessions (gap-based, like OpenSearch's session windows on
dashboards); batch-side that's a window-function gap split, streaming-side
it needs custom keyed state.  This is the engine's
``applyInPandasWithState`` exemplar: per conv_id, turns accumulate into an
open session that closes when event time advances past ``gap`` (or the
state times out after the watermark passes), emitting one summary row per
session.

Batch and streaming formulations are semantically aligned (tested: the
streaming availableNow run over the same rows emits the same closed
sessions as the batch window split).
"""

from __future__ import annotations

from typing import Any, Iterable, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)
from pyspark.sql.window import Window

SESSION_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("session_idx", IntegerType()),
        StructField("n_turns", LongType()),
        StructField("t_start", TimestampType()),
        StructField("t_end", TimestampType()),
    ]
)

# state: running session accumulator per conv_id
_STATE_SCHEMA = StructType(
    [
        StructField("session_idx", IntegerType()),
        StructField("n_turns", LongType()),
        StructField("t_start_us", LongType()),
        StructField("t_end_us", LongType()),
    ]
)


def sessionize_batch(df: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Batch formulation: session = cumulative count of gap breaks within
    conv (window functions, one shuffle on conv_id)."""
    w = Window.partitionBy("conv_id").orderBy("ts")
    # NTZ parquet timestamps can't cast straight to long under ANSI;
    # route through timestamp_ltz (no-op for LTZ, UTC session for NTZ)
    epoch = F.col("ts").cast("timestamp_ltz").cast("long")
    gap = epoch - F.lag(epoch).over(w)
    brk = F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0)
    withs = df.withColumn("session_idx", F.sum(brk).over(w).cast("int") - 1)
    return (
        withs.groupBy("conv_id", "session_idx")
        .agg(
            F.count("*").alias("n_turns"),
            F.min("ts").alias("t_start"),
            F.max("ts").alias("t_end"),
        )
        .orderBy("conv_id", "session_idx")
    )


def _session_fn(gap_minutes: int):
    gap_us = gap_minutes * 60 * 1_000_000

    def fn(
        key: Tuple[str], pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (conv_id,) = key
        if state.hasTimedOut:
            if state.exists:
                sidx, n, t0, t1 = state.get
                state.remove()
                yield _emit(conv_id, sidx, n, t0, t1)
            return
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values("ts")
        ts_us = rows["ts"].astype("int64").to_numpy()  # epoch micros... ns
        ts_us = ts_us // 1000  # pandas datetime64[ns] -> us
        out = []
        if state.exists:
            sidx, n, t0, t1 = state.get
        else:
            sidx, n, t0, t1 = 0, 0, None, None
        for t in ts_us:
            # Rows are sorted within a micro-batch only; a late-but-within-
            # watermark row from a later batch may carry t <= t1.  Merge it
            # monotonically (t0=min, t1=max) — only a forward move past the
            # gap closes the session, so a late row can never shrink the
            # open session's end and cause a spurious split.
            if n and t > t1 and t - t1 > gap_us:
                out.append((sidx, n, t0, t1))
                sidx, n, t0, t1 = sidx + 1, 0, None, None
            if n == 0:
                t0 = t1 = int(t)
            else:
                t0 = min(t0, int(t))
                t1 = max(t1, int(t))
            n += 1
        state.update((int(sidx), int(n), int(t0), int(t1)))
        # close the open session once the watermark passes its end + gap
        state.setTimeoutTimestamp(int(t1 // 1000) + gap_minutes * 60 * 1000)
        for s in out:
            yield _emit(conv_id, *s)

    return fn


def _emit(conv_id: str, sidx: int, n: int, t0_us: int, t1_us: int) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "conv_id": [conv_id],
            "session_idx": [sidx],
            "n_turns": [n],
            "t_start": [pd.Timestamp(t0_us, unit="us")],
            "t_end": [pd.Timestamp(t1_us, unit="us")],
        }
    )


def sessionize_stream(stream_df: DataFrame, gap_minutes: int = 30, watermark: str = "2 hours"):
    """Streaming formulation: event-time watermark + per-conv keyed state;
    sessions emit when a gap closes them in-stream or when the state times
    out past the watermark (late data inside the watermark still joins its
    session — the reference's event-time routing behavior)."""
    return (
        stream_df.withWatermark("ts", watermark)
        .groupBy("conv_id")
        .applyInPandasWithState(
            _session_fn(gap_minutes),
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
