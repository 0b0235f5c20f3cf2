"""Custom stateful streaming operator via ``applyInPandasWithState``.

``session_window`` / windowed aggregates cover the declarative
cases; this is the escape hatch for state machines they can't
express. The example operator keeps one state row per user —
running event count, running value sum, and the timestamp of the
last event — and emits the updated snapshot each micro-batch (the
streaming form of a per-key running aggregate with arbitrary
transition logic).

Scale notes: state is keyed by user_id — Spark hash-partitions the
state store across executors, so state size scales horizontally;
each micro-batch touches only the keys present in that batch
(Arrow-batched, one pandas frame per key-batch). A production run
adds a timeout (``GroupStateTimeout.ProcessingTimeTimeout``) to
evict idle users; the synthetic feed is finite so the test variant
keeps NoTimeout.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

USER_STATS_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("last_ts_micros", T.LongType()),
    ]
)

USER_STATS_STATE = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("last_ts_micros", T.LongType()),
    ]
)


def _update_user_stats(
    key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, total, last = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        micros = (pdf["ts"].astype("int64") // 1000).max()
        last = max(last, int(micros))
    state.update((n, total, last))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "sum_value": [total],
            "last_ts_micros": [last],
        }
    )


def user_stats_stateful(stream: DataFrame) -> DataFrame:
    """Per-user running (count, sum, last-seen) via
    applyInPandasWithState — emits the updated state snapshot for
    every user present in each micro-batch."""
    return (
        stream.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_stats,
            USER_STATS_OUTPUT,
            USER_STATS_STATE,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )
