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
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import DoubleType, LongType, StringType, StructField, StructType

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


def make_running_totals_fn(idle_timeout_ms: int | None = None):
    """Build the per-group update function, closing over the timeout config.

    Timeout protocol (ProcessingTimeTimeout): when a key has seen no data for
    ``idle_timeout_ms``, Spark invokes the function once more with an empty
    batch iterator and ``state.hasTimedOut=True`` — that invocation must
    ``state.remove()`` and emit nothing, otherwise the "eviction" would
    re-store the state and re-emit a stale row. Every data invocation re-arms
    the clock via ``state.setTimeoutDuration``.
    """

    def _update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()  # evict: drop state, emit nothing
            return
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "value_sum": [round(total, 2)]})

    return _update


# Default (no-timeout) instance, kept for direct use in tests/plans.
_update_running_totals = make_running_totals_fn(None)


def running_totals(
    events: DataFrame,
    key_col: str = "user_id",
    idle_timeout_ms: int | None = None,
) -> DataFrame:
    """Per-key running (count, sum) across micro-batches.

    Emits the updated cumulative row for every key seen in each batch —
    downstream sinks see a changelog of per-user totals. With
    ``idle_timeout_ms``, keys idle longer than the timeout are evicted
    (bounded state) via the timeout protocol in ``make_running_totals_fn``.
    """
    timeout = GroupStateTimeout.ProcessingTimeTimeout if idle_timeout_ms else GroupStateTimeout.NoTimeout
    return events.groupBy(key_col).applyInPandasWithState(
        make_running_totals_fn(idle_timeout_ms),
        outputStructType=RUNNING_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )


def running_totals_v2(
    df: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
    ttl_ms: int | None = None,
) -> DataFrame:
    """``transformWithStateInPandas`` (Spark 4 state API v2) twin of
    ``running_totals``: per-key cumulative count/sum, update mode.

    v2 advantages over ``applyInPandasWithState``: named state variables
    with per-state TTL handled by the state store itself (no manual
    setTimeoutDuration/hasTimedOut dance like the v1 operator above),
    multiple state variables per key, and timers. State stays bounded by
    the live-key set via ``ttl_ms``.

    The processor class is defined locally: it must travel to the state
    worker via cloudpickle, and importing this module must not require the
    v2 API to exist on older Sparks.

    Environment note: executing this operator requires ``google.protobuf``
    (the v2 state-server wire protocol) and a column-family-capable state
    store (RocksDB). EXECUTED in CI since round 6: the test suite vendors
    the machine's public pure-Python protobuf runtime
    (``tests/pb_vendor/sitecustomize.py`` — exported on PYTHONPATH so the
    forked state workers get it too) and scopes
    ``spark.sql.streaming.stateStore.providerClass`` to RocksDB for the
    test; state is asserted to survive a query restart via checkpoint
    (``test_stateful_v2_running_totals_across_batches``).
    """
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class _RunningTotalsV2(StatefulProcessor):
        def init(self, handle) -> None:
            self._state = handle.getValueState("totals", "n BIGINT, total DOUBLE", ttl_ms)

        def handleInputRows(self, key, rows, timerValues):
            n, total = 0, 0.0
            if self._state.exists():
                n, total = self._state.get()
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._state.update((int(n), float(total)))
            yield pd.DataFrame({"user_id": [key[0]], "n_events": [int(n)], "value_sum": [float(total)]})

        def close(self) -> None:
            pass

    return (
        df.select(key_col, value_col)
        .groupBy(key_col)
        .transformWithStateInPandas(
            statefulProcessor=_RunningTotalsV2(),
            outputStructType=RUNNING_TOTALS_SCHEMA,
            outputMode="Update",
            timeMode="ProcessingTime",
        )
    )


SESSION_FLUSH_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("value_sum", DoubleType()),
    ]
)


def session_collect_v2(
    df: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
    gap_ms: int = 2_000,
) -> DataFrame:
    """Timer-flushed session accumulator on the state API v2 — the shape
    that exercises the parts of ``transformWithStateInPandas`` the
    ``running_totals_v2`` twin does not: LIST state (per-key value buffer)
    and REGISTERED TIMERS (the v2 replacement for the v1
    ``setTimeoutDuration`` dance — explicit expiry timestamps, a dedicated
    ``handleExpiredTimer`` callback, and ``deleteTimer``/``listTimers``
    bookkeeping).

    Semantics: values buffer silently per key while events keep arriving;
    when a key goes quiet for ``gap_ms`` of processing time its timer
    fires, the buffered session is EMITTED as one (n_events, value_sum)
    row, and both state and timer are cleared — the custom-session shape
    whose v1 spelling is ``make_running_totals_fn``'s timeout protocol.

    Scale: state per key = the open session's value list, bounded by
    session length; timers live in the state store alongside (RocksDB
    column families — the reason v2 needs that provider). Output appears
    only on session close, so downstream sees completed sessions, not a
    changelog.
    """
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class _SessionCollect(StatefulProcessor):
        def init(self, handle) -> None:
            self._buf = handle.getListState("session_values", "v DOUBLE")
            self._handle = handle

        def handleInputRows(self, key, rows, timerValues):
            for pdf in rows:
                self._buf.appendList(
                    [(float(v),) for v in pdf[value_col].tolist()]
                )
            # re-arm: one live timer per key (drop any earlier deadline)
            for t in self._handle.listTimers():
                self._handle.deleteTimer(t)
            self._handle.registerTimer(
                timerValues.getCurrentProcessingTimeInMs() + gap_ms
            )
            return iter(())  # nothing emits until the session closes

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            vals = [row[0] for row in self._buf.get()]
            self._buf.clear()
            if vals:
                yield pd.DataFrame(
                    {
                        "user_id": [key[0]],
                        "n_events": [len(vals)],
                        "value_sum": [round(float(sum(vals)), 2)],
                    }
                )

        def close(self) -> None:
            pass

    return (
        df.select(key_col, value_col)
        .groupBy(key_col)
        .transformWithStateInPandas(
            statefulProcessor=_SessionCollect(),
            outputStructType=SESSION_FLUSH_SCHEMA,
            outputMode="Append",
            timeMode="ProcessingTime",
        )
    )


TYPE_COUNTS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("n", LongType()),
    ]
)


def type_counts_v2(
    df: DataFrame,
    key_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-key per-category running counts on MAP state — the third v2
    state primitive (value: ``running_totals_v2``; list + timers:
    ``session_collect_v2``; map: here). MapState gives point lookups and
    per-entry updates WITHOUT deserializing the whole structure — exactly
    what a per-key categorical counter needs: a value-state dict would
    rewrite every category on every event, and the state store (RocksDB
    column families) can instead touch one (key, mapKey) pair.

    Update mode: each batch emits only the (key, category, new_count)
    entries that batch changed — a changelog of the counter map.
    """
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class _TypeCounts(StatefulProcessor):
        def init(self, handle) -> None:
            self._m = handle.getMapState("type_counts", "t STRING", "n BIGINT")

        def handleInputRows(self, key, rows, timerValues):
            import collections

            delta: dict[str, int] = collections.Counter()
            for pdf in rows:
                delta.update(pdf[type_col].value_counts().to_dict())
            out_t, out_n = [], []
            for t, d in sorted(delta.items()):
                prev = self._m.getValue((t,))[0] if self._m.containsKey((t,)) else 0
                n = int(prev) + int(d)
                self._m.updateValue((t,), (n,))
                out_t.append(t)
                out_n.append(n)
            yield pd.DataFrame(
                {"user_id": [key[0]] * len(out_t), "event_type": out_t, "n": out_n}
            )

        def close(self) -> None:
            pass

    return (
        df.select(key_col, type_col)
        .groupBy(key_col)
        .transformWithStateInPandas(
            statefulProcessor=_TypeCounts(),
            outputStructType=TYPE_COUNTS_SCHEMA,
            outputMode="Update",
            timeMode="ProcessingTime",
        )
    )


def agg_view_v2(
    df: DataFrame,
    group_col: str = "g",
    measure_cols: list[str] | None = None,
    count_col: str = "n_rows",
) -> DataFrame:
    """State-API-v2 twin of the production agg-view maintainer
    (``operators/incremental.agg_view_stream_fn``): maintain a materialized
    group-by from a stream of SIGNED contribution rows (``_sign`` ±1 +
    group + integer measures), emitting the group's current
    (count, measure sums) on every batch that touches it (update mode).

    Differences from the foreachBatch twin, by design:

    * state lives in the state store (one ValueState per group —
      ``n BIGINT`` + one BIGINT per measure, RocksDB column families)
      instead of a parquet table + the crash-safe swap protocol; the
      exactly-once replay guard is the CHECKPOINT, not ``statestore``'s
      batch-id meta — v2 is the right spelling when the view is consumed
      as a changelog, foreachBatch+parquet when it is consumed as a TABLE.
    * a group whose maintained count reaches zero emits its zero row and
      CLEARS its state (the v1 twin's ``count > 0`` retirement filter) —
      state stays bounded by the LIVE group set. No timers: retirement is
      data-driven (the zero-crossing), not time-driven; the timer surface
      is exercised by ``session_collect_v2``.

    Per batch the work is one shuffle of the batch's signed rows to their
    group partitions + an Arrow round-trip per touched group; the
    |groups|-row merge join of the foreachBatch twin disappears (the store
    IS the view). ``tests/test_streaming.py`` hash-compares the two
    maintainers on the same replayed stream.
    """
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    measures = measure_cols if measure_cols is not None else ["v"]
    gtype = dict(df.dtypes)[group_col]
    out_schema = ", ".join(
        [f"{group_col} {gtype}", f"{count_col} bigint"]
        + [f"{m} bigint" for m in measures]
    )
    state_schema = ", ".join(["n BIGINT"] + [f"m_{m} BIGINT" for m in measures])

    class _AggView(StatefulProcessor):
        def init(self, handle) -> None:
            self._state = handle.getValueState("view", state_schema)

        def handleInputRows(self, key, rows, timerValues):
            totals = list(self._state.get()) if self._state.exists() else [0] * (
                1 + len(measures)
            )
            for pdf in rows:
                sign = pdf["sign"].astype("int64")
                totals[0] += int(sign.sum())
                for i, m in enumerate(measures):
                    totals[i + 1] += int((sign * pdf[m].astype("int64")).sum())
            if totals[0] > 0:
                self._state.update(tuple(int(t) for t in totals))
            else:
                # retired group: drop the state row so the store stays
                # bounded by live groups; the zero row below tells update-
                # mode consumers to forget the key
                self._state.clear()
            out = {group_col: [key[0]], count_col: [int(totals[0])]}
            for i, m in enumerate(measures):
                out[m] = [int(totals[i + 1])]
            yield pd.DataFrame(out)

        def close(self) -> None:
            pass

    # the v2 Arrow path positionally renames underscore-leading columns
    # (`_sign` reaches the processor as `_2`), so the sign rides under a
    # plain name inside the operator
    return (
        df.select(group_col, F.col("_sign").alias("sign"), *measures)
        .groupBy(group_col)
        .transformWithStateInPandas(
            statefulProcessor=_AggView(),
            outputStructType=out_schema,
            outputMode="Update",
            timeMode="ProcessingTime",
        )
    )
