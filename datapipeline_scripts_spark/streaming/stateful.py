"""Custom stateful streaming: per-user sessionization with
`applyInPandasWithState` — the arbitrary-stateful-operator surface
(SURVEY §2.E E5; the engine-layer analogue of the reference's
long-running poll loops keeping per-task state,
/root/reference/backup.sh:140-164).

Semantics match the batch `events_session` query (30-min gap
sessionization): state = the open session per user; an event extends it
or closes it; timeouts flush sessions the stream will never extend.

Scale notes: state is one small tuple per user key, partitioned by
user_id across the cluster; the state store checkpoints incrementally.
Skewed users are the hazard → the gap logic is O(1) per event.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_S = 30 * 60

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("session_value", T.DoubleType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def sessionize(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold a user's events into gap-separated sessions, emitting each
    closed session; the open session survives in `state`."""
    (user_id,) = key
    if state.hasTimedOut:
        if state.exists:
            start_us, last_us, n, value = state.get
            state.remove()
            yield _emit(user_id, start_us, last_us, n, value)
        return

    events = pd.concat(list(batches)).sort_values("ts")
    closed: list[tuple[int, int, int, float]] = []
    if state.exists:
        start_us, last_us, n, value = state.get
    else:
        start_us = last_us = -1
        n, value = 0, 0.0
    for ts, v in zip(events["ts"], events["value"]):
        ts_us = int(ts.value // 1_000)  # pandas ns → µs
        if start_us < 0:
            start_us, last_us, n, value = ts_us, ts_us, 1, float(v)
        elif ts_us - last_us > SESSION_GAP_S * 1_000_000:
            closed.append((start_us, last_us, n, value))
            start_us, last_us, n, value = ts_us, ts_us, 1, float(v)
        else:
            last_us, n, value = ts_us, n + 1, value + float(v)
    state.update((start_us, last_us, n, value))
    state.setTimeoutDuration(SESSION_GAP_S * 1000)
    for s in closed:
        yield _emit(user_id, *s)


def _emit(user_id: int, start_us: int, last_us: int, n: int, value: float) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [user_id],
            "session_start": [pd.Timestamp(start_us, unit="us")],
            "session_end": [pd.Timestamp(last_us, unit="us")],
            "n_events": [n],
            "session_value": [round(value, 2)],
        }
    )


def sessionize_stream(events_stream: DataFrame) -> DataFrame:
    """Wire the stateful sessionizer onto a streaming events DataFrame."""
    return (
        events_stream.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            sessionize,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def run_sessionize_once(spark: SparkSession, sf_dir: str, sink_name: str) -> DataFrame:
    """Replay the events fixture through the stateful sessionizer
    (availableNow) into a memory sink; returns the emitted (closed)
    sessions. Open sessions stay in state by design — the batch twin
    `events_session` is the oracle-checked complete view."""
    from datapipeline_scripts_spark.streaming.stream_jobs import _events_stream

    import time

    q = (
        sessionize_stream(_events_stream(spark, sf_dir))
        .writeStream.format("memory")
        .queryName(sink_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        # availableNow does NOT self-terminate here: ProcessingTimeTimeout
        # keeps the query alive spinning empty "cleaning up state"
        # micro-batches while it waits to fire the open sessions' 30-min
        # timeouts, so a plain awaitTermination(300) burns its full
        # timeout (measured: 304.7 s for a replay whose data batch
        # drains in ~5 s — optimization r14, guide §1). The emitted
        # CLOSED sessions are complete once a data batch has run and
        # the source is drained (a subsequent progress with
        # numInputRows == 0 and no data available); poll for that and
        # stop. Open sessions staying in state is the documented design
        # (the batch twin is the complete view).
        deadline = time.time() + 300
        seen_data = False
        while time.time() < deadline:
            if q.awaitTermination(timeout=1):
                break
            lp = q.lastProgress
            if lp is None:
                continue
            if lp.numInputRows > 0:
                seen_data = True
            elif seen_data and not q.status["isDataAvailable"]:
                break
    finally:
        q.stop()
    return spark.table(sink_name)
