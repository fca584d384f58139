"""Custom stateful streaming operator: inactivity-gap sessionization.

``applyInPandasWithState`` over a user-keyed event stream — the engine's
demonstration of arbitrary stateful processing (the pattern for streaming
coref-state, incremental entity linking caches, etc.).  State per user: the
open session's (start, last_ts, n_events); an event later than ``gap``
seconds closes the session and emits it.  Timed-out state flushes via
processing-time timeout so idle users still emit their final session.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, n_events long"
)
STATE_SCHEMA = "start long, last long, n long"
GAP_SECONDS = 1800


def _sessionize(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    with_timeout: bool = True,
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        if state.exists:
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start, unit="s")],
                    "session_end": [pd.Timestamp(last, unit="s")],
                    "n_events": [n],
                }
            )
        return

    ts_all = []
    for pdf in pdfs:
        ts_all.extend(int(t.timestamp()) for t in pdf["ts"])
    ts_all.sort()

    start, last, n = state.get if state.exists else (None, None, 0)
    closed = []
    for t in ts_all:
        if start is None:
            start, last, n = t, t, 1
        elif t - last > GAP_SECONDS:
            closed.append((start, last, n))
            start, last, n = t, t, 1
        else:
            last, n = t, n + 1
    state.update((start, last, n))
    if with_timeout:
        state.setTimeoutDuration(GAP_SECONDS * 1000)
    if closed:
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(closed),
                "session_start": [pd.Timestamp(s, unit="s") for s, _, _ in closed],
                "session_end": [pd.Timestamp(e, unit="s") for _, e, _ in closed],
                "n_events": [c for _, _, c in closed],
            }
        )


def streaming_sessions(events_stream: DataFrame, idle_timeout: bool = True) -> DataFrame:
    """events(ts, user_id, ...) stream -> closed-session stream.

    ``idle_timeout=True`` (production default) flushes idle users' final
    sessions via a processing-time timeout.  Pass False for bounded
    drain-and-stop runs (availableNow catch-up jobs, the correctness gate):
    with a timeout registered, the availableNow trigger keeps scheduling
    empty micro-batches to poll for timeouts that a drained source can
    never fire, so the query never self-terminates — and since the timeout
    branch cannot fire under availableNow anyway (processing time never
    advances GAP_SECONDS within the drain), disabling it changes no
    emitted row, only the termination behavior."""
    import functools

    return (
        events_stream.select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            functools.partial(_sessionize, with_timeout=idle_timeout),
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if idle_timeout
                else GroupStateTimeout.NoTimeout
            ),
        )
    )
