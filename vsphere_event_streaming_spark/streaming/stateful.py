"""Custom stateful streaming operator: per-key sessionization.

The engine's UDTF-with-state surface (SURVEY §2.9 T6 / §2.10):
``applyInPandasWithState`` keeps one small state row per key in
Spark's state store and uses **event-time timeouts** to close sessions
when the watermark passes the inactivity gap — the pattern for any
custom stateful operator Spark lacks natively (sessionizers, CEP-ish
trackers, per-entity accumulators).

Scale posture: state is O(active keys), not O(events); each key's
state is a 3-field row, evicted on timeout. The per-batch work is an
Arrow-batched pandas function — no row-at-a-time Python. Contrast
``streaming/windows.py::tumbling_counts`` (built-in windowed agg —
always prefer it when the built-in expresses the semantics;
``session_window`` covers gap-sessions natively, and this module is
the template for semantics the built-ins genuinely can't express).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def sessionize(
    stream: DataFrame,
    key_col: str = "user_name",
    ts_col: str = "created_time",
    gap_seconds: int = 30,
    watermark: str = "0 seconds",
) -> DataFrame:
    """Emit one row per closed session: (key, start, end, n_events).

    A session closes when a key sees no event for ``gap_seconds`` of
    event time. Closure happens either inline (a later event arrives
    past the gap → the previous run is emitted immediately) or via
    event-time timeout (the watermark passes ``last_seen + gap`` with
    no new event → the state store wakes the key and the session is
    flushed). The timeout path is what bounds state: idle keys leave
    the store instead of accumulating forever.
    """
    out_schema = (
        f"{key_col} string, session_start timestamp, "
        "session_end timestamp, n_events bigint"
    )
    state_schema = "session_start timestamp, session_end timestamp, n bigint"

    def fn(
        key: tuple,
        pdfs: Iterator[Any],
        state: GroupState,
    ) -> Iterator[Any]:
        import pandas as pd

        def out(s, e, n):
            return pd.DataFrame(
                {
                    key_col: [key[0]],
                    "session_start": [s],
                    "session_end": [e],
                    "n_events": [n],
                }
            )

        if state.hasTimedOut:
            s, e, n = state.get
            state.remove()
            yield out(s, e, n)
            return

        ts = (
            pd.concat([pdf[ts_col] for pdf in pdfs])
            .sort_values()
            .reset_index(drop=True)
        )
        if state.exists:
            s, e, n = state.get
        else:
            s, e, n = None, None, 0
        for t in ts:
            if e is not None and (t - e).total_seconds() > gap_seconds:
                yield out(s, e, n)
                s, n = t, 0
            if s is None:
                s = t
            e = t
            n += 1
        state.update((s, e, n))
        # wake this key once the watermark passes end-of-session + gap
        state.setTimeoutTimestamp(
            int(e.timestamp() * 1000) + gap_seconds * 1000
        )

    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn,
            out_schema,
            state_schema,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
