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
    key_type: str = "string",
) -> DataFrame:
    """Emit one row per closed session: (key, start, end, n_events).

    A session closes when a key sees no event for ``gap_seconds`` of
    event time. Closure happens either inline (a later event arrives
    past the gap → the previous run is emitted immediately) or via
    event-time timeout (the watermark passes ``last_seen + gap`` with
    no new event → the state store wakes the key and the session is
    flushed). The timeout path is what bounds state: idle keys leave
    the store instead of accumulating forever.

    Semantics and preconditions:
    - Null event times are dropped (a record with no time can't join a
      session; the watermark filter lets NULLs through, so the drop
      happens here).
    - Out-of-order events within the allowed lateness merge into the
      open session (start/end expand to cover them); a late event can
      NOT reopen a session already emitted by the inline close — with
      the default ``watermark='0 seconds'`` (in-order input) closes are
      exact; with real lateness, prefer a watermark ≥ the expected
      disorder and accept that an inline-closed session is final.
    - The session timezone must be UTC (the engine pins it —
      session.tune); event-time epochs are computed treating naive
      timestamps as UTC, matching the JVM watermark clock only then.
    """
    out_schema = (
        f"{key_col} {key_type}, session_start timestamp, "
        "session_end timestamp, n_events bigint"
    )
    state_schema = "session_start timestamp, session_end timestamp, n bigint"

    def fn(
        key: tuple,
        pdfs: Iterator[Any],
        state: GroupState,
    ) -> Iterator[Any]:
        import pandas as pd

        def epoch_ms(t) -> int:
            # naive timestamps are UTC by engine contract (tune() pins
            # the session tz); state-restored datetimes go through the
            # same conversion so both code paths agree
            ts_ = pd.Timestamp(t)
            if ts_.tzinfo is None:
                ts_ = ts_.tz_localize("UTC")
            return int(ts_.timestamp() * 1000)

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
            .dropna()  # timeless records can't join a session
            .sort_values()
            .reset_index(drop=True)
        )
        if state.exists:
            s, e, n = state.get
        else:
            s, e, n = None, None, 0
        if len(ts) == 0 and e is None:
            return
        for t in ts:
            if e is not None and (t - e).total_seconds() > gap_seconds:
                yield out(s, e, n)
                s, e, n = t, None, 0
            if s is None:
                s = t
            # late in-order-violating events merge into the open
            # session: expand, never move the end backward
            s = min(s, t)
            e = t if e is None else max(e, t)
            n += 1
        state.update((s, e, n))
        # wake this key once the watermark passes end-of-session + gap
        state.setTimeoutTimestamp(epoch_ms(e) + gap_seconds * 1000)

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


def running_user_stats(
    stream: DataFrame, key_col: str = "user_name", val_col: str = "key"
) -> DataFrame:
    """Per-key lifetime event count + max value seen, emitted per batch.

    API note: Spark 4's forward path for custom stateful operators is
    ``transformWithStateInPandas`` (typed ValueState/ListState/MapState
    handles, TTL, timers); a ``StatefulProcessor`` port of this
    operator is mechanical (``init`` → getValueState,
    ``handleInputRows`` → the same fold). Its state server requires
    ``google.protobuf`` at runtime, which this environment does not
    ship, so the repo carries only this ``applyInPandasWithState``
    form — the one that runs (and is tested) anywhere pyspark runs.

    State is one 2-long row per key — O(distinct keys) regardless of
    stream length; each micro-batch touches only the keys it contains.
    """
    out_schema = f"{key_col} string, n_events bigint, max_key bigint"
    state_schema = "n bigint, mk bigint"

    def fn(
        key: tuple,
        pdfs: Iterator[Any],
        state: GroupState,
    ) -> Iterator[Any]:
        import pandas as pd

        n, mk = state.get if state.exists else (0, -1)
        for pdf in pdfs:
            n += len(pdf)
            if len(pdf):
                mk = max(mk, int(pdf[val_col].max()))
        state.update((n, mk))
        yield pd.DataFrame(
            {key_col: [key[0]], "n_events": [n], "max_key": [mk]}
        )

    return stream.groupBy(key_col).applyInPandasWithState(
        fn,
        out_schema,
        state_schema,
        "update",
        GroupStateTimeout.NoTimeout,
    )
