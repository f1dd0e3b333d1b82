"""Custom stateful operator on the Spark 4 state API v2
(``transformWithStateInPandas`` + ``StatefulProcessor``).

Complements ``stateful.py`` (applyInPandasWithState): the v2 API is
the forward path — typed state handles (value/list/map), optional
TTL, timers, and initial-state bootstrap. This module implements the
simplest always-on streaming primitive the reference implies but
can't express (a per-entity lifetime counter over the event stream;
the reference can only count within its 2-segment retention window,
README.md:177-184) — state here is O(keys), survives restarts via
the checkpoint, and each micro-batch emits updated totals.

Runtime dependency: the v2 state server speaks protobuf
(``google.protobuf``), which this container does not ship — the e2e
test skips when it is absent (import-gated per the environment
rules); the operator itself is complete and runs wherever pyspark's
protobuf extra is installed. ``stateful.py`` (applyInPandasWithState)
is the dependency-free fallback covering the same semantics class.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any, Iterator

from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame


class RunningUserStats(StatefulProcessor):
    """Per-key lifetime event count + max key seen, emitted per batch."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState(
            "totals", "n_events bigint, max_key bigint"
        )

    def handleInputRows(
        self, key: tuple, rows: Iterator[Any], timerValues: Any
    ) -> Iterator[Any]:
        import pandas as pd

        n, max_key = 0, -1
        for pdf in rows:
            n += len(pdf)
            if len(pdf):
                max_key = max(max_key, int(pdf["key"].max()))
        prev = self._state.get()
        if prev is not None:
            n += prev[0]
            max_key = max(max_key, prev[1])
        self._state.update((n, max_key))
        yield pd.DataFrame(
            {
                "user_name": [key[0]],
                "n_events": [n],
                "max_key": [max_key],
            }
        )

    def close(self) -> None:
        pass


def running_user_stats(
    stream: "DataFrame", key_col: str = "user_name"
) -> "DataFrame":
    """Lifetime per-key totals over a stream (update output mode).

    State is one 2-long row per key in the state store — O(distinct
    keys) regardless of stream length; each micro-batch touches only
    the keys present in that batch.
    """
    return stream.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=RunningUserStats(),
        outputStructType="user_name string, n_events bigint, max_key bigint",
        outputMode="Update",
        timeMode="None",
    )
