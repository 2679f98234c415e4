"""Custom stateful streaming operators (SURVEY §2.11).

The reference's stateful stream decorators (solr/solrj/.../io/stream/)
run over complete result sets; the Structured-Streaming-native
equivalent for UNBOUNDED inputs is applyInPandasWithState: per-key
state the engine checkpoints and hands back every micro-batch. The
session-window aggregator below is the canonical training-pipeline
shape (the events_sessionize batch query, made incremental).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_OUT_SCHEMA = ("user_id string, session_start double, "
                      "session_end double, n_events long")
SESSION_STATE_SCHEMA = "start double, last double, n long"


def sessionize_stream(events: DataFrame, gap_seconds: int = 3600,
                      user_col: str = "user_id",
                      epoch_col: str = "epoch") -> DataFrame:
    """Incremental gap-based sessionization over a STREAMING frame of
    (user_id, epoch seconds) events.

    Per-user state = the open session (start, last event, count),
    checkpointed by the engine. A session CLOSES — and is emitted —
    when a later event arrives more than ``gap_seconds`` after it
    (deterministic: no wall-clock timeouts; the final open session per
    user stays in state). Arbitrary-state semantics the built-in
    session_window cannot express live here: this operator is the
    plug-point for richer per-key state (counters, dedup sets,
    model features).
    """

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        (user,) = key
        if state.exists:
            start, last, n = state.get
        else:
            start = last = None
            n = 0
        closed: list[tuple] = []
        for pdf in pdfs:
            for t in sorted(pdf[epoch_col].astype(float)):
                if last is not None and t - last > gap_seconds:
                    closed.append((user, start, last, n))
                    start, n = None, 0
                if start is None:
                    start = t
                last = t
                n += 1
        state.update((start, last, n))
        if closed:
            yield pd.DataFrame(
                closed,
                columns=["user_id", "session_start", "session_end",
                         "n_events"])

    return events.groupBy(user_col).applyInPandasWithState(
        fn,
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
