"""Custom stateful streaming operator: conversation progress tracking with
applyInPandasWithState.

The reference's scheduler keeps per-job mutable state (state enum + retry
counters, marie/scheduler/fixtures.py:37-79) updated as events arrive. The
Structured Streaming analog is a grouped stateful map: per conv_id, track
turns seen, last turn index, char volume, and emit an updated row per
micro-batch; idle conversations are finalized via an event-time timeout.

Used with availableNow triggers this gives incremental conversation-level
rollups over a growing transcripts directory without reprocessing old
files (checkpointed offsets + state store).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "n_turns long, max_turn int, n_chars long"
OUTPUT_SCHEMA = (
    "conv_id string, n_turns long, max_turn int, n_chars long, done boolean"
)


def _update(key, pdfs, state: GroupState):
    (conv_id,) = key
    # NoTimeout: with drain-style triggers (availableNow) a processing-time
    # timeout would keep scheduling batches and the query would never
    # terminate; finalization is the reader's job (done = state absent)
    n_turns, max_turn, n_chars = state.get if state.exists else (0, -1, 0)
    for pdf in pdfs:
        n_turns += len(pdf)
        if len(pdf):
            max_turn = max(max_turn, int(pdf["turn_idx"].max()))
            n_chars += int(pdf["text"].str.len().sum())
    state.update((n_turns, max_turn, n_chars))
    yield pd.DataFrame(
        [(conv_id, n_turns, max_turn, n_chars, False)],
        columns=["conv_id", "n_turns", "max_turn", "n_chars", "done"],
    )


def conversation_progress(transcripts_stream: DataFrame) -> DataFrame:
    """Streaming grouped-stateful rollup keyed by conv_id."""
    return (
        transcripts_stream.select("conv_id", "turn_idx", "text")
        .groupBy("conv_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
