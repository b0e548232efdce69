"""Stateful streaming admission control: per-source document quotas with
applyInPandasWithState.

Batch `per_source_cap` (operators/curation.py) keeps the md5-top-cap rows
per source RETROACTIVELY — it needs the whole corpus to rank. On an
unbounded ingest stream admission must be decided at arrival time with no
retraction, so the streaming form is an admission counter: per source,
admit documents until the cap is reached, then reject. Within a
micro-batch, candidates are ordered by the same deterministic
(md5(key), key) priority as the batch operator, so replaying a failed
batch admits the identical rows (exactly-once with the state store);
ACROSS batches, admission is arrival-order — the price of never
retracting. When the whole input fits one micro-batch (or one availableNow
wave), the admitted set equals per_source_cap's exactly.

State per source is one counter — bounded by the source vocabulary, not
the corpus, the same bounded-metadata discipline as the IVF quantizer.
The reference's analog is the scheduler's per-job admission bookkeeping
(/root/reference/marie/scheduler/fixtures.py:37-79).
"""

from __future__ import annotations

import hashlib

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "n_admitted long"
OUTPUT_SCHEMA = "source string, doc_id long, admit_order long"


def source_quota(documents_stream: DataFrame, cap: int) -> DataFrame:
    """Grouped-stateful quota keyed by source; emits admitted rows only,
    with their per-source admission ordinal (1-based, stable across the
    stream's lifetime)."""

    def _admit(key, pdfs, state: GroupState):
        (source,) = key
        # NoTimeout: drain triggers (availableNow) must terminate; quota
        # state never expires anyway — a capped source stays capped.
        (n,) = state.get if state.exists else (0,)
        batch = pd.concat(list(pdfs), ignore_index=True)
        if len(batch) and n < cap:
            pr = batch["doc_id"].map(
                lambda d: hashlib.md5(str(d).encode()).hexdigest()
            )
            batch = (
                batch.assign(_pr=pr)
                .sort_values(["_pr", "doc_id"], kind="mergesort")
                .head(cap - n)
            )
            out = pd.DataFrame(
                {
                    "source": source,
                    "doc_id": batch["doc_id"].astype("int64"),
                    "admit_order": range(n + 1, n + 1 + len(batch)),
                }
            )
            n += len(batch)
        else:
            out = pd.DataFrame(
                {
                    "source": pd.Series([], dtype="object"),
                    "doc_id": pd.Series([], dtype="int64"),
                    "admit_order": pd.Series([], dtype="int64"),
                }
            )
        state.update((n,))
        yield out

    return (
        documents_stream.select("source", "doc_id")
        .groupBy("source")
        .applyInPandasWithState(
            _admit,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
