"""Custom stateful streaming operators (``applyInPandasWithState``).

The built-in streaming surface (windows, session windows — events.py)
covers time-bucketed state; these cover ARBITRARY per-key state, the
shape the crawl's seen-set has in streaming form: a key is emitted the
FIRST time it is ever observed and suppressed forever after — the
streaming twin of the batch ``analytics.first_seen`` / the frontier's
URL-seen set (streaming/seen.py), expressed as a proper Structured
Streaming stateful operator instead of a batch-loop table.

State is one row per key (bounded by distinct keys, spillable by the
state store); the update function is Arrow-batched per key group — no
per-row Python in the hot path beyond the per-group min.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_first_seen(
    events: DataFrame, key_col: str = "user_id", ts_col: str = "ts"
) -> DataFrame:
    """Emit (key, first_ts) exactly once per key across the whole
    stream — first_ts is the minimum timestamp within the key's FIRST
    micro-batch (first-seen-by-arrival semantics, matching the crawl
    seen-set contract: a key, once admitted, is never re-admitted)."""

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            for _ in pdfs:  # drain; key already emitted
                pass
            return
        first_ts = None
        for pdf in pdfs:
            t = pdf[ts_col].min()
            first_ts = t if first_ts is None else min(first_ts, t)
        if first_ts is not None:
            state.update((int(pd.Timestamp(first_ts).value),))
            yield pd.DataFrame({key_col: [key[0]], "first_ts": [first_ts]})

    return events.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=f"{key_col} bigint, first_ts timestamp",
        stateStructType="first_ts_ns bigint",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_host_budget(
    fetches: DataFrame, host_col: str = "host", budget: int = 100
) -> DataFrame:
    """Per-host cumulative fetch accounting with a hard budget — the
    stateful form of the politeness token bucket: each micro-batch
    emits (host, n_batch, n_total, over_budget) with the running total
    carried in state."""

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (total,) = state.get if state.exists else (0,)
        n = 0
        for pdf in pdfs:
            n += len(pdf)
        total += n
        state.update((total,))
        yield pd.DataFrame(
            {
                host_col: [key[0]],
                "n_batch": [n],
                "n_total": [total],
                "over_budget": [total > budget],
            }
        )

    return fetches.groupBy(host_col).applyInPandasWithState(
        fn,
        outputStructType=f"{host_col} string, n_batch bigint, n_total bigint, over_budget boolean",
        stateStructType="n_total bigint",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
