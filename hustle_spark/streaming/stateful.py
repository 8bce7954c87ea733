"""Arbitrary stateful streaming — ``applyInPandasWithState``
(SURVEY.md section 2.8: the custom-stateful-operator slot).

Example operator: a per-user running monitor that maintains
(count, exact cent-sum) state across micro-batches and emits one row
per user per batch with the updated totals. State is a tiny
fixed-width tuple per key — bounded by key cardinality. This demo
runs with ``GroupStateTimeout.NoTimeout`` (state for every ever-seen
key is retained for the query's lifetime — fine for the bounded
availableNow runs this repo drives); an unbounded production
deployment must configure ``EventTimeTimeout`` plus
``state.setTimeoutTimestamp``/``state.remove`` in the update function
for expired keys to actually evict.

This is the Structured Streaming analogue of what the reference could
not express at all: its queries were one-shot batch pipelines over
marbles (public repo: ``hustle/core/pipeline.py``).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_cents", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("cents", T.LongType()),
    ]
)


def _update(
    key: Tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, cents = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        # NULL values carry no amount: count the event, skip the sum
        # (astype('int64') on a NaN would crash the whole query)
        vals = pdf["value"].dropna()
        n += len(pdf)
        # per-row round -> exact integer sum: order/batch-invariant
        # (rounding a float batch-sum would be order-dependent).
        # HALF-AWAY-FROM-ZERO, matching DuckDB/Spark round(): pandas'
        # .round() is banker's (ties-to-even) and diverges by 1 cent on
        # exact-half values like 0.125
        import numpy as np

        scaled = vals.mul(100).to_numpy()
        cents += int(np.sign(scaled).astype("int64")
                     @ np.floor(np.abs(scaled) + 0.5).astype("int64"))
    state.update((n, cents))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_cents": [cents]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (count, cent-sum) maintained in streaming state."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
