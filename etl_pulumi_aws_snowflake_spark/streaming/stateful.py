"""Arbitrary-stateful streaming operator (SURVEY.md §2.9 EXT surface):
``applyInPandasWithState`` — the escape hatch when built-in windows /
``dropDuplicates`` can't express the state machine.

The demo operator keeps one running (count, sum) per user and emits the
updated totals every microbatch — the minimal shape shared by real
stateful ops (session scoring, rate limiting, CDC merge).  Contract
notes that matter at scale:

- State lives in the state store, partitioned by the group key: the
  shuffle is (key → partition) once per batch, state never crosses
  partitions.  Skewed keys skew state partitions — salt upstream if a
  single key's updates dominate.
- ``GroupStateTimeout`` + watermark bound state lifetime; without a
  timeout the store grows with key cardinality forever (fine for
  bounded users, wrong for e.g. session ids — use EventTimeTimeout and
  drop expired state there).
- The Python fn receives an ITERATOR of pandas batches per key per
  trigger — never materialize it into one frame for unbounded groups.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double"
STATE_SCHEMA = "n long, total double"


def running_user_totals(events: DataFrame, ts: str = "ts", watermark: str = "1 hour") -> DataFrame:
    """Per-user running (event count, value sum), one updated row per
    user per microbatch that saw that user."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return (
        events.withWatermark(ts, watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )
