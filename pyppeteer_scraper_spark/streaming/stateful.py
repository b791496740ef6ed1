"""Custom stateful streaming operator: snapshot change detection with
``applyInPandasWithState`` — the streaming form of the reference's
CDC pattern (fetch snapshot → compare to cached → emit only deltas →
checkpoint), /root/reference/scraper/canada_ircc.py:153-155,285-301.

Each key (the reference has one: the IRCC wait-time snapshot) keeps
its last-seen value in state; an incoming batch emits one row per
actual change, in event order.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

CHANGES_SCHEMA = "key string, ts timestamp, value double, prev double"
STATE_SCHEMA = "value double"


def _detect(
    key: tuple[Any, ...], batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    prev = state.get[0] if state.exists else None
    out_rows = []
    for pdf in batches:
        pdf = pdf.sort_values(["ts"], kind="mergesort")
        for ts, val in zip(pdf["ts"], pdf["value"]):
            if prev is None or val != prev:
                out_rows.append((key[0], ts, val, prev))
                prev = val
    state.update((prev,))
    if out_rows:
        yield pd.DataFrame(out_rows, columns=["key", "ts", "value", "prev"])


def snapshot_change_stream(events: DataFrame, key_col: str = "key") -> DataFrame:
    """events(key, ts, value) stream → rows only where value changed
    vs the keyed state (exact reference semantics: first observation
    always emits, repeats are suppressed)."""
    return events.groupBy(key_col).applyInPandasWithState(
        _detect,
        outputStructType=CHANGES_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
