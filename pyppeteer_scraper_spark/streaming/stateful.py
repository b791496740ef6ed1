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


def snapshot_change_stream_multi(
    events: DataFrame,
    key_col: str = "key",
    ts_col: str = "ts",
    value_cols: list[str] | None = None,
) -> DataFrame:
    """Struct-valued CDC: keyed state holds the FULL tracked field
    tuple; a row emits when ANY field differs from the cached snapshot
    (the reference's ``has_changed`` compares the whole 4-field dict,
    /root/reference/scraper/canada_ircc.py:153-155 — not one value).
    Output carries each field plus its ``prev_*`` twin.  Schemas are
    derived from the input, so the operator works for any field set.
    """
    from pyspark.sql import types as T

    in_fields = {f.name: f for f in events.schema.fields}
    if value_cols is None:
        value_cols = [c for c in events.columns if c not in (key_col, ts_col)]
    out_schema = T.StructType(
        [in_fields[key_col], in_fields[ts_col]]
        + [in_fields[c] for c in value_cols]
        + [
            T.StructField(f"prev_{c}", in_fields[c].dataType)
            for c in value_cols
        ]
    )
    state_schema = T.StructType([in_fields[c] for c in value_cols])
    n = len(value_cols)

    def detect(key, batches, state: GroupState):
        prev = tuple(state.get) if state.exists else None
        out_rows = []
        for pdf in batches:
            pdf = pdf.sort_values([ts_col], kind="mergesort")
            for row in pdf.itertuples(index=False):
                d = row._asdict()
                cur = tuple(d[c] for c in value_cols)
                if prev is None or cur != prev:
                    out_rows.append(
                        (key[0], d[ts_col])
                        + cur
                        + (prev if prev is not None else (None,) * n)
                    )
                    prev = cur
        state.update(prev)
        if out_rows:
            yield pd.DataFrame(
                out_rows,
                columns=[key_col, ts_col]
                + value_cols
                + [f"prev_{c}" for c in value_cols],
            )

    return events.groupBy(key_col).applyInPandasWithState(
        detect,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
