"""Arbitrary stateful streaming operators — SURVEY §2 T-8.

``applyInPandasWithState`` is Spark's escape hatch for operators whose
state machine the built-in windows can't express.  Two operators here:

* ``running_totals`` — per-key cumulative (count, sum) emitted on every
  micro-batch that touches the key; the streaming generalization of the
  reference's "accumulate batches as they arrive" consumer loop
  (`/root/reference/Example.hs:71-77` folds cursor batches the same way).
* ``gap_change_detector`` — emits a row whenever a key's value changes by
  more than ``threshold`` versus its previous value — classic tick-stream
  monitoring in the reference's OHLC/delta domain (`Example.hs:25-33`).

State discipline at scale: state lives in the state store keyed by group —
per-key size here is O(1) (a few numbers), so total state = O(distinct
keys), checkpointed incrementally.  With event-time bounds, pair with a
watermark + ``GroupStateTimeout.EventTimeTimeout`` so dead keys age out;
``processing-time`` timeout variants suit keyless session cleanup.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["running_totals", "gap_change_detector"]


def running_totals(
    sdf: DataFrame,
    key_col: str,
    value_col: str,
) -> DataFrame:
    """Per-key cumulative count/sum across micro-batches (update mode).

    Output schema: ``(key, n, total)`` — one row per key per micro-batch
    in which the key appeared, carrying the running totals so far.
    """

    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            vals = pdf[value_col].dropna()
            n += int(len(vals))
            total += float(vals.sum())
        state.update((n, total))
        yield pd.DataFrame({"key": [key[0]], "n": [n], "total": [total]})

    # key column keeps ITS OWN type (string ids work, not just bigint)
    out_schema = T.StructType(
        [
            T.StructField("key", sdf.schema[key_col].dataType),
            T.StructField("n", T.LongType()),
            T.StructField("total", T.DoubleType()),
        ]
    )
    return sdf.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType="n long, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def gap_change_detector(
    sdf: DataFrame,
    key_col: str,
    value_col: str,
    order_col: str,
    threshold: float,
) -> DataFrame:
    """Emit ``(key, value, prev_value, jump)`` whenever a key's value moves
    more than ``threshold`` from its previously-seen value.

    State per key: the last value (O(1)).  Rows inside a batch are ordered
    by ``order_col`` so intra-batch jumps are detected too.
    """

    def detect(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (prev,) = state.get if state.exists else (None,)
        out_val, out_prev, out_jump = [], [], []
        for pdf in pdfs:
            for _, row in pdf.sort_values(order_col).iterrows():
                v = row[value_col]
                if v is None or pd.isna(v):
                    continue
                v = float(v)
                if prev is not None and abs(v - prev) > threshold:
                    out_val.append(v)
                    out_prev.append(prev)
                    out_jump.append(v - prev)
                prev = v
        state.update((prev,))
        yield pd.DataFrame(
            {
                "key": [key[0]] * len(out_val),
                "value": out_val,
                "prev_value": out_prev,
                "jump": out_jump,
            }
        )

    out_schema = T.StructType(
        [
            T.StructField("key", sdf.schema[key_col].dataType),
            T.StructField("value", T.DoubleType()),
            T.StructField("prev_value", T.DoubleType()),
            T.StructField("jump", T.DoubleType()),
        ]
    )
    return sdf.groupBy(key_col).applyInPandasWithState(
        detect,
        outputStructType=out_schema,
        stateStructType="prev double",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
