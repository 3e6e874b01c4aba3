"""Arbitrary stateful streaming operators — SURVEY §2 T-8.

``applyInPandasWithState`` is Spark's escape hatch for operators whose
state machine the built-in windows can't express.  Operators here:

* ``running_totals`` — per-key cumulative (count, sum) emitted on every
  micro-batch that touches the key; the streaming generalization of the
  reference's "accumulate batches as they arrive" consumer loop
  (`/root/reference/Example.hs:71-77` folds cursor batches the same way).
* ``gap_change_detector`` — emits a row whenever a key's value changes by
  more than ``threshold`` versus its previous value — classic tick-stream
  monitoring in the reference's OHLC/delta domain (`Example.hs:25-33`).
* ``watermarked_window_counts`` — tumbling-window counts with HARD
  watermark semantics (explicit late-drop + finalize-once), SURVEY §2 T-6.

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

__all__ = [
    "running_totals",
    "gap_change_detector",
    "watermarked_window_counts",
    "ewma_stream",
    "running_extrema",
    "rate_limit_monitor",
]


def watermarked_window_counts(
    sdf: DataFrame,
    key_col: str,
    ts_col: str,
    window: str = "10 seconds",
    delay: str = "5 seconds",
) -> DataFrame:
    """Tumbling-window counts with HARD watermark semantics — SURVEY §2 T-6.

    Spark's built-in streaming aggregation treats dropping late input as
    best-effort (the guarantee is only that a window finalizes once).  The
    reference's cursor protocol never re-delivers a closed batch
    (`/root/reference/Stream.hs:97-142`), so "a closed window never
    changes" is the semantic a reference user expects.  This operator
    makes both halves hard:

    * **late drop**: an input row whose window has already expired
      (window end <= current watermark) is discarded inside the state
      function — checked against ``GroupState.getCurrentWatermarkMs()``,
      not left to the planner's discretion — and an expired window's
      state is never resurrected;
    * **finalize once**: a window's count is emitted exactly once, when
      the event-time timeout fires after the watermark passes the window
      end (append semantics), and its state is removed.

    Scale: state is one LONG per open (key, window) pair; windows close
    and free state as the watermark advances, so state size is bounded by
    (distinct keys x windows inside the watermark horizon) regardless of
    stream length.

    Output schema: ``(key, window_start, n)``.
    """
    dur_s = _duration_seconds(window)

    from pyspark.sql import functions as F

    wdf = sdf.withWatermark(ts_col, delay).withColumn(
        "window_start", F.window(ts_col, window)["start"]
    )

    def count_windows(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            (n,) = state.get
            state.remove()
            yield pd.DataFrame(
                {"key": [key[0]], "window_start": [key[1]], "n": [n]}
            )
            return
        wm_ms = state.getCurrentWatermarkMs()
        end_ms = int(pd.Timestamp(key[1]).value // 1_000_000) + dur_s * 1000
        if end_ms <= wm_ms and not state.exists:
            return  # HARD drop: window expired, never resurrect it
        n = state.get[0] if state.exists else 0
        if end_ms > wm_ms:  # window still open — rows count
            n += sum(len(pdf) for pdf in pdfs)
        state.update((n,))
        # finalize when the watermark passes the window end (+1ms floor:
        # Spark requires the timeout to sit strictly beyond the watermark)
        state.setTimeoutTimestamp(max(end_ms, wm_ms + 1))
        yield from ()

    out_schema = T.StructType(
        [
            T.StructField("key", sdf.schema[key_col].dataType),
            T.StructField("window_start", wdf.schema["window_start"].dataType),
            T.StructField("n", T.LongType()),
        ]
    )
    return wdf.groupBy(key_col, "window_start").applyInPandasWithState(
        count_windows,
        outputStructType=out_schema,
        stateStructType="n long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def _duration_seconds(text: str) -> int:
    """Parse ``'10 seconds'`` / ``'5 minutes'`` / ``'2 hours'`` to seconds."""
    qty, unit = text.split()
    mult = {"second": 1, "minute": 60, "hour": 3600, "day": 86400}[
        unit.rstrip("s").lower()
    ]
    return int(qty) * mult


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


def ewma_stream(
    sdf: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    tau_seconds: float,
) -> DataFrame:
    """Infinite-horizon time-decayed EWMA as an O(1)-state streaming fold.

    The incremental form of the decay weighting ``operators/decay.py``
    computes windowed: on each arrival at time ``t`` after a gap ``Δ``,

        d = e^{-Δ/τ};  num ← num·d + v;  den ← den·d + 1;  ewma = num/den

    State per key is three doubles — constant regardless of stream
    length, the property that makes this the 100 TB/streaming shape
    (contrast w7's trailing-frame variant, which needs the frame rows).
    No overflow-bound caveat either: the recursive form never builds the
    absolute weight ``e^{t/τ}``, only the bounded ratio ``e^{-Δ/τ}``.

    ``ts_col`` is a NUMERIC epoch (seconds; double or long) — the
    timezone-free convention every time operator here uses.  Rows are
    folded in (ts) order within each micro-batch; cross-batch order is
    the source's delivery order, so feed chronological input (the cursor
    contract) or pre-sort with a watermark upstream.

    Output: one row per input row — ``(key, ts, value, ewma)``.
    """

    def fold(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import math

        num, den, last_t = state.get if state.exists else (0.0, 0.0, None)
        out_t, out_v, out_e = [], [], []
        pdf = pd.concat(list(pdfs), ignore_index=True)
        for _, row in pdf.sort_values(ts_col, kind="stable").iterrows():
            v, t = row[value_col], row[ts_col]
            if v is None or pd.isna(v):
                continue
            v, t = float(v), float(t)
            if last_t is None:
                num, den = v, 1.0
            else:
                d = math.exp(-(t - last_t) / tau_seconds)
                num = num * d + v
                den = den * d + 1.0
            last_t = t
            out_t.append(t)
            out_v.append(v)
            out_e.append(num / den)
        state.update((num, den, last_t))
        yield pd.DataFrame(
            {
                "key": [key[0]] * len(out_t),
                "ts": out_t,
                "value": out_v,
                "ewma": out_e,
            }
        )

    out_schema = T.StructType(
        [
            T.StructField("key", sdf.schema[key_col].dataType),
            T.StructField("ts", T.DoubleType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("ewma", T.DoubleType()),
        ]
    )
    return sdf.groupBy(key_col).applyInPandasWithState(
        fold,
        outputStructType=out_schema,
        stateStructType="num double, den double, last_t double",
        outputMode="append",
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
        # merge ALL Arrow chunks before sorting: a >maxRecordsPerBatch
        # group arrives as several chunks, and a per-chunk sort would
        # fold later-chunk rows out of order_col order
        pdf = pd.concat(list(pdfs), ignore_index=True)
        for _, row in pdf.sort_values(order_col, kind="stable").iterrows():
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


def running_extrema(
    sdf: DataFrame,
    key_col: str,
    value_col: str,
    order_col: str,
) -> DataFrame:
    """Per-key running peak/trough and current drawdown across
    micro-batches — the streaming form of t18's batch drawdown window.

    State per key: (peak, trough) — two doubles, O(1) at any stream
    length.  Emits one row per input row (append): the value, the
    running extrema INCLUDING it, and ``drawdown = peak − value`` in the
    value's own units (the peak is tracked after the row applies, so
    drawdown is 0 at a fresh high).  Rows are folded in ``order_col``
    order within each batch; cross-batch order is the source's delivery
    order (the cursor contract), as with ``ewma_stream``.
    """

    def fold(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        peak, trough = state.get if state.exists else (None, None)
        out_o, out_v, out_p, out_t, out_d = [], [], [], [], []
        pdf = pd.concat(list(pdfs), ignore_index=True)
        for _, row in pdf.sort_values(order_col, kind="stable").iterrows():
            v = row[value_col]
            if v is None or pd.isna(v):
                continue
            v = float(v)
            peak = v if peak is None else max(peak, v)
            trough = v if trough is None else min(trough, v)
            out_o.append(row[order_col])
            out_v.append(v)
            out_p.append(peak)
            out_t.append(trough)
            out_d.append(peak - v)
        state.update((peak, trough))
        yield pd.DataFrame(
            {
                "key": [key[0]] * len(out_v),
                "ord": out_o,
                "value": out_v,
                "peak": out_p,
                "trough": out_t,
                "drawdown": out_d,
            }
        )

    out_schema = T.StructType(
        [
            T.StructField("key", sdf.schema[key_col].dataType),
            T.StructField("ord", sdf.schema[order_col].dataType),
            T.StructField("value", T.DoubleType()),
            T.StructField("peak", T.DoubleType()),
            T.StructField("trough", T.DoubleType()),
            T.StructField("drawdown", T.DoubleType()),
        ]
    )
    return sdf.groupBy(key_col).applyInPandasWithState(
        fold,
        outputStructType=out_schema,
        stateStructType="peak double, trough double",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streak_tracker(
    sdf: DataFrame,
    key_col: str,
    day_col: str,
) -> DataFrame:
    """Per-key consecutive-day streak maintained ACROSS micro-batches —
    the streaming twin of the batch gaps-and-islands query
    (``inventory.w17_streaks``), with O(1) state per key instead of a
    sort over history.

    State: ``(last_day, cur_streak, best_streak, n_active_days)`` —
    four scalars, so a billion keys fit in the state store where a
    replay-the-history design would not.

    Contract: per key, days must arrive in NON-DECREASING order across
    micro-batches (time-partitioned ingestion — the usual case for an
    event log; within a batch we sort, so intra-batch disorder is
    fine).  A day earlier than ``last_day`` would have to be a late
    arrival past the ingestion watermark; it is ignored (counted
    nowhere), matching what the batch query over the compacted log
    would see after the late row is dropped.

    Output (update mode): one row per key per batch it appeared in —
    ``(key, last_day, current_streak, longest_streak, n_active_days)``.
    """

    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        last, cur, best, ndays = (
            state.get if state.exists else (None, 0, 0, 0)
        )
        # epoch-day ints: exact arithmetic, no tz/dtype hazards.  Merge
        # ALL Arrow chunks before sorting so a multi-chunk group cannot
        # drop later-chunk days that sort before an earlier chunk's max.
        days = sorted(
            set(
                int(x)
                for pdf in pdfs
                for x in pdf[day_col].dropna()
            )
        )
        for d in days:
            if last is not None and d <= last:
                continue  # duplicate day or late arrival
            cur = cur + 1 if (last is not None and d == last + 1) else 1
            best = max(best, cur)
            ndays += 1
            last = d
        state.update((last, cur, best, ndays))
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "last_day": [last],
                "current_streak": [cur],
                "longest_streak": [best],
                "n_active_days": [ndays],
            }
        )

    out_schema = T.StructType(
        [
            T.StructField("key", sdf.schema[key_col].dataType),
            T.StructField("last_day", T.LongType()),
            T.StructField("current_streak", T.LongType()),
            T.StructField("longest_streak", T.LongType()),
            T.StructField("n_active_days", T.LongType()),
        ]
    )
    return sdf.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=(
            "last_day long, cur long, best long, ndays long"
        ),
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_top_k(
    sdf: DataFrame,
    key_col: str,
    value_col: str,
    id_col: str,
    k: int = 5,
) -> DataFrame:
    """Per-key continuous top-k leaderboard — the streaming form of the
    W-family top-k (o3): state per key is the current top-``k``
    (value, id) list, O(k) regardless of stream length.

    Each micro-batch merges its rows into the state (value DESC, id ASC
    tie-break — the o3 ordering) and emits the key's FULL refreshed
    leaderboard as ``k`` append rows stamped with the batch's rank, so
    downstream consumers always see a complete standings snapshot per
    update.  Equivalent to re-running batch ``top_k_per_group`` over
    everything seen so far (pytest-pinned).
    """

    def fold(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            (vals, ids) = state.get
            board = list(zip(vals, ids))
        else:
            board = []
        for pdf in pdfs:
            for v, i in zip(pdf[value_col], pdf[id_col]):
                if v is None or pd.isna(v):
                    continue
                board.append((float(v), int(i)))
        board.sort(key=lambda t: (-t[0], t[1]))
        # drop same-id duplicates (later updates of an id replace it only
        # if better — leaderboard semantics over event streams)
        seen: set = set()
        dedup = []
        for v, i in board:
            if i not in seen:
                seen.add(i)
                dedup.append((v, i))
        board = dedup[:k]
        state.update(([v for v, _ in board], [i for _, i in board]))
        yield pd.DataFrame(
            {
                "key": [key[0]] * len(board),
                "rank": list(range(1, len(board) + 1)),
                "id": [i for _, i in board],
                "value": [v for v, _ in board],
            }
        )

    out_schema = T.StructType(
        [
            T.StructField("key", sdf.schema[key_col].dataType),
            T.StructField("rank", T.IntegerType()),
            T.StructField("id", T.LongType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    return sdf.groupBy(key_col).applyInPandasWithState(
        fold,
        outputStructType=out_schema,
        stateStructType="vals array<double>, ids array<long>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def rate_limit_monitor(
    sdf: DataFrame,
    key_col: str,
    epoch_col: str,
    window_s: int = 60,
    limit: int = 5,
) -> DataFrame:
    """Per-key sliding-window rate-limit audit maintained ACROSS
    micro-batches — the streaming twin of the batch RANGE-frame query
    (``inventory.t35_rate_limit_audit``): for every event, the count of
    that key's events in the trailing ``window_s`` seconds; a violation
    when the count exceeds ``limit``.

    State: the in-window event times plus three counters — bounded by
    the key's PEAK in-window rate (the quantity being policed), not by
    stream length, so the state store holds exactly what a token-bucket
    enforcer would.

    Contract: per key, event times must arrive in NON-DECREASING order
    across micro-batches (intra-batch disorder is sorted away — ALL
    Arrow chunks of the group are merged before sorting, so groups
    larger than ``arrow.maxRecordsPerBatch`` are safe); an event older
    than the key's latest time is a late arrival past the ingestion
    watermark and is dropped — counted nowhere, same as the
    compacted-log batch view.

    Tie semantics match the batch RANGE frame: events sharing a
    timestamp are folded as ONE peer group, so every tied event sees
    the full tie-group count (``RANGE ... AND CURRENT ROW`` includes
    all peers), not a sequential prefix.  The one residual divergence
    from the batch audit is a tie that STRADDLES a micro-batch
    boundary: rows finalized in the earlier batch were counted without
    the later batch's peers and streaming cannot retro-update them —
    the same rows-already-emitted limit every update-mode monitor has.

    Output (update mode): one row per key per batch it appeared in —
    ``(key, n_events, n_violations, peak_window)``, cumulative — so the
    latest row per key equals the batch audit over everything seen
    (modulo the boundary-tie note above).
    """

    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            recent, n_ev, n_vio, peak = state.get
            recent = list(recent)
        else:
            recent, n_ev, n_vio, peak = [], 0, 0, 0
        # duplicates KEPT — every row is an event (batch parity); merge
        # ALL Arrow chunks before sorting (multi-chunk group safety)
        ts = sorted(
            int(x) for pdf in pdfs for x in pdf[epoch_col].dropna()
        )
        i = 0
        while i < len(ts):
            # fold the whole tie group at once: RANGE-frame peers all
            # see the full group count
            t = ts[i]
            j = i
            while j < len(ts) and ts[j] == t:
                j += 1
            m = j - i
            i = j
            if recent and t < recent[-1]:
                continue  # late arrival past the watermark
            recent = [x for x in recent if x >= t - window_s]
            recent.extend([t] * m)
            c = len(recent)
            n_ev += m
            if c > limit:
                n_vio += m
            if c > peak:
                peak = c
        state.update((recent, n_ev, n_vio, peak))
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "n_events": [n_ev],
                "n_violations": [n_vio],
                "peak_window": [peak],
            }
        )

    out_schema = T.StructType(
        [
            T.StructField("key", sdf.schema[key_col].dataType),
            T.StructField("n_events", T.LongType()),
            T.StructField("n_violations", T.LongType()),
            T.StructField("peak_window", T.LongType()),
        ]
    )
    return sdf.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=(
            "recent array<long>, n_ev long, n_vio long, peak long"
        ),
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
