"""Event-stream analytics: watermarked windowed aggregation and stateful
sessionization — batch and Structured Streaming from the same code.

The reference engine has no event-time semantics at all (its closest
analog is batch re-indexing; see :mod:`.streaming`), so this module is
engine-native surface for the ``events`` table shape
``(event_id, ts, user_id, event_type, value, props)``:

- :func:`windowed_stats` — tumbling-window per-event-type counts/sums.
  The SAME function body serves batch DataFrames and streams (pass
  ``watermark=`` on a stream to bound state and drop late data) — the
  Structured Streaming unification working as intended.
- :func:`sessionize` — batch sessionization: split each user's events
  into sessions at inactivity gaps > ``gap``.  Window functions only
  (lag → flag → running sum → groupBy); one shuffle on ``user_id``.
- :func:`sessionize_stream` — the SAME session semantics as a custom
  stateful streaming operator via ``applyInPandasWithState``: per-user
  state carries the open session; a session is emitted the moment a
  same-user event closes it (deterministic, watermark-independent),
  and the *last* open session closes via event-time timeout once the
  watermark passes its end + gap.  Out-of-order events inside one
  micro-batch are handled exactly (sorted before processing); a
  cross-batch late event still within the watermark is folded into the
  user's open session (extending its start backwards if needed) without
  re-splitting accumulated state, and events older than the watermark
  are dropped by Spark's watermark contract — the two documented
  streaming trade-offs vs the exact batch op.

Numeric note: ``value`` sums are computed in ``decimal(18,2)`` and cast
back to double, so results are independent of partitioning/aggregation
order — this is what lets the DuckDB oracles (gates ``event_windows``,
``sessions``) match bit-for-bit.

Scale: windowed agg is a standard two-phase (partial/final) hash agg
keyed on (window, event_type) — map-side combined, skew-free.  Batch
sessionization shuffles once on ``user_id``; a hot user is bounded by
their own event count, not the corpus.  The streaming path keeps O(1)
state per active user and the watermark expires idle users' state.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["windowed_stats", "sessionize", "sessionize_stream"]


def _dec_sum(col):
    # order-independent exact sum for 2-decimal values
    return F.sum(F.col(col).cast("decimal(18,2)")).cast("double")


def windowed_stats(events: DataFrame, window: str = "10 minutes",
                   watermark: str | None = None) -> DataFrame:
    """``(window_start, event_type, n_events, sum_value, avg_value)``
    per tumbling event-time window.  Works identically on a batch
    DataFrame and a ``readStream`` source; set ``watermark`` on streams
    (e.g. ``"30 minutes"``) to bound state and define lateness."""
    df = events
    if watermark is not None:
        df = df.withWatermark("ts", watermark)
    return (
        df.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _dec_sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
            (F.col("sum_value") / F.col("n_events")).alias("avg_value"),
        )
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Batch sessionization: ``(user_id, session_seq, session_start,
    session_end, n_events, total_value)`` — a new session starts when a
    user is idle longer than ``gap_minutes``.  Event-time comparisons in
    exact integer microseconds; ties pinned by ``event_id``."""
    gap_us = int(gap_minutes) * 60 * 1_000_000
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # parquet event times are TIMESTAMP_NTZ; the session zone is
    # pinned to UTC (session.py) so this cast is a pure relabel
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    prev = F.lag(us).over(w)
    is_new = F.when(
        prev.isNull() | ((us - prev) > F.lit(gap_us)), F.lit(1)
    ).otherwise(F.lit(0))
    seq = F.sum(is_new).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        events.select("user_id", "event_id", "ts", "value", seq.alias("session_seq"))
        .groupBy("user_id", "session_seq")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            _dec_sum("value").alias("total_value"),
        )
    )


SESSION_OUT_SCHEMA = ("user_id long, session_start timestamp, "
                      "session_end timestamp, n_events long, total_value double")
_STATE_SCHEMA = "start_us long, last_us long, n long, total_cents long"


def sessionize_stream(events: DataFrame, gap_minutes: int = 30,
                      watermark: str = "1 hour") -> DataFrame:
    """Streaming sessionization with the SAME semantics as
    :func:`sessionize` via ``applyInPandasWithState`` (the task-level
    custom stateful operator): emits
    ``(user_id, session_start, session_end, n_events, total_value)``
    for every CLOSED session — closed either by a later same-user event
    beyond the gap (emitted immediately) or by the event-time timeout
    once the watermark passes ``session_end + gap``.

    ``session_seq`` is deliberately absent from the streaming output: a
    stream cannot know a user's historical session count without
    unbounded state; join on ``(user_id, session_start)`` instead.
    """
    gap_us = int(gap_minutes) * 60 * 1_000_000

    def fn(key, pdfs: Iterator[pd.DataFrame], state):
        (user_id,) = key
        if state.hasTimedOut:
            start_us, last_us, n, cents = state.get
            state.remove()
            yield pd.DataFrame(
                {"user_id": [user_id],
                 "session_start": [pd.Timestamp(start_us, unit="us")],
                 "session_end": [pd.Timestamp(last_us, unit="us")],
                 "n_events": [n],
                 "total_value": [cents / 100.0]})
            return
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts", "event_id"])
        ts_us = rows["ts"].astype("int64")  # ns -> derive us below
        ts_us = (ts_us // 1000).to_numpy()
        # NULL values contribute 0 to the sum — same semantics as the
        # batch path's nan-skipping decimal sum (and no non-finite crash)
        cents = (rows["value"].fillna(0.0).round(2) * 100).round().astype("int64").to_numpy()
        # Interval-merge the retained open session with the batch's
        # events, sorted by event time: events within ``gap`` of each
        # other (or of the open session's span) fold together; a
        # cross-batch late event more than a gap BEFORE the open
        # session's start becomes its own session, exactly as the batch
        # sessionizer would split it (ADVICE r3 item 4 — the previous
        # fold-always rule could drag session_start arbitrarily far
        # back and merge two sessions the batch op keeps apart).  Two
        # residual divergences from batch, both inherent to append-mode
        # emit-on-close streaming (state here is single-interval by
        # design — O(1) per user):
        #   1. a late event adjacent to a session ALREADY emitted in an
        #      earlier micro-batch cannot rejoin it (append emits once);
        #      it starts a fresh session instead;
        #   2. a late event more than a gap BEFORE the open session is
        #      emitted as a closed session IMMEDIATELY (it lands in
        #      merged[:-1] below) rather than being held until the
        #      watermark passes its end+gap — so an even-later event
        #      still inside the watermark that belongs to that early
        #      interval opens a duplicate session where batch would
        #      merge (ADVICE r4 item 3).  Holding it would need
        #      multi-interval state; the single-interval trade keeps
        #      per-user state constant-size at 100 TB event volume.
        items = [tuple(int(x) for x in state.get)] if state.exists else []
        items += [(int(ts_us[i]), int(ts_us[i]), 1, int(cents[i]))
                  for i in range(len(rows))]
        items.sort(key=lambda x: (x[0], x[1]))
        merged = [list(items[0])]
        for s, e, n_, c_ in items[1:]:
            cur = merged[-1]
            if s - cur[1] <= gap_us:
                cur[0] = min(cur[0], s)
                cur[1] = max(cur[1], e)
                cur[2] += n_
                cur[3] += c_
            else:
                merged.append([s, e, n_, c_])
        out = [tuple(m) for m in merged[:-1]]
        start_us, last_us, n, tot = merged[-1]
        state.update((int(start_us), int(last_us), int(n), int(tot)))
        # close the open session when the watermark passes end + gap
        state.setTimeoutTimestamp((int(last_us) + gap_us) // 1000)
        if out:
            yield pd.DataFrame(
                {"user_id": [user_id] * len(out),
                 "session_start": [pd.Timestamp(s, unit="us") for s, *_ in out],
                 "session_end": [pd.Timestamp(e, unit="us") for _, e, *_ in out],
                 "n_events": [n_ for *_, n_, _t in out],
                 "total_value": [t_ / 100.0 for *_, t_ in out]})

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf="EventTimeTimeout",
        )
    )
