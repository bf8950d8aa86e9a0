"""Stream-stream joins with watermark-bounded state.

The reference has no stream-stream joins (its only streaming is
incremental file ingestion + CDC apply, SURVEY.md §2.9); a complete
Spark engine needs them for event-to-event correlation on live feeds.

Semantics and scale:
- Both inputs carry a watermark and the join condition carries an
  explicit event-time bound. Spark uses the two to compute how long a
  row can possibly still find a match, and evicts buffered state past
  that horizon — without the time bound, stream-stream inner join
  state grows forever.
- State is hash-partitioned on the join key across executors, so the
  join scales horizontally exactly like a shuffle join; the per-key
  buffer holds only rows younger than watermark + interval.
- The same function applied to batch DataFrames degrades to a plain
  interval theta-join (batch/stream unification) — the batch twin used
  for verification is `operators/asof.py::interval_join`, whose
  bucketed equi-join form is preferred for large batch backfills.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    left_ts: str = "ts",
    right_ts: str = "right_ts",
    upper_seconds: int = 300,
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Join two event streams on ``key`` where the right event lands
    inside ``[left_ts, left_ts + upper_seconds]``.

    ``how`` is ``"inner"`` (matches only) or ``"leftOuter"`` (every
    left row eventually emits; unmatched ones with NULL right columns).
    Outer semantics are WATERMARK-DRIVEN: a left row's null-match is
    emitted only once the watermark passes ``left_ts + upper_seconds``
    — the engine can't know "no match will come" any earlier. In a
    triggered (availableNow) drain the watermark advances BETWEEN
    micro-batches, so the final batch's unmatched rows stay buffered
    until a later drain advances the watermark past them (the
    ``events_stream_stream_left_join`` query flushes them with a
    far-future sentinel row; a continuous deployment just keeps
    running). Spark requires the time bound for exactly this reason —
    it is also what bounds the outer state.

    Column names other than ``key`` must be disjoint between the two
    inputs (pre-alias as needed). Watermarks are applied to both sides;
    on batch inputs ``withWatermark`` is a no-op and this is a plain
    interval join.
    """
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark).withColumnRenamed(
        key, "__rkey"
    )
    cond = (
        (F.col(key) == F.col("__rkey"))
        & (F.col(right_ts) >= F.col(left_ts))
        & (
            F.col(right_ts)
            <= F.col(left_ts) + F.expr(f"interval {int(upper_seconds)} seconds")
        )
    )
    return lw.join(rw, cond, how).drop("__rkey")


def stream_static_enrich(
    stream: DataFrame,
    dim: DataFrame,
    key: str,
    how: str = "left",
) -> DataFrame:
    """Enrich a stream with a static dimension (stream-static join).

    No state is kept: the static side is (re)planned per micro-batch
    and — being dimension-sized — broadcast to the executors, so every
    batch row enriches map-side with no shuffle of the stream. This is
    the streaming counterpart of the gold-layer dimension joins (J2/J5
    shapes, reference src/pipelines/gold/seller_performance.sql:47-50)
    and the standard way to attach slowly-refreshed reference data
    (the per-batch re-plan picks up dimension updates between batches).

    LEFT join by default: dimension misses must not drop fact rows in
    an append-only pipeline (they surface as NULL attributes for a DQ
    expectation to count instead)."""
    return stream.join(F.broadcast(dim), key, how)
