"""Banded interval joins re-keyed on (entity, time-bucket).

The plain band join — equi-join on the entity key with the time band as
a residual (`e.ts in (s.ts - band, s.ts]`) — shuffles both sides on the
entity key alone. Two scale problems follow at 100 TB:

* **Skew**: one hot entity's entire multi-year history lands in one
  task, however long it is; the band predicate only filters AFTER the
  pair is formed in that task.
* **Working set**: a task holds a whole entity's history even though
  any spine row can only ever match one band-width of it.

Re-keying the shuffle on ``(entity, floor(ts / band))`` fixes both: the
spine side is replicated to the two adjacent buckets its band can span
(exactly 2 when the bucket width equals the band width), the event side
partitions by its own bucket, and the join becomes a plain equi-join on
(entity, bucket) with the band predicate as a residual — per-task work
is bounded by TWO bucket-widths of one entity's history regardless of
total history length. Pair-generation cost itself is semantic (every
in-band pair must be formed; SCALE.md's band-join note documents the
density² envelope) — what this operator removes is the unbounded
per-entity task and the skew, not the pair count.

This is the same decomposition Spark's own range-join binning and the
``union_bucketed``/``sessionize_bucketed`` skew variants in this repo
use: trade a bounded replication factor (2x on the smaller side) for a
data-scaled shuffle key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def band_join_bucketed(
    spine: DataFrame,
    events: DataFrame,
    keys: str | list[str],
    spine_ts: str,
    event_ts: str,
    band_us: int,
    direction: str = "backward",
    how: str = "left",
) -> DataFrame:
    """Join each spine row to events of the same entity within one band.

    ``direction="backward"``: ``event_ts in (spine_ts - band, spine_ts]``
    (trailing features); ``"forward"``: ``(spine_ts, spine_ts + band]``
    (label windows); ``"nearest"``: ``|event_ts - spine_ts| <= band``
    (both ways, inclusive — the tolerance band of a nearest as-of).
    ``band_us`` is the band width in microseconds and also the bucket
    width — the spine explodes to 2 buckets (directional) or 3
    (nearest).

    Returns the joined frame with all spine columns plus the event
    side's non-key columns. With ``how="left"`` a no-match spine row
    surfaces as TWO all-null-event rows (one per exploded bucket):
    callers must aggregate over the spine key with null-skipping
    aggregates (count(col)/sum — the usual shape), which collapses them
    to the correct zero row. Use ``how="inner"`` when unmatched spine
    rows may drop.
    """
    key_list = [keys] if isinstance(keys, str) else list(keys)
    overlap = (set(spine.columns) & set(events.columns)) - set(key_list)
    if overlap:
        raise ValueError(
            f"spine/events column overlap outside join keys: {sorted(overlap)}; "
            "rename (e.g. spine ts vs event ts) before the band join"
        )
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )

    sb = F.floor(F.unix_micros(F.col(spine_ts)) / F.lit(band_us))
    # nearest looks BOTH ways (±band), so its window can span 3 buckets
    offsets = {
        "backward": (-1, 0),
        "forward": (0, 1),
        "nearest": (-1, 0, 1),
    }[direction]
    s = spine.withColumn(
        "__band_bucket__",
        F.explode(F.array(*[(sb + F.lit(o)).cast("long") for o in offsets])),
    ).alias("s")
    e = events.withColumn(
        "__band_bucket__",
        F.floor(F.unix_micros(F.col(event_ts)) / F.lit(band_us)).cast("long"),
    ).alias("e")

    cond = F.col("s.__band_bucket__") == F.col("e.__band_bucket__")
    for k in key_list:
        cond = cond & (F.col(f"s.{k}") == F.col(f"e.{k}"))
    # Residual band predicate in integer microseconds — same arithmetic
    # as the bucket key, no interval-literal parsing.
    st = F.unix_micros(F.col(f"s.{spine_ts}"))
    et = F.unix_micros(F.col(f"e.{event_ts}"))
    if direction == "backward":
        cond = cond & (et <= st) & (et > st - F.lit(band_us))
    elif direction == "forward":
        cond = cond & (et > st) & (et <= st + F.lit(band_us))
    else:  # nearest: symmetric inclusive band
        cond = cond & (F.abs(et - st) <= F.lit(band_us))

    event_payload = [c for c in events.columns if c not in key_list]
    return s.join(e, cond, how).select(
        *[F.col(f"s.{c}") for c in spine.columns],
        *[F.col(f"e.{c}") for c in event_payload],
    )
