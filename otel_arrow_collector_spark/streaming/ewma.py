"""Streaming EWMA revenue smoother — the stateful twin of
q101_ewma_smoothing.

The batch query smooths DAILY revenue with the truncated exponential
kernel w(lag) = 3^lag * 4^(W-lag), lag 0..W, published as num // 4^W.
Because the kernel is linear, it distributes over the daily sum:

    sum_days(daily_cents * w)  ==  sum_orders(cents * w)

so the stream needs NO pre-aggregation step: each arriving order row
explodes into its W+1 forward contributions (day d feeds target days
d..d+W), and ONE tumbling 1-day window aggregation per (priority,
target day) sums the exact integer terms — the hop-explosion identity
(streaming/slo.py), same single state store, no join, no custom state.
Shift-0 rows double as the day's own revenue and as the "day has real
traffic" marker (the batch plan's inner join back to ``daily``).

Watermark contract: an order at day d feeds target days up to d+W, so
its shifted timestamps run up to W days PAST its real time; the
watermark delay must exceed W days plus the real lateness allowance
(pinned in tests/test_ewma_stream.py).

Output matches q101 exactly for every closed day with traffic:
(pr, day, revenue_cents, ewma_scaled) in exact integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.relational import EWMA_W

DAY_US = 86_400_000_000

#: default lateness allowance on top of the structural W-day shift
DEFAULT_WATERMARK_US = (EWMA_W + 2) * DAY_US


def ewma_stream(orders: DataFrame,
                watermark_us: int = DEFAULT_WATERMARK_US) -> DataFrame:
    """One row per CLOSED day with traffic: (pr, day, revenue_cents,
    ewma_scaled) — q101_ewma_smoothing's schema and values.

    ``orders`` needs ``pr`` (priority string), ``day_us`` (epoch
    microseconds at any instant inside the order's day) and ``cents``
    (integer).  Days finalize in append mode once the watermark
    (which trails max SHIFTED event time by ``watermark_us``) passes
    the day end."""
    if watermark_us <= EWMA_W * DAY_US:
        raise ValueError(
            f"watermark_us must exceed the structural {EWMA_W}-day "
            f"shift (an order feeds smoothed days up to "
            f"{EWMA_W} days ahead)")
    shifted = (orders
               .select("pr",
                       (F.col("day_us") - F.col("day_us") % DAY_US)
                       .alias("d0"), "cents")
               .select("pr", "d0", "cents",
                       F.explode(F.expr(f"sequence(0, {EWMA_W})"))
                       .alias("lag"))
               .select(
                   "pr",
                   F.timestamp_micros(F.col("d0")
                                      + F.col("lag") * F.lit(DAY_US))
                   .alias("ts_shift"),
                   (F.col("lag") == 0).cast("long").alias("is_cur"),
                   # decimal(38,0) terms — q101's overflow discipline:
                   # cents * 4^W brushes BIGINT at large SF
                   (F.col("cents").cast("decimal(38,0)")
                    * F.expr("CAST(power(3, lag) AS BIGINT)")
                    * F.expr(f"CAST(power(4, {EWMA_W} - lag) AS BIGINT)")
                    ).alias("term"),
                   "cents"))
    wm_ms = max(watermark_us // 1000, 1)
    agg = (shifted
           .withWatermark("ts_shift", f"{wm_ms} milliseconds")
           .groupBy("pr", F.window("ts_shift", "1 day"))
           .agg(F.sum(F.col("is_cur") * F.col("cents")).cast("long")
                .alias("revenue_cents"),
                F.sum("is_cur").cast("long").alias("n_cur"),
                F.sum("term").alias("num")))
    # days with no shift-0 rows carry only spill-over from earlier
    # days; q101's inner join back to the daily frame has no such row
    return (agg.filter(F.col("n_cur") > 0)
            .select("pr",
                    F.col("window.start").cast("date").alias("day"),
                    "revenue_cents",
                    F.expr(f"num div {4 ** EWMA_W}").cast("long")
                    .alias("ewma_scaled")))
