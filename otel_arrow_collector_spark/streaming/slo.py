"""Streaming SLO burn-rate alert — the stateful twin of q92_slo_burn.

q92 is inherently a streaming alert (the SRE-workbook multi-window
burn rule: page only when BOTH the 1-hour and the trailing 6-hour
window burn the error budget).  The batch plan computes the trailing
sum with a RANGE window over the hourly frame; Structured Streaming
has no trailing-frame window, and a stream-stream join of two
windowed aggregations (1h tumbling + 6h hopping) is unsupported — so
the twin uses the hop-explosion identity instead:

    trailing_6h(hour) == Σ events whose hour ∈ [hour-5, hour]

Each event is exploded into the 6 target hours it feeds (shift k ∈
0..5 hours forward); ONE tumbling-window aggregation over the shifted
event time then yields, per hour, both the 1-hour stats (rows with
shift 0) and the trailing 6-hour stats (all rows) — a single state
store, no join, no custom state.  Rows aggregate 6× but the frame is
calendar-bounded (|hours| rows of state), the q92/q86 adjudication.

Watermark contract: an event at hour h feeds target hours up to h+5,
so its shifted timestamps run up to 5 hours PAST its real time; the
watermark delay must therefore be >= 5 hours + the real arrival
lateness allowance for a window to collect every contributor before
append-mode finalization (pinned in tests/test_slo_stream.py).

Output matches q92 exactly (same integer cross-multiplied permilles,
same is_burning conjunction, rows only for hours with traffic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HOUR_US = 3_600_000_000

#: default lateness allowance on top of the structural 5-hour shift
DEFAULT_WATERMARK_US = 6 * HOUR_US


def slo_burn_stream(events: DataFrame,
                    watermark_us: int = DEFAULT_WATERMARK_US) -> DataFrame:
    """One row per CLOSED hour: (hour, total, errors, burn_permille_1h,
    burn_permille_6h, is_burning) — q92's schema and values.

    ``events`` needs an epoch-microsecond ``us`` column and
    ``event_type``; hours finalize in append mode once the watermark
    (which trails max shifted event time by ``watermark_us``) passes
    the hour end.  ``watermark_us`` must exceed ``5 * HOUR_US`` plus
    the expected real-world lateness (see module doc).
    """
    if watermark_us <= 5 * HOUR_US:
        raise ValueError(
            "watermark_us must exceed the structural 5-hour shift "
            "(an event feeds trailing windows up to 5 hours ahead)")
    shifted = (events
               .select("us",
                       (F.col("event_type") == "error").cast("long")
                       .alias("is_err"))
               .select(F.explode(F.expr("sequence(0, 5)")).alias("k"),
                       "us", "is_err")
               .select(F.timestamp_micros(
                           F.col("us") + F.col("k") * F.lit(HOUR_US))
                       .alias("ts_shift"),
                       (F.col("k") == 0).cast("long").alias("is_cur"),
                       "is_err"))
    wm_ms = max(watermark_us // 1000, 1)
    agg = (shifted
           .withWatermark("ts_shift", f"{wm_ms} milliseconds")
           .groupBy(F.window("ts_shift", "1 hour"))
           .agg(F.sum("is_cur").cast("long").alias("total"),
                F.sum(F.col("is_cur") * F.col("is_err")).cast("long")
                 .alias("errors"),
                F.count(F.lit(1)).cast("long").alias("total_6h"),
                F.sum("is_err").cast("long").alias("errors_6h")))
    # hours with no shift-0 rows carry only trailing spill-over from
    # earlier hours; q92's hourly groupBy has no such row — drop them
    return (agg.filter(F.col("total") > 0)
            .select(
                F.expr("unix_micros(window.start) div 3600000000")
                 .cast("long").alias("hour"),
                "total", "errors",
                F.expr("errors * 100000 div (21 * total)").cast("long")
                 .alias("burn_permille_1h"),
                F.expr("errors_6h * 100000 div (21 * total_6h)")
                 .cast("long").alias("burn_permille_6h"),
                ((F.col("errors") * 100 > 21 * F.col("total"))
                 & (F.col("errors_6h") * 100 > 21 * F.col("total_6h")))
                .alias("is_burning")))
