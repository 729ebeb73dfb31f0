"""Scraper controller — the reference's pull-based periodic source
(receiver/scraperhelper/scrapercontroller.go:67-125,157-216): every
``collection_interval`` each registered scraper is invoked to produce a
metric batch, which is pushed into the pipeline.  Scrape errors are
per-scraper and non-fatal (scraperhelper partial-error semantics); the
controller keeps ticking.

Spark-first shape: a ``rate`` stream provides the tick clock (one row per
interval), and ``foreachBatch`` pulls every scraper and forwards the union
to the sink — the scraper itself stays a plain ``ScrapeFunc() ->
DataFrame`` exactly like the reference's ``scraper.ScrapeFunc``
(receiver/scraperhelper/scraper.go:19-29).

Scale stance: scrapers produce small control-plane batches (one per tick),
so the driver-side pull loop is not a data-plane bottleneck; the produced
DataFrames flow through ordinary distributed transforms downstream.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from ..exporters.obsreport import ObsReport

#: A scraper: no args, returns a metric-point DataFrame (or raises).
ScrapeFunc = Callable[[], DataFrame]


class ScrapeError(RuntimeError):
    """A scraper failed this tick; the controller records and continues."""


@dataclass
class ScraperController:
    """Periodic pull source: ``add_scraper`` then ``run_ticks`` (bounded,
    for tests/batch) or ``start_stream`` (unbounded, rate-clocked).

    obsreport counters mirror scraped/errored accounting
    (obsreport/obsreport_scraper.go semantics): ``scraped_metric_points``
    and ``errored_metric_points`` per scraper id.
    """

    collection_interval: float = 1.0
    obsreport: ObsReport = field(default_factory=ObsReport)
    _scrapers: dict[str, ScrapeFunc] = field(default_factory=dict)

    def add_scraper(self, scraper_id: str, fn: ScrapeFunc) -> None:
        if scraper_id in self._scrapers:
            raise ValueError(f"duplicate scraper id {scraper_id!r}")
        self._scrapers[scraper_id] = fn

    def scrape_once(self) -> DataFrame | None:
        """One tick: pull every scraper, union the batches; per-scraper
        errors are recorded (errored counter) and skipped, matching the
        reference's non-fatal scrape-error handling."""
        out: DataFrame | None = None
        for sid, fn in self._scrapers.items():
            try:
                df = fn()
                n = df.count()
                self.obsreport.record(sid, "metrics",
                                      "scraped_metric_points", n)
            except Exception:
                self.obsreport.record(sid, "metrics",
                                      "errored_metric_points", 1)
                continue
            out = df if out is None else out.unionByName(df)
        return out

    def run_ticks(self, n_ticks: int,
                  sink: Callable[[DataFrame], None],
                  sleep: bool = False) -> None:
        """Bounded controller loop (the test/batch twin of the stream)."""
        for _ in range(n_ticks):
            batch = self.scrape_once()
            if batch is not None:
                sink(batch)
            if sleep:
                time.sleep(self.collection_interval)

    def start_stream(self, spark: SparkSession,
                     sink: Callable[[DataFrame], None]):
        """Unbounded controller: rate source emits one tick row per
        ``collection_interval``; each micro-batch triggers one scrape
        sweep.  Returns the StreamingQuery (caller stops it)."""
        ticks = (spark.readStream.format("rate")
                 .option("rowsPerSecond", 1.0 / self.collection_interval)
                 .load())

        def on_tick(batch_df: DataFrame, _bid: int) -> None:
            if batch_df.isEmpty():
                return
            batch = self.scrape_once()
            if batch is not None:
                sink(batch)

        return (ticks.writeStream.foreachBatch(on_tick)
                .trigger(processingTime=f"{self.collection_interval} seconds")
                .start())
