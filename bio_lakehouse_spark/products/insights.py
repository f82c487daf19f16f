"""Insight analyzers + weekly report (ref insights_engine/insights/
base.py:26-53, sleep_readiness.py, readiness_trend.py,
training_load.py; report: reports/weekly_report.py — S17).

The reference's contract: ``analyze() -> InsightResult`` with
statistics, narrative, caveats (n<30 and p>0.05 warnings). Here
``analyze`` runs Spark ops against the engine's views and collects
only the small result; ``visualize`` returns a plot *spec* dict
(plotly isn't in this container — the spec carries the same content).
The weekly report fans across analyzers and renders text/HTML with
str.format templates (no jinja dependency).
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from dataclasses import dataclass, field
from pathlib import Path

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bio_lakehouse_spark.products.numerics import linregress


def ema_exact_series(s: pd.Series, span: int) -> pd.Series:
    """pandas ``ewm(span, adjust=False)`` — the exact-EMA semantics
    (W10 insights parity; the SQL layer's rolling-AVG approximation
    lives in operators.windows.ema_rolling_approx)."""
    return s.ewm(span=span, adjust=False).mean()


@dataclass
class InsightResult:
    name: str
    statistics: dict
    narrative: str
    caveats: list[str] = field(default_factory=list)
    data: pd.DataFrame | None = None


class InsightAnalyzer(ABC):
    name = "insight"

    @abstractmethod
    def analyze(self) -> InsightResult: ...

    def visualize(self, result: InsightResult) -> dict:
        """Plot spec (kind, x, y, title) — presentation layer renders."""
        return {"kind": "table", "title": self.name}

    def _base_caveats(self, n: int, p: float | None = None) -> list[str]:
        caveats = []
        if n < 30:
            caveats.append(
                f"Small sample (n={n} < 30) — treat as directional."
            )
        if p is not None and p > 0.05:
            caveats.append(
                f"Not statistically significant (p={p:.3f} > 0.05)."
            )
        return caveats


class SleepReadinessAnalyzer(InsightAnalyzer):
    """ST1 (ref insights/sleep_readiness.py:25-105): previous-night
    sleep → next-day readiness regression."""

    name = "sleep_readiness"

    def __init__(self, sleep_prediction: DataFrame) -> None:
        self.view = sleep_prediction

    def analyze(self) -> InsightResult:
        pdf = (
            self.view.filter(
                F.col("prev_night_sleep").isNotNull()
                & F.col("next_day_readiness").isNotNull()
            )
            .select("sleep_date", "prev_night_sleep", "next_day_readiness")
            .toPandas()
        )
        n = len(pdf)
        if n < 3:
            return InsightResult(self.name, {"n": n},
                                 "Not enough data for a sleep-readiness fit.",
                                 [f"n={n}"])
        reg = linregress(
            pdf["prev_night_sleep"].to_numpy(dtype=float),
            pdf["next_day_readiness"].to_numpy(dtype=float),
        )
        narrative = (
            f"Each additional sleep point predicts "
            f"{reg['slope']:+.2f} readiness points next day "
            f"(r={reg['r']:.2f}, n={n})."
        )
        return InsightResult(
            self.name,
            {"n": n, **{k: reg[k] for k in ("slope", "intercept", "r", "p")}},
            narrative,
            self._base_caveats(n, reg["p"]),
            data=pdf,
        )


class ReadinessTrendAnalyzer(InsightAnalyzer):
    """ST7 (ref insights/readiness_trend.py:43-64): slope of the tail
    of the 14-day moving average → improving/stable/declining."""

    name = "readiness_trend"

    def __init__(self, gold: DataFrame, tail_days: int = 14,
                 stable_band: float = 0.3) -> None:
        self.gold = gold
        self.tail_days = tail_days
        self.stable_band = stable_band

    def analyze(self) -> InsightResult:
        from pyspark.sql import Window

        w = Window.orderBy("date").rowsBetween(-13, 0)
        pdf = (
            self.gold.filter(F.col("readiness_score").isNotNull())
            .select("date", F.avg("readiness_score").over(w).alias("ma14"))
            .orderBy("date")
            .toPandas()
            .tail(self.tail_days)
        )
        n = len(pdf)
        import numpy as np

        reg = linregress(np.arange(n, dtype=float),
                         pdf["ma14"].to_numpy(dtype=float))
        slope = reg["slope"]
        trend = ("improving" if slope > self.stable_band
                 else "declining" if slope < -self.stable_band else "stable")
        return InsightResult(
            self.name,
            {"n": n, "slope": slope, "trend": trend},
            f"Readiness trend over the last {n} days is {trend} "
            f"({slope:+.2f} pts/day on the 14-day average).",
            self._base_caveats(n),
            data=pdf,
        )


class TrainingLoadAnalyzer(InsightAnalyzer):
    """ST9/ST15 (ref insights/training_load.py:21-108): exact-EMA
    CTL/ATL/TSB + form band + rolling-baseline recovery impairment."""

    name = "training_load"

    def __init__(self, training_load: DataFrame, gold: DataFrame) -> None:
        self.tl = training_load
        self.gold = gold

    def analyze(self) -> InsightResult:
        tss = self.tl.orderBy("date").select("date", "tss").toPandas()
        n = len(tss)
        ctl = ema_exact_series(tss["tss"].fillna(0.0), span=42)
        atl = ema_exact_series(tss["tss"].fillna(0.0), span=7)
        tsb = float(ctl.iloc[-1] - atl.iloc[-1]) if n else 0.0
        form = ("fresh" if tsb > 15 else "neutral" if tsb >= 0
                else "building" if tsb >= -15 else "fatigued")
        # Rolling 14-day baselines, impairment flags (ST15).
        from pyspark.sql import Window

        wb = Window.orderBy("date").rowsBetween(-14, -1)
        latest = (
            self.gold.filter(F.col("resting_heart_rate_bpm").isNotNull())
            .select(
                "date",
                "resting_heart_rate_bpm",
                "hrv_ms",
                F.avg("resting_heart_rate_bpm").over(wb).alias("rhr_base"),
                F.avg("hrv_ms").over(wb).alias("hrv_base"),
            )
            .orderBy(F.desc("date"))
            .limit(1)
            .collect()
        )
        impaired = False
        if latest:
            r = latest[0]
            impaired = bool(
                tsb < -15
                and r["rhr_base"] is not None
                and (
                    r["resting_heart_rate_bpm"] > 1.10 * r["rhr_base"]
                    or (r["hrv_base"] is not None
                        and r["hrv_ms"] < 0.85 * r["hrv_base"])
                )
            )
        stats = {
            "n": n,
            "ctl": round(float(ctl.iloc[-1]), 1) if n else 0.0,
            "atl": round(float(atl.iloc[-1]), 1) if n else 0.0,
            "tsb": round(tsb, 1),
            "form": form,
            "recovery_impaired": impaired,
        }
        return InsightResult(
            self.name,
            stats,
            f"CTL {stats['ctl']}, ATL {stats['atl']}, TSB {stats['tsb']} "
            f"→ form: {form}"
            + (" — recovery impairment flags active." if impaired else "."),
            self._base_caveats(n),
        )


REPORT_TEMPLATE = """<html><body>
<h1>Weekly Report — {week}</h1>
{sections}
</body></html>"""

SECTION_TEMPLATE = """<h2>{name}</h2>
<p>{narrative}</p>
{caveats}
"""


class WeeklyReportGenerator:
    """S17 (ref reports/weekly_report.py:121-205): fan across the
    analyzers sequentially, render, deliver to a file sink."""

    def __init__(self, analyzers: list[InsightAnalyzer]) -> None:
        self.analyzers = analyzers

    def generate(self, week_label: str) -> tuple[str, list[InsightResult]]:
        results = [a.analyze() for a in self.analyzers]
        sections = []
        for r in results:
            caveats = (
                "<ul>" + "".join(f"<li>{c}</li>" for c in r.caveats) + "</ul>"
                if r.caveats else ""
            )
            sections.append(
                SECTION_TEMPLATE.format(
                    name=r.name, narrative=r.narrative, caveats=caveats
                )
            )
        return (
            REPORT_TEMPLATE.format(week=week_label,
                                   sections="\n".join(sections)),
            results,
        )

    def deliver(self, html: str, path: str | Path) -> str:
        out = Path(path)
        out.parent.mkdir(parents=True, exist_ok=True)
        out.write_text(html, encoding="utf-8")
        return str(out)
