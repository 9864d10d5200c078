"""Declarative job configuration.

Replaces the reference's Django model tree
(AutoProcess -> Checks/CurveInterpolation/Aggregation with child tables,
/root/reference/enhydris_autoprocess/models.py:23-78, 133-273, 276-370,
373-417) with plain dataclasses validated by the same rules. Config is
tiny and driver-side; Spark sees it only as literals folded into column
expressions or as broadcast structures.
"""

from __future__ import annotations

import csv
import datetime as dt
from dataclasses import dataclass, field
from io import StringIO

from .timeutil import (
    StepError,
    is_delta_t_valid,
    parse_offset_minutes,
    parse_step,
)


@dataclass(frozen=True)
class RangeCheckConfig:
    """Bounds for the hard/soft range check (models.py:133-148).

    Validation mirrors the reference's admin form
    (admin.py:104-119: hard bounds are mandatory in pairs — structural
    here, both fields are required floats) and its processing reality:
    ``_find_out_of_bounds_values`` calls ``Series.between(low, high)``,
    which breaks on a one-sided (None) soft bound, so soft bounds must
    come in pairs too.
    """

    lower_bound: float
    upper_bound: float
    soft_lower_bound: float | None = None
    soft_upper_bound: float | None = None

    def __post_init__(self):
        if (self.soft_lower_bound is None) != (self.soft_upper_bound is None):
            raise ValueError(
                "soft bounds must be specified in pairs (both or neither); "
                f"got soft_lower_bound={self.soft_lower_bound}, "
                f"soft_upper_bound={self.soft_upper_bound}"
            )
        if self.lower_bound > self.upper_bound:
            raise ValueError("lower_bound must not exceed upper_bound")

    @property
    def has_soft(self) -> bool:
        return self.soft_lower_bound is not None or self.soft_upper_bound is not None


@dataclass(frozen=True)
class RoccThreshold:
    """(delta_t, allowed_diff) pair (models.py:255-273)."""

    delta_t: str
    allowed_diff: float

    def __post_init__(self):
        if not is_delta_t_valid(self.delta_t):
            raise StepError(f'"{self.delta_t}" is not a valid delta_t')


@dataclass(frozen=True)
class RateOfChangeConfig:
    """Time-consistency check config (models.py:191-248).

    ``symmetric``: flag on |dv| > allowed_diff; otherwise only dv >
    positive allowed_diff or dv < negative allowed_diff
    (help text models.py:193-200).
    """

    thresholds: tuple[RoccThreshold, ...]
    symmetric: bool = False

    def sorted_thresholds(self) -> list[RoccThreshold]:
        # Reference orders by the delta_t string (models.py:226-228).
        return sorted(self.thresholds, key=lambda t: t.delta_t)

    @staticmethod
    def parse_thresholds(s: str) -> tuple[RoccThreshold, ...]:
        """Parse "10min\\t25.0" lines (set_thresholds, models.py:240-248)."""
        out = []
        for line in s.splitlines():
            if not line.strip():
                continue
            delta_t, allowed_diff = line.split()
            out.append(RoccThreshold(delta_t, float(allowed_diff)))
        return tuple(out)

    def thresholds_as_text(self) -> str:
        """Mirror of get_thresholds_as_text (models.py:234-238)."""
        return "".join(
            f"{t.delta_t}\t{t.allowed_diff}\n" for t in self.sorted_thresholds()
        )


@dataclass(frozen=True)
class CurvePeriod:
    """[start_date 00:00, end_date 23:59] UTC with a sorted point curve
    (models.py:325-360; period bound expansion models.py:317-318)."""

    start_date: dt.date
    end_date: dt.date
    points: tuple[tuple[float, float], ...]  # (x, y), any order; sorted on use

    def sorted_points(self) -> list[tuple[float, float]]:
        return sorted(self.points, key=lambda p: p[0])

    @property
    def start_ts(self) -> dt.datetime:
        return dt.datetime.combine(self.start_date, dt.time(0, 0))

    @property
    def end_ts(self) -> dt.datetime:
        return dt.datetime.combine(self.end_date, dt.time(23, 59))

    @staticmethod
    def parse_curve(s: str) -> tuple[tuple[float, float], ...]:
        """Comma/tab-mixed CSV of x,y (set_curve, models.py:350-360)."""
        s = s.replace("\t", ",")
        pts = []
        for row in csv.reader(StringIO(s)):
            if not row:
                continue
            x, y = (float(item) for item in row[:2])
            pts.append((x, y))
        return tuple(pts)


@dataclass(frozen=True)
class CurveInterpolationConfig:
    periods: tuple[CurvePeriod, ...]

    def sorted_periods(self) -> list[CurvePeriod]:
        # Reference iterates periods ordered by start_date (models.py:314);
        # later periods overwrite earlier ones on overlap.
        return sorted(self.periods, key=lambda p: p.start_date)


VALID_METHODS = ("sum", "mean", "max", "min")  # METHOD_CHOICES models.py:374-379


@dataclass(frozen=True)
class AggregationConfig:
    """Downsample config (models.py:373-417).

    ``max_missing``: how many of the source slots of one target bucket may
    be missing while still emitting the bucket (with flag MISS)
    (help text models.py:392-404).
    ``resulting_timestamp_offset``: subtracted from the bucket label after
    aggregation (models.py:406-416).
    """

    target_time_step: str
    method: str
    max_missing: int = 0
    resulting_timestamp_offset: str = ""

    def __post_init__(self):
        parse_step(self.target_time_step)  # check_time_step (models.py:447)
        if self.method not in VALID_METHODS:
            raise ValueError(f'"{self.method}" is not a valid method')
        if self.max_missing < 0:
            raise ValueError("max_missing must be >= 0")
        parse_offset_minutes(self.resulting_timestamp_offset)

    @property
    def offset_minutes(self) -> int:
        return parse_offset_minutes(self.resulting_timestamp_offset)


@dataclass(frozen=True)
class QuantileRollupConfig:
    """Per-key quantile tier over the checked series (no reference
    analog — models.py's Aggregation supports only the nine scalar
    methods; this is the percentile extension the north-star text-
    length reports need).

    ``hot_count_threshold`` (rows per (key, bucket) group): when set,
    the tier runs through ``rollup.quantile_rollup_auto`` — groups
    above the threshold use the mergeable approx_percentile sketch
    (rank error <= n/``accuracy``, O(accuracy) memory), everything
    else stays bit-exact — so one hot conversation cannot pin an
    unbounded value buffer in a single task. ``None`` keeps every
    group exact (the default; right when per-key groups are known to
    fit a task, which is the same assumption every per-key window
    makes)."""

    target_time_step: str
    quantiles: tuple[float, ...] = (0.5, 0.95)
    hot_count_threshold: int | None = None
    accuracy: int = 10000

    def __post_init__(self):
        parse_step(self.target_time_step)
        if not self.quantiles:
            raise ValueError("quantiles must be non-empty")
        if any(not 0.0 < q < 1.0 for q in self.quantiles):
            raise ValueError("quantiles must be strictly between 0 and 1")
        if self.hot_count_threshold is not None and self.hot_count_threshold <= 0:
            raise ValueError("hot_count_threshold must be positive")
        if self.accuracy <= 0:
            raise ValueError("accuracy must be positive")


@dataclass(frozen=True)
class PipelineConfig:
    """One logical series' processing DAG: checks -> (curve) -> tiers.

    Mirrors the per-TimeseriesGroup AutoProcess set; dispatch order
    fixed as (checks, curveinterpolation, aggregation)
    (as_specific_instance, models.py:41-59).
    """

    range_check: RangeCheckConfig | None = None
    rate_of_change: RateOfChangeConfig | None = None
    curve_interpolation: CurveInterpolationConfig | None = None
    aggregations: tuple[AggregationConfig, ...] = field(default_factory=tuple)
    quantile_rollups: tuple[QuantileRollupConfig, ...] = field(
        default_factory=tuple
    )
    source_time_step: str = "1min"
