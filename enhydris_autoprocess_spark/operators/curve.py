"""Curve interpolation — piecewise-linear value map as a chained CASE
expression (zero UDFs; np.interp semantics reproduced exactly).

Pinned by the reference's CurveInterpolation.process_timeseries
(/root/reference/enhydris_autoprocess/models.py:309-322) and golden
tests/test_models.py:720-790:

- each CurvePeriod covers [start_date 00:00, end_date 23:59] in UTC
  instants (models.py:316-318) regardless of the data's display tz;
- inside a period: value' = np.interp(v, xs, ys, left=NaN, right=NaN)
  — x < x0 or x > xn -> NaN; NaN -> NaN; exact knot -> its y;
- timestamps outside all periods -> NaN;
- output flags are reset to "" (models.py:313);
- periods are applied in start_date order, later periods overwriting
  overlaps (models.py:314).

Config is a handful of knots — folded into the plan as literals, so
Catalyst constant-handling + codegen keep this as cheap as arithmetic.
The period assignment that would be a range join becomes a CASE chain
(SURVEY.md §4: the only candidate for a custom rule, avoided).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..config import CurveInterpolationConfig, CurvePeriod
from ..schema import NAN


def _interp_expr(value: Column, period: CurvePeriod) -> Column:
    """np.interp(v, xs, ys, left=NaN, right=NaN) as a CASE chain."""
    pts = period.sorted_points()
    if not pts:
        return F.lit(NAN)
    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]
    expr = F.lit(NAN)  # v > xn
    # Build from the right: when v <= x_{k+1} -> lerp on [x_k, x_{k+1}].
    for k in range(len(pts) - 2, -1, -1):
        x0, x1, y0, y1 = xs[k], xs[k + 1], ys[k], ys[k + 1]
        if x1 == x0:
            seg = F.lit(y1)
        else:
            seg = F.lit(y0) + (value - F.lit(x0)) * F.lit((y1 - y0) / (x1 - x0))
        expr = F.when(value <= F.lit(x1), seg).otherwise(expr)
    expr = F.when(value < F.lit(xs[0]), F.lit(NAN)).otherwise(expr)
    if len(pts) == 1:
        # np.interp with one knot: exact x -> y, else left/right NaN.
        expr = F.when(value == F.lit(xs[0]), F.lit(ys[0])).otherwise(F.lit(NAN))
    return F.when(F.isnan(value), F.lit(NAN)).otherwise(expr)


def curve_interpolation(
    df: DataFrame,
    cfg: CurveInterpolationConfig,
    ts_col: str = "ts",
    value_col: str = "value",
    flags_col: str = "flags",
) -> DataFrame:
    value = F.col(value_col)
    ts = F.col(ts_col)
    missing_in = value.isNull() | F.isnan(value)
    v = F.when(missing_in, F.lit(NAN)).otherwise(value)

    result = F.lit(NAN)  # outside all periods
    for period in cfg.sorted_periods():
        in_period = (ts >= F.lit(period.start_ts)) & (ts <= F.lit(period.end_ts))
        result = F.when(in_period, _interp_expr(v, period)).otherwise(result)

    return df.withColumns({value_col: result, flags_col: F.lit("")})
