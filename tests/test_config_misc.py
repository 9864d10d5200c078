"""Config ingestion (S4/S5), validation rules, step inference (W3),
calendar-step aggregation (extension)."""

import datetime as dt

import pytest

from enhydris_autoprocess_spark.config import (
    AggregationConfig,
    CurvePeriod,
    RateOfChangeConfig,
    RoccThreshold,
)
from enhydris_autoprocess_spark.operators.aggregate import aggregate_step
from enhydris_autoprocess_spark.operators.regularize import infer_time_step
from enhydris_autoprocess_spark.timeutil import (
    StepError,
    parse_offset_minutes,
    parse_step,
    step_ratio,
)

from .conftest import collect_series, series_df

UTC = dt.timezone.utc


class TestCurveParsing:
    def test_set_curve_mixed_delimiters(self):
        # reference tests/test_models.py:694-717 (comma/tab mixed CSV)
        pts = CurvePeriod.parse_curve("5,6\n7\t8\n9,10\n")
        assert pts == ((5.0, 6.0), (7.0, 8.0), (9.0, 10.0))


class TestThresholdParsing:
    def test_round_trip(self):
        # reference tests/test_models.py:441-467
        cfg = RateOfChangeConfig(
            RateOfChangeConfig.parse_thresholds("10min\t25.0\n1H\t35.0\n")
        )
        assert cfg.thresholds_as_text() == "10min\t25.0\n1H\t35.0\n"

    def test_invalid_delta_t(self):
        for bad in ("10sec", "0min", "min", "-5min"):
            with pytest.raises(StepError):
                RoccThreshold(bad, 1.0)


class TestStepRules:
    def test_offsets(self):
        # reference tests/test_models.py:840-877 (offset regex)
        assert parse_offset_minutes("1min") == 1
        assert parse_offset_minutes("-2min") == -2
        assert parse_offset_minutes("min") == 1
        assert parse_offset_minutes("") == 0
        for bad in ("-min", "2H", "1day"):
            with pytest.raises(StepError):
                parse_offset_minutes(bad)

    def test_steps(self):
        # check_time_step behavior (reference tests/test_models.py:933-938)
        assert str(parse_step("H")) == "1H"
        assert step_ratio(parse_step("10min"), parse_step("H")) == 6
        with pytest.raises(StepError):
            parse_step("h")
        with pytest.raises(StepError):
            AggregationConfig("h", "sum")
        # calendar steps parse but have no fixed seconds
        with pytest.raises(StepError):
            parse_step("M").seconds  # noqa: B018


def test_infer_time_step(spark):
    t0 = dt.datetime(2024, 1, 1, tzinfo=UTC)
    idx_a = [t0 + dt.timedelta(minutes=10 * i) for i in range(6)]
    idx_b = [t0 + dt.timedelta(minutes=[0, 1, 2, 62, 63, 64][i]) for i in range(6)]
    df = series_df(spark, idx_a, [1.0] * 6, [""] * 6, key="a").union(
        series_df(spark, idx_b, [1.0] * 6, [""] * 6, key="b")
    )
    step_df = infer_time_step(df)
    assert step_df.columns == ["key", "step_seconds"]
    steps = {r["key"]: r["step_seconds"] for r in step_df.collect()}
    assert steps == {"a": 600, "b": 60}


def test_calendar_monthly_aggregate(spark):
    # daily series across 3 months; monthly sums, right-labeled by the
    # first instant of the next month, per-bucket expected = days in month
    t0 = dt.datetime(2024, 1, 1, tzinfo=UTC)
    idx = [t0 + dt.timedelta(days=i) for i in range(91)]  # Jan1..Mar31
    df = series_df(spark, idx, [1.0] * 91, [""] * 91)
    out = aggregate_step(
        df,
        parse_step("D"),
        parse_step("M"),
        "sum",
        max_missing=1,
    )
    rows = {r.ts: (r.value, r.flags) for r in out.collect()}
    # (start, end] semantics: a midnight-of-the-1st point belongs to the
    # bucket it ENDS, so the Dec bucket holds only Jan-1 (1 of 31 slots,
    # below min_count 30 -> dropped); Jan holds Jan-2..Feb-1 = 31/31;
    # Feb (leap) holds Feb-2..Mar-1 = 29/29; Mar holds Mar-2..Mar-31 =
    # 30/31 -> MISS.
    assert dt.datetime(2024, 1, 1) not in rows
    assert rows[dt.datetime(2024, 2, 1)] == (31.0, "")
    assert rows[dt.datetime(2024, 3, 1)] == (29.0, "")
    assert rows[dt.datetime(2024, 4, 1)] == (30.0, "MISS")


def test_regularize_interval_vs_instantaneous(spark):
    """W2 mode value semantics: a sum-channel (INTERVAL) series with two
    records snapping to one slot keeps the SUM; a sampled channel
    (INSTANTANEOUS) keeps the nearest record. Pinned against a pandas
    half-up-grid oracle (the reference goldens only pin mode selection,
    models.py:479-481)."""
    import pandas as pd

    from enhydris_autoprocess_spark.operators.regularize import (
        INSTANTANEOUS,
        INTERVAL,
        regularize,
    )
    from enhydris_autoprocess_spark.timeutil import parse_step

    t0 = dt.datetime(2024, 1, 1, 10, 0, tzinfo=UTC)
    # slots: 10:00 <- {10:01}, 10:10 <- {10:08, 10:12}, 10:20 <- {10:20}
    idx = [t0 + dt.timedelta(minutes=m) for m in (1, 8, 12, 20)]
    vals = [1.0, 2.0, 4.0, 8.0]
    df = series_df(spark, idx, vals, [""] * 4)

    # pandas oracle: snap each record to its half-up grid slot
    pdf = pd.DataFrame(
        {"ts": [t.replace(tzinfo=None) for t in idx], "value": vals}
    )
    grid = (pdf.ts + pd.Timedelta(minutes=5)).dt.floor("10min")
    o_sum = pdf.groupby(grid).value.sum()
    nearest = pdf.assign(d=(pdf.ts - grid).abs()).sort_values(["d", "ts"])
    o_near = nearest.groupby(grid[nearest.index]).value.first()

    step = parse_step("10min")
    got_i = dict(
        (r["ts"], r["value"])
        for r in regularize(df, step, mode=INTERVAL).collect()
    )
    got_n = dict(
        (r["ts"], r["value"])
        for r in regularize(df, step, mode=INSTANTANEOUS).collect()
    )
    assert got_i == {k.to_pydatetime(): v for k, v in o_sum.items()}
    assert got_n == {k.to_pydatetime(): v for k, v in o_near.items()}
    # the modes genuinely diverge on the shared slot
    shared = dt.datetime(2024, 1, 1, 10, 10)
    assert got_i[shared] == 6.0 and got_n[shared] == 2.0

    # flags: single moved record and multi-contributor slots both get
    # DATEINSERT in INTERVAL mode; only moved records do in INSTANTANEOUS
    fl_i = dict(
        (r["ts"], r["flags"])
        for r in regularize(df, step, mode=INTERVAL).collect()
    )
    fl_n = dict(
        (r["ts"], r["flags"])
        for r in regularize(df, step, mode=INSTANTANEOUS).collect()
    )
    on_grid = dt.datetime(2024, 1, 1, 10, 20)
    assert fl_i[on_grid] == "" and fl_n[on_grid] == ""
    assert fl_i[shared] == "DATEINSERT" and fl_n[shared] == "DATEINSERT"

    # NaN contributions are skipped; all-NaN slots stay missing
    import numpy as np

    df2 = series_df(spark, idx, [1.0, np.nan, 4.0, np.nan], [""] * 4)
    got2 = dict(
        (r["ts"], r["value"])
        for r in regularize(df2, step, mode=INTERVAL).collect()
    )
    assert got2[shared] == 4.0
    assert np.isnan(got2[on_grid])


def test_range_check_soft_bound_pairing():
    """Admin-form rule (reference admin.py:104-119): bounds come in
    pairs — one-sided soft bounds are a config error, not silently
    unbounded on the absent side."""
    from enhydris_autoprocess_spark.config import RangeCheckConfig

    RangeCheckConfig(0.0, 10.0)  # no soft bounds: fine
    RangeCheckConfig(0.0, 10.0, 2.0, 8.0)  # paired: fine
    with pytest.raises(ValueError, match="pairs"):
        RangeCheckConfig(0.0, 10.0, soft_lower_bound=2.0)
    with pytest.raises(ValueError, match="pairs"):
        RangeCheckConfig(0.0, 10.0, soft_upper_bound=8.0)
    with pytest.raises(ValueError, match="exceed"):
        RangeCheckConfig(10.0, 0.0)


def test_cli_load_config_full_surface():
    """The spark-submit JSON surface (scripts/run_pipeline.py) must
    express EVERY PipelineConfig field declaratively — curve periods
    (both CSV and point-list forms) and quantile tiers included."""
    import os
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "scripts"))
    from run_pipeline import load_config

    cfg = load_config(
        {
            "source_time_step": "1min",
            "range_check": {"lower_bound": 0, "upper_bound": 3000},
            "rate_of_change": {
                "symmetric": True,
                "thresholds": [["10min", 2000.0]],
            },
            "curve_interpolation": {
                "periods": [
                    {
                        "start_date": "2024-01-01",
                        "end_date": "2024-06-30",
                        "curve": "0,0\n100,150\n3000,4000",
                    },
                    {
                        "start_date": "2024-07-01",
                        "end_date": "2024-12-31",
                        "points": [[0, 1], [100, 160]],
                    },
                ]
            },
            "aggregations": [
                {"target_time_step": "H", "method": "sum", "max_missing": 10}
            ],
            "quantile_rollups": [
                {
                    "target_time_step": "1H",
                    "quantiles": [0.5, 0.95],
                    "hot_count_threshold": 1000,
                }
            ],
        }
    )
    assert cfg.range_check.upper_bound == 3000
    assert cfg.rate_of_change.symmetric is True
    p1, p2 = cfg.curve_interpolation.sorted_periods()
    assert p1.points == ((0.0, 0.0), (100.0, 150.0), (3000.0, 4000.0))
    assert p2.points == ((0.0, 1.0), (100.0, 160.0))
    assert p2.start_date == dt.date(2024, 7, 1)
    (q,) = cfg.quantile_rollups
    assert q.quantiles == (0.5, 0.95) and q.hot_count_threshold == 1000
    assert cfg.aggregations[0].method == "sum"

    # invalid literals must still raise through the JSON path
    with pytest.raises(ValueError):
        load_config(
            {"quantile_rollups": [{"target_time_step": "1H", "quantiles": [1.5]}]}
        )
