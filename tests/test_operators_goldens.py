"""Spark operators must reproduce the same reference golden vectors
(cites: /root/reference/enhydris_autoprocess/tests/test_models.py)."""

import datetime as dt

import numpy as np
import pytest

from enhydris_autoprocess_spark.config import (
    AggregationConfig,
    CurveInterpolationConfig,
    CurvePeriod,
    RangeCheckConfig,
    RateOfChangeConfig,
    RoccThreshold,
)
from enhydris_autoprocess_spark.operators import (
    aggregate,
    curve_interpolation,
    range_check,
    rate_of_change_check,
    regularize,
)
from enhydris_autoprocess_spark.timeutil import parse_step

from .conftest import assert_values_equal, collect_series, series_df

UTC = dt.timezone.utc
GMT2 = dt.timezone(dt.timedelta(hours=2))
NAN = float("nan")

SEVEN = [dt.datetime(2019, 5, 21, 10, 20, tzinfo=UTC) + dt.timedelta(minutes=10 * i) for i in range(7)]


def test_range_check_golden(spark):
    # tests/test_models.py:328-375
    df = series_df(
        spark, SEVEN,
        [1.5, 2.9, 3.1, NAN, 3.8, 4.9, 7.2],
        ["", "", "", "", "FLAG1", "FLAG2", "FLAG3"],
    )
    out = range_check(df, RangeCheckConfig(2, 5, 3, 4))
    _, vals, flags = collect_series(out)
    assert_values_equal(vals, [NAN, 2.9, 3.1, NAN, 3.8, 4.9, NAN])
    assert flags == ["RANGE", "SUSPECT", "", "", "FLAG1", "FLAG2 SUSPECT", "FLAG3 RANGE"]


def test_rocc_golden(spark):
    # tests/test_models.py:470-509
    df = series_df(
        spark, SEVEN,
        [1.5, 8.9, 3.1, NAN, 3.8, 11.9, 7.2],
        ["", "", "", "", "FLAG1", "FLAG2", "FLAG3"],
    )
    cfg = RateOfChangeConfig((RoccThreshold("10min", 7.0),), symmetric=False)
    out = rate_of_change_check(df, cfg)
    _, vals, flags = collect_series(out)
    assert_values_equal(vals, [1.5, NAN, 3.1, NAN, 3.8, NAN, 7.2])
    assert flags == ["", "TEMPORAL", "", "", "FLAG1", "FLAG2 TEMPORAL", "FLAG3"]


def test_rocc_symmetric_and_negative(spark):
    df = series_df(spark, SEVEN[:3], [10.0, 2.0, 11.0], ["", "", ""])
    sym = rate_of_change_check(
        df, RateOfChangeConfig((RoccThreshold("10min", 7.0),), symmetric=True)
    )
    _, vals, flags = collect_series(sym)
    assert flags == ["", "TEMPORAL", "TEMPORAL"]
    neg = rate_of_change_check(
        df, RateOfChangeConfig((RoccThreshold("10min", -7.0),), symmetric=False)
    )
    _, _, flags = collect_series(neg)
    assert flags == ["", "TEMPORAL", ""]


def test_rocc_multi_threshold_longer_window(spark):
    # second threshold (1H) catches a slow drift the 10min one misses
    idx = [dt.datetime(2019, 5, 21, 10, 0, tzinfo=UTC) + dt.timedelta(minutes=10 * i) for i in range(5)]
    df = series_df(spark, idx, [0.0, 3.0, 6.0, 9.0, 12.0], [""] * 5)
    cfg = RateOfChangeConfig(
        (RoccThreshold("10min", 5.0), RoccThreshold("1H", 10.0)), symmetric=False
    )
    out = rate_of_change_check(df, cfg)
    _, vals, flags = collect_series(out)
    # 12.0 - 0.0 = 12 > 10 within 1H -> TEMPORAL on the last row only
    assert flags == ["", "", "", "", "TEMPORAL"]


def test_curve_golden(spark):
    # tests/test_models.py:720-790 (tz Etc/GMT-2 converted to UTC instants)
    index = [
        dt.datetime(2019, 4, 30, 12, 10, tzinfo=GMT2),
        dt.datetime(2019, 5, 21, 10, 20, tzinfo=GMT2),
        dt.datetime(2019, 5, 21, 10, 30, tzinfo=GMT2),
        dt.datetime(2019, 5, 21, 10, 40, tzinfo=GMT2),
        dt.datetime(2019, 6, 21, 10, 50, tzinfo=GMT2),
        dt.datetime(2019, 6, 21, 11, 0, tzinfo=GMT2),
        dt.datetime(2019, 6, 21, 11, 10, tzinfo=GMT2),
        dt.datetime(2019, 7, 21, 12, 10, tzinfo=GMT2),
    ]
    df = series_df(
        spark, index,
        [3.1, 2.9, 3.1, NAN, 3.1, 4.9, 7.2, 3.1],
        ["", "", "", "", "", "FLAG1", "FLAG2", ""],
    )
    cfg = CurveInterpolationConfig(
        (
            CurvePeriod(dt.date(2019, 5, 1), dt.date(2019, 5, 31), ((3, 100), (4, 150), (5, 175))),
            CurvePeriod(dt.date(2019, 6, 1), dt.date(2019, 6, 30), ((3, 200), (4, 300), (5, 350))),
        )
    )
    out = curve_interpolation(df, cfg)
    _, vals, flags = collect_series(out)
    assert_values_equal(vals, [NAN, NAN, 105.0, NAN, 210.0, 345.0, NAN, NAN])
    assert flags == [""] * 8


AGG_INDEX = (
    [dt.datetime(2019, 5, 21, 10, 0, tzinfo=UTC), dt.datetime(2019, 5, 21, 10, 10, tzinfo=UTC),
     dt.datetime(2019, 5, 21, 10, 21, tzinfo=UTC), dt.datetime(2019, 5, 21, 10, 31, tzinfo=UTC)]
    + [dt.datetime(2019, 5, 21, 10, 40, tzinfo=UTC) + dt.timedelta(minutes=10 * i) for i in range(13)]
)
AGG_VALUES = [2, 3, 5, 7, 11, 13, 17, 19, NAN, 29, 31, 37, 41, 43, 47, 53, 59]


def _agg_spark(spark, max_missing):
    # tests/test_models.py:941-1044: regularize @10min -> hourly sum, offset 1min
    df = series_df(spark, AGG_INDEX, AGG_VALUES, [""] * 17)
    reg = regularize(df, parse_step("10min"))
    cfg = AggregationConfig("H", "sum", max_missing, "1min")
    # trim compares against the RAW source end (models.py:470): the raw
    # and regularized max ts coincide here (12:40 on-grid).
    return aggregate(reg, cfg, "10min")


def _check(spark, max_missing, expected):
    out = _agg_spark(spark, max_missing)
    idx, vals, flags = collect_series(out)
    assert [(t.hour, t.minute) for t in idx] == [e[0] for e in expected]
    assert_values_equal(vals, [e[1] for e in expected])
    assert flags == [e[2] for e in expected]


def test_aggregation_max_missing_zero(spark):
    _check(spark, 0, [((10, 59), 56.0, "")])


def test_aggregation_max_missing_one(spark):
    _check(spark, 1, [((10, 59), 56.0, ""), ((11, 59), 157.0, "MISS")])


def test_aggregation_max_missing_five(spark):
    _check(
        spark, 5,
        [((9, 59), 2.0, "MISS"), ((10, 59), 56.0, ""), ((11, 59), 157.0, "MISS")],
    )


def test_aggregation_max_missing_too_high(spark):
    _check(
        spark, 10000,
        [((9, 59), 2.0, "MISS"), ((10, 59), 56.0, ""), ((11, 59), 157.0, "MISS")],
    )


def test_aggregation_methods(spark):
    df = series_df(spark, AGG_INDEX, AGG_VALUES, [""] * 17)
    reg = regularize(df, parse_step("10min"))
    for method, expected in [("mean", 56.0 / 6), ("max", 17.0), ("min", 3.0)]:
        out = aggregate(reg, AggregationConfig("H", method, 0, "1min"), "10min")
        _, vals, _ = collect_series(out)
        assert_values_equal(vals, [expected])


def test_regularize_golden_snap(spark):
    df = series_df(spark, AGG_INDEX, AGG_VALUES, [""] * 17)
    out = regularize(df, parse_step("10min"))
    idx, vals, flags = collect_series(out)
    mins = [t.minute for t in idx]
    assert 21 not in mins and 31 not in mins
    moved = [f for t, f in zip(idx, flags) if (t.hour, t.minute) in ((10, 20), (10, 30))]
    assert moved == ["DATEINSERT", "DATEINSERT"]
    assert len(idx) == 17


def test_regularize_nearest_wins(spark):
    # two records competing for one grid point: nearest wins, ties earliest
    idx = [
        dt.datetime(2019, 5, 21, 10, 1, tzinfo=UTC),   # dist 1min from 10:00
        dt.datetime(2019, 5, 21, 10, 4, tzinfo=UTC),   # dist 4min from 10:00... rounds to 10:00? 4min -> grid 10:00 (dist 4)
    ]
    df = series_df(spark, idx, [1.0, 2.0], ["", ""])
    out = regularize(df, parse_step("10min"), mode="INSTANTANEOUS")
    _, vals, flags = collect_series(out)
    assert_values_equal(vals, [1.0])
    assert flags == ["DATEINSERT"]
    # INTERVAL mode sums the competing records instead (sum channels
    # must not drop a contribution; models.py:479-481 mode selection)
    out_i = regularize(df, parse_step("10min"), mode="INTERVAL")
    _, vals_i, flags_i = collect_series(out_i)
    assert_values_equal(vals_i, [3.0])
    assert flags_i == ["DATEINSERT"]


def test_rocc_chunked_equals_plain(spark):
    """Hot-key chunked rocc (lookback-only halo window) must produce
    exactly the plain per-key result, including trips whose lookback
    record sits in the PREVIOUS chunk."""
    import numpy as np

    rng = np.random.RandomState(9)
    rows = []
    t0 = dt.datetime(2024, 1, 1, tzinfo=UTC).replace(tzinfo=None)
    for k, n in (("hot", 500), ("a", 60)):
        minutes = np.sort(rng.choice(n * 4, size=n, replace=False))
        for m in minutes:
            v = float("nan") if rng.rand() < 0.1 else float(rng.rand() * 100)
            rows.append((k, t0 + dt.timedelta(minutes=int(m)), v, ""))
    df = spark.createDataFrame(
        rows, "key string, ts timestamp, value double, flags string"
    )
    cfg = RateOfChangeConfig(
        (RoccThreshold("10min", 30.0), RoccThreshold("1H", 60.0)),
        symmetric=True,
    )
    plain = rate_of_change_check(df, cfg).orderBy("key", "ts").collect()
    chunked = (
        rate_of_change_check(df, cfg, chunk_span_seconds=7200)
        .orderBy("key", "ts")
        .collect()
    )
    assert len(plain) == len(chunked)
    import math

    for ra, rb in zip(plain, chunked):
        assert (ra.key, ra.ts, ra.flags) == (rb.key, rb.ts, rb.flags)
        assert (math.isnan(ra.value) and math.isnan(rb.value)) or ra.value == rb.value
    # chunking rejects spans that cannot carry the longest lookback
    with pytest.raises(ValueError):
        rate_of_change_check(df, cfg, chunk_span_seconds=600)
