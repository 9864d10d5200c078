import datetime as dt

import numpy as np
import pandas as pd
import pytest

from enhydris_autoprocess_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    s = build_session(app_name="tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


UTC = dt.timezone.utc


def series_df(spark, index, values, flags, key="k1"):
    """Build a Spark (key, ts, value, flags) frame from reference-style
    vectors. Timestamps are converted to UTC instants (tz dropped after
    conversion; session tz is UTC)."""
    rows = []
    for ts, v, f in zip(index, values, flags):
        ts_utc = ts.astimezone(UTC).replace(tzinfo=None)
        rows.append((key, ts_utc, float(v), f))
    return spark.createDataFrame(rows, "key string, ts timestamp, value double, flags string")


def collect_series(df, key="k1"):
    """Collect back to (index, values, flags) sorted by ts for comparison."""
    rows = df.where(df.key == key).orderBy("ts").collect()
    idx = [r["ts"] for r in rows]
    vals = [r["value"] for r in rows]
    flags = [r["flags"] for r in rows]
    return idx, vals, flags


def assert_values_equal(actual, expected):
    assert len(actual) == len(expected), f"{actual} vs {expected}"
    for a, e in zip(actual, expected):
        if e is None or (isinstance(e, float) and np.isnan(e)):
            assert a is None or np.isnan(a), f"{a} != NaN"
        else:
            assert a == pytest.approx(e), f"{a} != {e}"


def pandas_frame(index, values, flags):
    return pd.DataFrame(
        {"value": np.array(values, dtype=float), "flags": list(flags)},
        index=pd.DatetimeIndex(index),
    )
