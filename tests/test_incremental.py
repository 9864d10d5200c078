"""Snapshot-incremental rollup: late / out-of-order ingestion must
converge to the same tiers as a one-shot computation (the property the
HWM pipeline explicitly does NOT have — pipeline.py's incremental
contract assumes event-time-monotone ingestion; incremental.py lifts
it with snapshot-range reads + merge-on-read tiers)."""

import pytest
from pyspark.sql import functions as F

from enhydris_autoprocess_spark.incremental import SnapshotIncrementalRollup
from enhydris_autoprocess_spark.rollup import build_tiers
from enhydris_autoprocess_spark.synth import generate_transcripts


@pytest.fixture(scope="module")
def transcripts(spark):
    return generate_transcripts(spark, n_convs=24, seed=23).cache()


def _canon(df):
    rows = df.select(
        "conv_id",
        "role",
        "ts",
        "turn_count",
        "tool_calls",
        "text_len_sum",
        "text_len_min",
        "text_len_max",
    ).collect()
    return {
        (r.conv_id, r.role, r.ts): (
            r.turn_count,
            r.tool_calls,
            round(r.text_len_sum, 6),
            r.text_len_min,
            r.text_len_max,
        )
        for r in rows
    }


def _ingest_shuffled(spark, roll, transcripts, n_batches=3):
    """Split by row hash — every batch carries a scatter of event times
    for every conversation, i.e. maximally out-of-order arrival."""
    b = F.pmod(F.xxhash64("conv_id", "turn_idx"), F.lit(n_batches))
    appended = []
    for i in range(n_batches):
        roll.ingest(transcripts.where(b == i))
        appended.append(roll.run())
    return appended


def test_out_of_order_ingestion_converges(spark, transcripts, tmp_path):
    roll = SnapshotIncrementalRollup(spark, str(tmp_path / "roll"))
    _ingest_shuffled(spark, roll, transcripts)

    direct = build_tiers(transcripts)
    for name in ("1min", "1H", "1D"):
        got = _canon(roll.tier(name))
        want = _canon(direct[name])
        assert got == want, f"tier {name}: {len(got)} vs {len(want)} rows"


def test_rerun_without_new_data_is_noop(spark, transcripts, tmp_path):
    roll = SnapshotIncrementalRollup(spark, str(tmp_path / "roll2"))
    roll.ingest(transcripts)
    first = roll.run()
    assert first["1min"] > 0
    again = roll.run()
    assert again == {"1min": 0, "1H": 0, "1D": 0}
    # state derives from the tier manifest: a fresh handle agrees
    fresh = SnapshotIncrementalRollup(spark, str(tmp_path / "roll2"))
    assert fresh.run() == {"1min": 0, "1H": 0, "1D": 0}


def test_compaction_preserves_view_and_state(spark, transcripts, tmp_path):
    roll = SnapshotIncrementalRollup(spark, str(tmp_path / "roll3"))
    _ingest_shuffled(spark, roll, transcripts)
    before = _canon(roll.tier("1min"))
    n_snaps_before = len(roll.tiers["1min"].snapshots())
    assert n_snaps_before >= 3  # merge-on-read debt exists
    roll.compact("1min")
    after = _canon(roll.tier("1min"))
    assert after == before
    # incremental state survives compaction
    assert roll.run() == {"1min": 0, "1H": 0, "1D": 0}
