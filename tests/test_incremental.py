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


def test_crash_between_tier_appends_recovers(spark, transcripts, tmp_path):
    """Per-tier consumed watermarks (ADVICE r01): a crash after the
    1min append but before the 1H/1D appends must NOT strand those
    coarse buckets — the next run finds the new 1min snapshot above the
    coarse tiers' own watermarks and catches them up."""
    import pytest as _pytest

    from enhydris_autoprocess_spark.storage import TierTable

    root = str(tmp_path / "roll4")
    roll = SnapshotIncrementalRollup(spark, root)
    b = F.pmod(F.xxhash64("conv_id", "turn_idx"), F.lit(2))
    roll.ingest(transcripts.where(b == 0))
    roll.run()

    # second batch: crash right after the 1min tier append
    roll.ingest(transcripts.where(b == 1))
    orig_append = TierTable.append

    def crashing_append(self, df, properties=None):
        if "tier_1H" in self.root:
            raise RuntimeError("simulated crash before 1H append")
        return orig_append(self, df, properties)

    TierTable.append = crashing_append
    try:
        with _pytest.raises(RuntimeError, match="simulated crash"):
            roll.run()
    finally:
        TierTable.append = orig_append

    # recovery: fresh handle (state is only in the manifests), plain run
    recovered = SnapshotIncrementalRollup(spark, root)
    caught_up = recovered.run()
    assert caught_up["1min"] == 0  # already merged before the crash
    assert caught_up["1H"] > 0 and caught_up["1D"] > 0

    direct = build_tiers(transcripts)
    for name in ("1min", "1H", "1D"):
        assert _canon(recovered.tier(name)) == _canon(direct[name]), name


def test_auto_compaction_bounds_snapshots(spark, transcripts, tmp_path):
    roll = SnapshotIncrementalRollup(
        spark, str(tmp_path / "roll5"), auto_compact_after=2
    )
    _ingest_shuffled(spark, roll, transcripts, n_batches=4)
    snaps = roll.tiers["1min"].snapshots()
    assert any(s.properties.get("kind") == "compaction" for s in snaps)
    # pending (non-compacted) snapshots stay bounded
    last_c = max(
        s.snapshot_id for s in snaps if s.properties.get("kind") == "compaction"
    )
    assert sum(1 for s in snaps if s.snapshot_id > last_c) <= 2
    # and the resolved view still equals the direct computation
    direct = build_tiers(transcripts)
    for name in ("1min", "1H", "1D"):
        assert _canon(roll.tier(name)) == _canon(direct[name]), name
