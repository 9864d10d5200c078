"""The bench's line of record must survive the driver's stdout tail
capture (~2.1 KB): rounds 1-5 all recorded ``parsed: null``, round 5
purely because the final JSON line was ~5.3 KB. ``compact_line`` is the
fix — these tests pin its size cap, its shed order, and that the
contract keys (metric/value/unit/queries/sf) always survive."""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import bench  # noqa: E402


def _fat_result(n_queries: int = 17) -> dict:
    return {
        "metric": "headline_queries_total",
        "value": 16.4,
        "unit": "sec",
        "sf": "/root/testdata/sf0.1",
        "cpus": 32,
        "sections_done": [
            "gorilla_codec",
            "scaling",
            "headline",
            "pipeline_compressed",
        ],
        "queries": {f"query_name_{i:02d}": 1.234 for i in range(n_queries)},
        "queries_min": {f"query_name_{i:02d}": 1.0 for i in range(n_queries)},
        "queries_protocol": "median_of_3_cache_released",
        "headline_host_context": {
            "steal_share": 0.093,
            "probe_pre_eff": 0.886,
            "probe_post_eff": 1.22,
        },
        "gorilla_codec": {
            "points": 65536,
            "encode_scalar_pts_per_sec": 313075.3,
            "encode_fast_pts_per_sec": 1210102.5,
            "encode_speedup": 3.87,
            "decode_pts_per_sec": 4314299.5,
        },
        "scaling": {
            "n": 2,
            "attempts": 6,
            "clean_pairs": [2, 5],
            "efficiency_n_to_4n": 0.81,
            "efficiency_clean_pairs": 0.84,
            "efficiency_all_pairs": 0.79,
            "efficiency_vs_sustained_bw": 0.967,
            "host_sustained_bw_eff": 0.68,
            "turns_per_sec_local2": 52000.1,
            "turns_per_sec_local8": 171000.9,
            "throughput_points_per_sec_local2": 110000.5,
            "throughput_points_per_sec_local8": 361000.2,
            "stop_reason": "target_met_resume",
            # big sub-objects the compact line must NOT inline
            "ladder": [{f"k{j}": j * 1.0 for j in range(20)}] * 10,
            "resume_probes": [{"eff": 0.9, "steal_share": 0.02}] * 20,
        },
        "pipeline_compressed": {
            "turns": 4761822,
            "run_seconds": 160.421,
            "turns_per_sec": 29683.3,
            "stages": {f"s{j}": {"seconds": 1.0, "rows": 10} for j in range(5)},
            "gorilla_bytes_per_point": 2.73,
            "spark_encode_pts_per_sec": 1673947.9,
            "spark_decode_pts_per_sec": 4207043.9,
            "roundtrip_ok": True,
        },
        "elapsed_s": 2817.0,
    }


def test_compact_line_fits_driver_tail_capture():
    line = bench.compact_line(_fat_result())
    assert len(line.encode()) <= bench._LINE_CAP_BYTES
    parsed = json.loads(line)
    for key in ("metric", "value", "unit", "queries", "sf"):
        assert key in parsed, key
    assert len(parsed["queries"]) == 17
    # the scaling summary carries the gate evidence, not the raw ladder
    assert "ladder" not in parsed.get("scaling", {})
    assert "resume_probes" not in parsed.get("scaling", {})
    assert parsed["scaling"]["efficiency_n_to_4n"] == 0.81
    assert parsed["scaling"]["clean_pairs"] == [2, 5]
    assert parsed["sidecar"] == "bench_partial.json"


def test_compact_line_sheds_to_cap_but_keeps_contract_keys():
    fat = _fat_result(n_queries=30)  # query block alone ~1 KB
    line = bench.compact_line(fat, cap=900)
    assert len(json.loads(line)["queries"]) == 30  # queries never shed
    parsed = json.loads(line)
    for key in ("metric", "value", "unit", "queries", "sf"):
        assert key in parsed, key
    # optional keys were shed to approach the cap
    assert "gorilla_codec" not in parsed
    assert "sections_done" not in parsed


def test_compact_line_truncates_worker_error_stop_reason():
    fat = _fat_result()
    fat["scaling"]["stop_reason"] = "resume_worker_error: " + "x" * 280
    parsed = json.loads(bench.compact_line(fat))
    assert len(parsed["scaling"]["stop_reason"]) <= 60


def test_compact_line_minimal_result_parses():
    # the alarm path can fire before any section completed
    line = bench.compact_line(
        {"metric": "headline_queries_total", "value": 0.0, "sf": "x"}
    )
    parsed = json.loads(line)
    assert parsed["value"] == 0.0
    assert parsed["unit"] == "sec"
