"""bench.py driver-contract pins (no Ray needed).

The round driver keeps only the LAST 2000 characters of bench output
and json-parses the final line.  Round 3's final line grew past that
(143 inline secondary timings) and the driver recorded ``parsed: null``
— every number invisible.  These tests pin the compact-line contract so
it cannot regress as the query surface keeps growing.
"""

import json

import bench


def _synthetic_payload(n_secondaries: int) -> dict:
    q = {"crawl": 21.7}
    for i in range(n_secondaries):
        q[f"synthetic_query_{i:03d}_with_a_long_name"] = round(1 + i * 0.03, 3)
    for k in bench.HEADLINE_QUERIES[1:]:
        q[k] = 2.5
    return {
        "metric": "crawl_urls_fetched_extracted_per_sec",
        "value": 21.7,
        "unit": "sec",
        "queries": q,
        "sf": "/root/testdata/sf0.1",
        "num_cpus": 32,
        "crawl": {
            "pages": 904177,
            "waves": 12,
            "urls_seen": 1234810,
            "events": 2276038,
            "urls_per_sec": 56900.0,
        },
        "crawl_runs_sec": [21.7, 22.3, 25.1],
        "crawl_runs_load": [[1.0, 2.0]] * 3,
        "noise_retries": 0,
        "child_crashes": 0,
        "load_avg_before": [1.0, 2.0, 3.0],
        "load_avg_after": [9.0, 9.0, 9.0],
        "dedup_recall": {
            "planted": 441,
            "minhash_recall": 1.0,
            "simhash_recall": 0.95,
            "minhash_precision": 0.58,
            "verified_recall": 1.0,
            "verified_precision": 0.58,
            "minhash_sec": 15.8,
            "simhash_sec": 3.9,
            "verify_sec": 2.8,
        },
    }


def test_compact_line_fits_driver_tail(tmp_path, monkeypatch):
    monkeypatch.setenv("BRINKRAY_BENCH_FULL", str(tmp_path / "full.json"))
    # 3x the current secondary count — headroom for future growth
    payload = _synthetic_payload(600)
    line = json.dumps(bench.compact_payload(payload))
    assert len(line) <= 1800
    # driver simulation: last 2000 chars of (logs + line), parse final line
    tail = ("ray log noise\n" * 40 + line)[-2000:]
    parsed = json.loads(tail.splitlines()[-1])
    assert parsed["value"] == 21.7
    assert parsed["unit"] == "sec"
    assert parsed["queries"]["crawl"] == 21.7
    # scaling-mode consumers need these intact
    assert parsed["crawl"]["urls_per_sec"] == 56900.0
    assert parsed["crawl_runs_sec"] == [21.7, 22.3, 25.1]


def test_compact_sidecar_holds_full_sweep(tmp_path, monkeypatch):
    monkeypatch.setenv("BRINKRAY_BENCH_FULL", str(tmp_path / "full.json"))
    payload = _synthetic_payload(150)
    compact = bench.compact_payload(payload)
    assert compact["secondaries"]["n"] == len(payload["queries"]) - 1
    with open(compact["full_payload"]) as f:
        full = json.load(f)
    assert full["queries"] == payload["queries"]
    assert full["crawl_runs_load"] == payload["crawl_runs_load"]
    # recall summary survives in the compact line
    assert compact["dedup_recall"]["minhash_recall"] == 1.0


def test_compact_handles_scaling_only_payload(tmp_path, monkeypatch):
    monkeypatch.setenv("BRINKRAY_BENCH_FULL", str(tmp_path / "full.json"))
    payload = _synthetic_payload(0)
    payload["queries"] = {"crawl": 21.7}
    del payload["dedup_recall"]
    compact = bench.compact_payload(payload)
    assert compact["queries"] == {"crawl": 21.7}
    assert compact["secondaries"] == {"n": 0, "total_sec": 0, "max_sec": None}
    assert "dedup_recall" not in compact
