"""bench.py record-writer contract: batch-keyed filenames, the bf16
baseline canary, and the tunnel-degradation guard.

The guard protects the headline ``*_latest.json`` records the driver's
secondary lookup replays: a run whose BASELINE canary (identical code and
chip every run) collapsed below 0.6x the stored record's writes a
``_degraded`` side file instead of clobbering the headline record. It
never compares the packed value itself, so it cannot cherry-pick results.
"""
import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402


@pytest.fixture
def recdir(tmp_path, monkeypatch):
    """Point bench's record directory at a temp tree (write_record derives
    it from bench.__file__)."""
    fake = tmp_path / "bench.py"
    fake.write_text("# record-dir anchor for tests\n")
    monkeypatch.setattr(bench, "__file__", str(fake))
    return tmp_path / "results"


def _read(recdir, name):
    with open(recdir / name) as f:
        return json.load(f)


def test_headline_and_offbatch_filenames(recdir):
    rec = {"metric": "m1_packed_inference", "value": 100.0,
           "unit": "img/s/chip", "vs_baseline": 1.5}
    bench.write_record(dict(rec), batch=256, headline_batch=256)
    bench.write_record(dict(rec, value=50.0), batch=8, headline_batch=256)
    assert _read(recdir, "BENCH_m1_packed_inference_latest.json")["value"] == 100.0
    assert _read(recdir, "BENCH_m1_packed_inference_b8_latest.json")["value"] == 50.0


def test_degraded_window_guard_protects_headline(recdir):
    good = {"metric": "m2_packed_inference", "value": 5000.0,
            "unit": "img/s/chip", "vs_baseline": 2.0,
            "baseline_img_per_s": 2500.0}
    bench.write_record(dict(good), batch=128, headline_batch=128)

    # tunnel collapse: baseline canary at 4% of the recorded one
    bad = {"metric": "m2_packed_inference", "value": 180.0,
           "unit": "img/s/chip", "vs_baseline": 1.7,
           "baseline_img_per_s": 105.0}
    out = bench.write_record(dict(bad), batch=128, headline_batch=128)

    assert out["degraded_window"] is True
    assert out["recorded_baseline_img_per_s"] == 2500.0
    # headline record untouched; measurement parked in the side file
    assert _read(recdir, "BENCH_m2_packed_inference_latest.json")["value"] == 5000.0
    assert _read(recdir,
                 "BENCH_m2_packed_inference_degraded_latest.json")["value"] == 180.0


def test_healthy_slower_run_still_overwrites(recdir):
    """The guard keys on the baseline canary, NOT the packed value: a
    healthy-window run with a WORSE packed number must overwrite (a real
    regression has to be able to land in the record)."""
    bench.write_record({"metric": "m3_packed_inference", "value": 5000.0,
                        "unit": "img/s/chip", "vs_baseline": 2.0,
                        "baseline_img_per_s": 2500.0},
                       batch=128, headline_batch=128)
    out = bench.write_record({"metric": "m3_packed_inference", "value": 4000.0,
                              "unit": "img/s/chip", "vs_baseline": 1.6,
                              "baseline_img_per_s": 2500.0},
                             batch=128, headline_batch=128)
    assert "degraded_window" not in out
    assert _read(recdir, "BENCH_m3_packed_inference_latest.json")["value"] == 4000.0


def test_records_without_canary_skip_the_guard(recdir):
    """Script writers (serving, clip) don't carry the canary; the guard
    must stay inert for them."""
    bench.write_record({"metric": "m4_serving", "value": 200.0,
                        "unit": "img/s/chip"}, batch=128, headline_batch=128)
    out = bench.write_record({"metric": "m4_serving", "value": 20.0,
                              "unit": "img/s/chip"}, batch=128,
                             headline_batch=128)
    assert "degraded_window" not in out
    assert _read(recdir, "BENCH_m4_serving_latest.json")["value"] == 20.0
