"""bench.py must stay honest when the device tunnel is wedged.

Round-4 failure mode: the axon tunnel hung mid-run and the driver
artifact came out as ``value: 0.0, all_paths: {}`` — indistinguishable
from a catastrophic perf regression even though the host row had
completed.  The fix (VERDICT r4 item 2) is a time-boxed subprocess
liveness probe before any in-process jax import; on failure bench.py
must still emit every host and wire-size row, set
``device_unavailable: true``, report ``value: null`` (never 0.0), and
finish quickly instead of burning the hard deadline.

``BENCH_FORCE_PROBE_FAIL=1`` simulates the wedge without needing a
broken tunnel.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def degraded_run():
    env = dict(os.environ)
    env.update({
        "BENCH_FORCE_PROBE_FAIL": "1",
        # small shapes: the point is the control flow, not the numbers
        # (the corpus generator needs Y > 150, X > 200)
        "BENCH_Y": "192",
        "BENCH_X": "256",
        "BENCH_T": "8",
        # belt and braces: never let this subprocess touch the tunnel
        "JAX_PLATFORMS": "cpu",
    })
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, timeout=300, env=env, cwd=REPO)
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [ln for ln in r.stdout.strip().splitlines() if ln.strip()]
    assert lines, "bench.py printed nothing: " + r.stderr[-2000:]
    return json.loads(lines[-1]), r.stderr


def test_flag_and_null_headline(degraded_run):
    rec, _ = degraded_run
    assert rec["device_unavailable"] is True
    assert rec["value"] is None          # never 0.0
    assert rec["vs_baseline"] is None
    assert rec["all_paths"] == {}        # no device rows were attempted


def test_host_rows_present(degraded_run):
    rec, _ = degraded_run
    # the host half of the pipeline is measurable without a device
    assert rec["host_stage_fps_per_core"] > 0
    assert rec["host_stage_kmv_fps_per_core"] > 0
    assert rec["source"] == "real-encoded-1080p-screen-content"


def test_wire_size_rows_present(degraded_run):
    rec, _ = degraded_run
    lb = rec["lane_container_bytes"]
    assert lb["avi"] > 0 and lb["raw_deflate"] > 0 and lb["raw"] > 0
    assert rec["lane_host_prep_ms_per_window"] > 0
    assert rec["terminal_host_bc_fps_per_core"] > 0


def test_row_walls_recorded(degraded_run):
    rec, _ = degraded_run
    assert "host_encode_and_transports" in rec["row_wall_s"]
    assert "wire_sizes" in rec["row_wall_s"]
