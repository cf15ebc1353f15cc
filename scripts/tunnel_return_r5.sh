#!/bin/sh
# Round-5 on-chip recapture suite, priority-ordered per VERDICT r4 — run
# the moment the axon tunnel recovers from the 2026-08-17 22:xx wedge.
# Each step is individually time-bounded so a re-wedge mid-run still
# leaves the earlier artifacts on disk under /tmp/r5.
set -x
cd "$(dirname "$0")/.."
mkdir -p /tmp/r5
# 0. liveness + parity first: everything after assumes a working chip
timeout 1200 python scripts/tpu_validate.py >/tmp/r5/validate.json 2>&1
# 1. driver-shape bench: every VERDICT row, new sub-unit wire, telemetry
timeout 1700 python bench.py >/tmp/r5/bench.json 2>/tmp/r5/bench.err
# 2. per-band still-elision A/B (the big pending lever)
timeout 900 python scripts/exp_band_elision.py --corpus terminal \
    >/tmp/r5/band_terminal.json 2>&1
timeout 900 python scripts/exp_band_elision.py --corpus bench \
    >/tmp/r5/band_bench.json 2>&1
# 3. video_call corpus device rows (kmv vs lane on dense content)
timeout 900 python scripts/exp_video_call.py >/tmp/r5/video_call.json 2>&1
# 4. plane-carry model-path A/B
timeout 900 python scripts/exp_plane_carry.py >/tmp/r5/plane_carry.json 2>&1
# 5. seek latency on the real chip (VERDICT item 6 baseline + any fix)
timeout 900 python scripts/exp_seek_latency.py >/tmp/r5/seek.json 2>&1
tail -n 1 /tmp/r5/bench.json
