#!/bin/sh
# Pending on-chip measurements, priority-ordered — run when the axon
# tunnel recovers (wedged 2026-08-17 22:xx - ?; second outage on record,
# round-1's lasted ~4.5 h).  Each step is individually time-bounded so a
# re-wedge mid-run still leaves the earlier artifacts on disk.
set -x
cd "$(dirname "$0")/.."
mkdir -p /tmp/r4
# 1. driver-shape bench: every VERDICT row, new sub-unit wire, telemetry
timeout 1700 python bench.py >/tmp/r4/bench.json 2>/tmp/r4/bench.err
# 2. per-band still-elision A/B (the big pending lever)
timeout 900 python scripts/exp_band_elision.py --corpus terminal \
    >/tmp/r4/band_terminal.json 2>&1
timeout 900 python scripts/exp_band_elision.py --corpus bench \
    >/tmp/r4/band_bench.json 2>&1
# 3. video_call corpus device rows (kmv vs lane on dense content)
timeout 900 python scripts/exp_video_call.py >/tmp/r4/video_call.json 2>&1
# 4. plane-carry model-path A/B
timeout 900 python scripts/exp_plane_carry.py >/tmp/r4/plane_carry.json 2>&1
# 5. full on-chip parity validation (all legs incl. lane wire changes)
timeout 1200 python scripts/tpu_validate.py >/tmp/r4/validate.json 2>&1
tail -n 1 /tmp/r4/bench.json
