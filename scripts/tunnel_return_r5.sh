#!/bin/sh
# Round-5 remaining on-chip queue (rev 2, after the Aug 18 10:21-14:07
# tunnel session captured validate/bench-partial/band-elision/seek).
# Run the moment the tunnel recovers from the 14:07 re-wedge.  Each step
# is individually time-bounded so a re-wedge mid-run still leaves the
# earlier artifacts on disk under /tmp/r5.
set -x
cd "$(dirname "$0")/.."
mkdir -p /tmp/r5
# 0. parity first: the action-plane rewrite (bc + lane scans) must be
#    bit-exact on the real chip before any perf number is quotable
timeout 1200 python scripts/tpu_validate.py --parity-only \
    >/tmp/r5/validate2.json 2>&1
# 1. driver-shape bench with the fixed row order: the canonical record
#    (headline + lane + terminal + stills curve before optional rows),
#    and the lane rows A/B against the morning's pre-action-plane
#    17.8k/25.8k record
timeout 1700 python bench.py >/tmp/r5/bench3.json 2>/tmp/r5/bench3.err
# 2. video_call corpus device rows (kmv vs lane on dense content)
timeout 1200 python scripts/exp_video_call.py >/tmp/r5/video_call2.json 2>&1
# 3. plane-carry model-path A/B (perf leg; bit-exact leg green 12:42)
timeout 1200 python scripts/exp_plane_carry.py >/tmp/r5/plane_carry2.json 2>&1
tail -n 1 /tmp/r5/bench3.json
