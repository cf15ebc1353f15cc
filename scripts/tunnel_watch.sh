#!/bin/sh
# Poll the axon tunnel until it answers, then exit 0 so the session can
# launch the round-5 recapture suite (scripts/tunnel_return_r5.sh)
# deliberately — the suite must not start unattended because bench
# timings on the 1-core host are corrupted by concurrent work.
# Each probe is a killable subprocess (a wedged backend init hangs the
# whole process — see BENCH_NOTES.md tunnel-outage log).
LOG=/tmp/tunnel_watch.log
i=0
while [ "$i" -lt 140 ]; do
    if timeout 90 python -c \
        "import jax, jax.numpy as jnp; d = jax.devices(); \
         assert d[0].platform != 'cpu', d; \
         print('ALIVE', int(jnp.ones(8).sum()), d[0].platform)" \
        >>"$LOG" 2>&1; then
        echo "TUNNEL ALIVE at $(date -u +%FT%TZ) (probe $i)" >>"$LOG"
        touch /tmp/tunnel_alive
        exit 0
    fi
    echo "probe $i dead at $(date -u +%FT%TZ)" >>"$LOG"
    i=$((i + 1))
    sleep 240
done
echo "gave up after $i probes" >>"$LOG"
exit 1
