"""Benchmark: 1080p ScreenPressor decode throughput on the device pipeline.

North-star metric (BASELINE.json): ≥10,000 1080p ScreenPressor frames/sec/chip
with bit-exact frame parity.  Parity is enforced by the test suite (oracle ↔
native ↔ device, encoder→decoder round trips); this harness measures decode
throughput on REAL encoded streams:

  1. encode 1080p screen content with the native C++ encoder (scrolls, window
     paints, stills — the motion/data/copy mix the codec targets);
  2. host stage: native C++ entropy decode + command capture (measured
     separately; ~4-5k fps/core standalone, runs in parallel with device
     work);
  3. device stage (the reported metric): P-chain reconstruction via lax.scan
     over command tensors.  Timing uses a TWO-POINT method — run an
     in-program fori_loop at two rep counts and take the marginal cost per
     rep — because this environment's axon tunnel adds a ~25 ms fixed
     dispatch cost per Python->device call that would otherwise swamp the
     device time (production hosts dispatch in microseconds).  Completion
     is forced by scalar readback (the tunnel's block_until_ready returns
     early).

Falls back to synthetic command tensors when the native library is absent.
Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

import numpy as np

# env-overridable so the wedge-simulation test can shrink the workload
Y = int(os.environ.get("BENCH_Y", 1080))
X = int(os.environ.get("BENCH_X", 1920))
T = int(os.environ.get("BENCH_T", 64))  # GOP-sized scan window
BASELINE = 10_000.0  # north-star target (BASELINE.md)


def probe_device(timeout_s: float) -> bool:
    """Time-boxed SUBPROCESS probe of accelerator liveness.

    The axon tunnel wedges for hours (rounds 1 and 4) and a hung backend
    init poisons the whole process — ``import jax`` itself may never
    return — so the probe must run in a child we can kill.  True only if
    the child enumerated devices AND completed one dispatch + readback
    inside the deadline.  ``BENCH_FORCE_PROBE_FAIL`` simulates the wedge
    for tests.
    """
    import subprocess

    if os.environ.get("BENCH_FORCE_PROBE_FAIL"):
        return False
    code = ("import jax, jax.numpy as jnp; "
            "d = jax.devices(); "
            "print('ALIVE', int(jnp.ones(8).sum()), d[0].platform)")
    # Two attempts: a single failure demotes the WHOLE record to host-only
    # rows, and one observed false negative (2026-08-18 14:07, tunnel alive
    # minutes later) was a transient wedge/steal burst, not an outage.
    for attempt in (1, 2):
        try:
            r = subprocess.run([sys.executable, "-c", code],
                               capture_output=True, timeout=timeout_s)
        except Exception:  # noqa: BLE001 — probe failure means "not alive"
            r = None
        if r is not None and r.returncode == 0 and b"ALIVE 8" in r.stdout:
            return True
        if attempt == 1:
            print("[bench] device probe attempt 1 failed — retrying",
                  file=sys.stderr, flush=True)
    return False


def cached_streams(key: str, build):
    """Disk cache for the bench's deterministic host prep (corpus render +
    native SP encode).  The encoded streams are a pure function of the
    corpus parameters and the encoder source, so the key embeds a hash of
    spdec.cpp — any encoder change invalidates the cache.  This exists
    because the 1-core host pays ~1-3 min re-encoding identical corpora
    every run, squeezing the device rows against the soft deadline
    (round-5 lesson: the stills curve was the row that got cut)."""
    import hashlib
    import pickle

    base = os.path.dirname(os.path.abspath(__file__))
    # the streams are a function of the corpus GENERATORS and the encoder
    # wrapper too, not just the C encoder — hash every source they
    # depend on so an edit to any of them invalidates the cache
    srcs = [os.path.join(base, "jsplayer_tpu", p) for p in (
        os.path.join("native", "spdec.cpp"),
        os.path.join("utils", "corpora.py"),
        os.path.join("encode", "sp_enc.py"),
        os.path.join("encode", "avi_mux.py"),
    )]
    try:
        h = hashlib.sha1()
        for s in srcs:
            h.update(open(s, "rb").read())
        tag = h.hexdigest()[:12]
    except OSError:
        return build()
    cdir = "/tmp/jsptpu_bench_cache"
    path = os.path.join(cdir, f"{key}-{Y}x{X}-{tag}.pkl")
    try:
        with open(path, "rb") as fh:
            return pickle.load(fh)
    except (OSError, EOFError, pickle.UnpicklingError):
        pass
    v = build()
    try:
        os.makedirs(cdir, exist_ok=True)
        tmp = path + f".tmp{os.getpid()}"
        with open(tmp, "wb") as fh:
            pickle.dump(v, fh)
        os.replace(tmp, path)
    except OSError:
        pass
    return v


def real_stream_commands():
    """Native-encoded 1080p screen content → host-decoded command stacks."""
    from jsplayer_tpu import native

    if not native.available():
        return None
    from jsplayer_tpu.encode.sp_enc import pack_rgb

    def build():
        rng = np.random.default_rng(0)
        enc = native.NativeScreenPressorEncoder(4, X, Y)
        f = np.full((Y, X), pack_rgb(30, 30, 34), dtype=np.uint32)
        for _ in range(12):
            x0 = int(rng.integers(0, X - 200))
            y0 = int(rng.integers(0, Y - 150))
            f[y0 : y0 + 140, x0 : x0 + 190] = pack_rgb(
                *rng.integers(0, 256, 3))
        f = f.reshape(-1)
        st = [enc.encode_i(f)]
        for t in range(T - 1):
            nf = f.copy().reshape(Y, X)
            if t % 3 == 0:
                nf[8:, :] = nf[:-8, :].copy()  # scroll → motion blocks
            if t % 3 != 2:  # every third frame is a still
                x0 = int(rng.integers(0, X - 120))
                y0 = int(rng.integers(0, Y - 80))
                nf[y0 : y0 + 60, x0 : x0 + 100] = pack_rgb(
                    *rng.integers(0, 256, 3))
            f = nf.reshape(-1)
            st.append(enc.encode_p(f))
        return st

    streams = cached_streams(f"bench-mix-T{T}", build)
    got = native.native_sp_decode_streams([streams], X, Y)
    # steady-state host feed rates for the production transports (buffers
    # reused; best-of-N is the host-timing discipline, BENCH_NOTES.md —
    # the JAX runtime shares this 1-core host, single-shot timings mostly
    # measure its interference, and ambient contention spikes make even
    # best-of-4 wobble ~30% between runs, hence best-of-8)
    # Each rate is reported on BOTH clocks: wall (perf_counter — what a
    # co-scheduled host actually delivers here) and CPU-seconds
    # (process_time — the dedicated-core rate, immune to this vCPU's
    # multi-second steal bursts; the BENCH_NOTES round-5 timing
    # discipline).  best-of-8 on each.
    kmv = native.native_sp_decode_streams_kmv([streams], X, Y, K=2)
    host_fps = host_fps_cpu = 0.0
    for _ in range(8):
        t0, c0 = time.perf_counter(), time.process_time()
        kmv = native.native_sp_decode_streams_kmv([streams], X, Y, K=2,
                                                  out=kmv)
        host_fps = max(host_fps, T / (time.perf_counter() - t0))
        host_fps_cpu = max(host_fps_cpu, T / (time.process_time() - c0))
    bc = native.native_sp_decode_streams_bc([streams], X, Y, K=2)
    host_bc_fps = host_bc_fps_cpu = 0.0
    for _ in range(8):
        t0, c0 = time.perf_counter(), time.process_time()
        bc = native.native_sp_decode_streams_bc([streams], X, Y, K=2, out=bc)
        host_bc_fps = max(host_bc_fps, T / (time.perf_counter() - t0))
        host_bc_fps_cpu = max(host_bc_fps_cpu,
                              T / (time.process_time() - c0))
    return (got, kmv, host_fps, bc, host_bc_fps, streams,
            host_fps_cpu, host_bc_fps_cpu)


def main() -> None:
    t_start = time.perf_counter()
    # Device liveness gate (round-4 lesson: a wedged tunnel turned the
    # driver artifact into `value: 0.0, all_paths: {}` — indistinguishable
    # at a glance from a catastrophic perf regression).  Probe in a
    # killable subprocess BEFORE any in-process jax import — a hung axon
    # backend init poisons the whole process.  On failure, hard-pin jax to
    # cpu (the env var alone does not stop the axon plugin winning
    # platform selection at import time) and emit an honest record with
    # every host and wire-size row plus `device_unavailable: true`.
    device_ok = probe_device(
        float(os.environ.get("BENCH_PROBE_TIMEOUT_S", 180)))
    if not device_ok:
        os.environ["JAX_PLATFORMS"] = "cpu"
        print("[bench] device probe FAILED — host/wire rows only",
              file=sys.stderr, flush=True)

    import jax
    import jax.numpy as jnp

    from jsplayer_tpu.kernels import sp_recon

    if not device_ok:
        jax.config.update("jax_platforms", "cpu")
    # soft deadline for the OPTIONAL rows (curve/terminal/lane/model):
    # the headline paths always run; extras are skipped once elapsed time
    # passes this, so the single JSON line is guaranteed to print even
    # under a driver timeout (rows not reached report null)
    # raised 1100 → 1250 in round 5: the 15:04 run lost the stills curve
    # to the soft deadline with ~2x slower remote compiles than the
    # morning; the r4 record shows the driver tolerates the hard deadline
    SOFT_DEADLINE_S = float(__import__("os").environ.get(
        "BENCH_SOFT_DEADLINE_S", 1250))

    def over_budget():
        return time.perf_counter() - t_start > SOFT_DEADLINE_S

    # HARD watchdog: the soft deadline only fires BETWEEN rows — a wedged
    # axon tunnel (observed: jax.devices() hangs for hours) parks a single
    # dispatch forever and the JSON line never prints, destroying the
    # round's driver record.  A daemon timer emits whatever landed and
    # hard-exits; the normal path cancels it and prints the full line.
    import os as _os
    import threading as _threading

    HARD_DEADLINE_S = float(_os.environ.get("BENCH_HARD_DEADLINE_S", 1500))
    results = {}
    marks = {}
    # every completed non-headline row lands here the moment it finishes,
    # so BOTH the watchdog payload and the final line carry it (round-4
    # fix: the wedged run had finished the host row yet reported nothing)
    extras = {}
    _emit_lock = _threading.Lock()
    _emitted = [False]

    def emit_once(obj) -> None:
        # lock, not a bare Event check: Timer.cancel() can't stop an
        # in-flight callback, so the watchdog and the normal completion
        # path may race here — exactly one JSON line must print
        with _emit_lock:
            if _emitted[0]:
                return
            _emitted[0] = True
            print(json.dumps(obj), flush=True)

    def _watchdog() -> None:
        # snapshot under retry: the main thread mutates results/marks
        # without a lock, and a mid-iteration RuntimeError here would kill
        # the watchdog silently — the one failure it exists to prevent
        snap, msnap, psnap = {}, {}, {}
        for _ in range(5):
            try:
                snap, msnap, psnap = dict(results), dict(marks), dict(extras)
                break
            except RuntimeError:
                time.sleep(0.05)
        try:
            live = [(v, k) for k, v in snap.items() if v]
            val, path = max(live) if live else (None, "none")
            emit_once({
                **psnap,
                "metric": "sp_1080p_device_decode_frames_per_sec_per_chip",
                "value": None if val is None else round(val, 1),
                "unit": "frames/s",
                "vs_baseline": (None if val is None
                                else round(val / BASELINE, 3)),
                "path": path,
                "watchdog_fired": True,
                "all_paths": {k: (round(v, 1) if v else None)
                              for k, v in snap.items()},
                "row_wall_s": msnap,
            })
            sys.stdout.flush()
        finally:
            # exit 0: the JSON line (with watchdog_fired set) IS the honest
            # record — a nonzero status could make the driver discard it
            _os._exit(0)

    _wd = _threading.Timer(HARD_DEADLINE_S, _watchdog)
    _wd.daemon = True
    _wd.start()

    # per-row wall clock (stderr + JSON `row_wall_s`): slow runs through the
    # tunnel were previously undiagnosable — the 2026-08-17 18:03 run took
    # 1,243 s and nulled terminal/curve/model with nothing to say why
    _mark_prev = [t_start]

    def mark(label):
        now = time.perf_counter()
        marks[label] = round(now - _mark_prev[0], 1)
        _mark_prev[0] = now
        print(f"[bench] {label}: +{marks[label]}s "
              f"(total {now - t_start:.0f}s)", file=sys.stderr, flush=True)

    try:
        real = real_stream_commands()
    except Exception:  # noqa: BLE001 — never lose the JSON line
        traceback.print_exc(file=sys.stderr)
        real = None
    mark("host_encode_and_transports")
    if real is not None:
        (got, kmv_host, host_fps, bc_host, host_bc_fps, corpus_streams,
         host_fps_cpu, host_bc_fps_cpu) = real
        extras["host_stage_kmv_fps_per_core"] = round(host_fps, 1)
        extras["host_stage_fps_per_core"] = round(host_bc_fps, 1)
        extras["host_stage_kmv_fps_per_core_cpu"] = round(host_fps_cpu, 1)
        extras["host_stage_fps_per_core_cpu"] = round(host_bc_fps_cpu, 1)
        extras["source"] = "real-encoded-1080p-screen-content"
        # device_put, not jnp.array: 24x faster for big numpy uploads here
        bts = jax.device_put(got["bts"][0])
        mv = jax.device_put(got["mv"][0])
        rect = jax.device_put(got["rect"][0])
        payload = jax.device_put(got["payload"][0])
        changed = jax.device_put(got["changed"][0])
        source = "real-encoded-1080p-screen-content"
    else:
        rng = np.random.default_rng(0)
        nbx, nby = (X + 15) // 16, (Y + 15) // 16
        nb = nbx * nby
        kinds = rng.choice([0, 3, 1], size=(T, nb), p=[0.70, 0.15, 0.15])
        bts = jnp.array(kinds.astype(np.int32))
        by = (np.arange(nb) // nbx) * 16
        bx = (np.arange(nb) % nbx) * 16
        mvx = np.clip(rng.integers(-8, 9, (T, nb)), -bx, X - 16 - bx)
        mvy = np.clip(rng.integers(-8, 9, (T, nb)), -by, Y - 16 - by)
        mv = jnp.array(np.stack([mvx, mvy], -1).astype(np.int32))
        rect = jnp.array(np.broadcast_to(
            np.stack([bx, by, np.minimum(bx + 16, X), np.minimum(by + 16, Y)],
                     -1).astype(np.int32)[None], (T, nb, 4)))
        payload = jnp.array(
            rng.integers(0, 1 << 24, (T, Y, X)).astype(np.uint32))
        changed = jnp.ones(T, bool)
        host_fps = host_bc_fps = None
        bc_host = None
        corpus_streams = None
        source = "synthetic-commands"
        extras["source"] = source

    if not device_ok:
        # ---- degraded record: every host + wire-size row, no device rows
        # (round-4 directive: a wedged tunnel must never produce a 0.0
        # headline — the host half of the pipeline is measurable and the
        # wire sizes are deterministic; emit them with the flag set) ----
        if real is not None:
            try:
                from jsplayer_tpu.codecs import lane_format
                from jsplayer_tpu.encode.avi_mux import mux_avi
                from jsplayer_tpu.transcode import transcode_to_lane

                avi = mux_avi(corpus_streams, X, Y, 24, codec="SPV4",
                              keyflags=[t == 0 for t in range(T)])
                lane_bytes = {"avi": len(avi)}
                cont_bytes = transcode_to_lane(avi, window=T, K=2)
                lane_bytes["raw_deflate"] = len(cont_bytes)
                t0 = time.perf_counter()
                cont = lane_format.container_from_bytes(cont_bytes)
                w0 = cont.windows[0]
                w0.row_index(Y, lane_format.plane_cols(X) // 128)
                extras["lane_host_prep_ms_per_window"] = round(
                    (time.perf_counter() - t0) * 1e3, 1)
                lane_bytes["raw"] = len(transcode_to_lane(
                    avi, window=T, K=2, compress=False))
                extras["lane_container_bytes"] = lane_bytes
            except Exception:  # noqa: BLE001 — keep the row null
                traceback.print_exc(file=sys.stderr)
            mark("wire_sizes")
            try:
                if time.perf_counter() - t_start < 90:
                    from jsplayer_tpu.utils import corpora
                    from jsplayer_tpu import native as _nat

                    Tt = min(240, 4 * T)
                    streams_t = cached_streams(
                        f"terminal-T{Tt}",
                        lambda: corpora.encode_frames(
                            corpora.terminal_session(T=Tt, Y=Y, X=X, seed=0),
                            _nat.NativeScreenPressorEncoder(4, X, Y)))
                    bct = _nat.native_sp_decode_streams_bc(
                        [streams_t], X, Y, K=2)
                    best = float("inf")
                    for _ in range(6):
                        t0 = time.perf_counter()
                        bct = _nat.native_sp_decode_streams_bc(
                            [streams_t], X, Y, K=2, out=bct)
                        best = min(best, time.perf_counter() - t0)
                    extras["terminal_host_bc_fps_per_core"] = round(
                        Tt / best, 1)
            except Exception:  # noqa: BLE001 — keep the row null
                traceback.print_exc(file=sys.stderr)
            mark("terminal_host")
        _wd.cancel()
        emit_once({
            **extras,
            "metric": "sp_1080p_device_decode_frames_per_sec_per_chip",
            "value": None,
            "unit": "frames/s",
            "vs_baseline": None,
            "path": None,
            "device_unavailable": True,
            "all_paths": {},
            "row_wall_s": marks,
        })
        return

    init = jnp.zeros((Y, X), jnp.uint32)
    dev = jax.device_put((init, bts, mv, rect, payload, changed))

    def timed(fn, *args, scale=1, frames=T, tries=6, with_spread=False):
        # args ride as jit arguments: the axon tunnel's remote-compile POST
        # rejects closures over large device constants (HTTP 413).  nrep is
        # a DYNAMIC fori_loop bound so every rep count shares one compile.
        #
        # Probe discipline (round-2 fix): the loop body must be (a) loop-
        # DEPENDENT — the carry is XORed into the first input, so XLA can't
        # hoist the computation out of the fori_loop — and (b) fully
        # output-dependent — the carry folds a FULL reduction of the
        # output, so no stream/step can be dead-code-eliminated.  The
        # round-1 probe read one element of the last stream only; at B≥4
        # XLA eliminated the other streams' scans entirely and "measured"
        # >2 TB/s of phantom traffic.  The full-sum probe costs one extra
        # output read pass (numbers are accordingly slightly conservative).
        @jax.jit
        def loop(nrep, *a):
            def body(i, carry):
                a0 = a[0] ^ carry  # inject the loop dependence (u32 input)
                frames = fn(a0, *a[1:])
                if frames.dtype != jnp.uint32:
                    frames = jax.lax.bitcast_convert_type(
                        frames.astype(jnp.float32), jnp.uint32)
                return frames.sum(dtype=jnp.uint32) ^ jnp.uint32(i)
            return jax.lax.fori_loop(0, nrep, body, jnp.uint32(0))

        # tunnel-pressure adaptation (round-5 lesson: post-outage the
        # tunnel's compile+dispatch cost grew ~10x and the VERDICT-critical
        # rows never ran before the hard watchdog — shed probe repetitions,
        # never rows, as the clock runs down)
        if time.perf_counter() - t_start > 0.5 * SOFT_DEADLINE_S:
            tries = min(tries, 3)

        def t_at(nrep, tries=tries):
            int(loop(jnp.int32(nrep), *args))  # warm; readback = barrier
            samples = []
            for _ in range(tries):
                t0 = time.perf_counter()
                int(loop(jnp.int32(nrep), *args))
                samples.append(time.perf_counter() - t0)
            return min(samples), samples

        t_lo, _ = t_at(1, tries=2)
        # two-point marginal: cancels the tunnel's fixed per-dispatch cost;
        # a wide rep spread + best-of-N damps tunnel jitter on the diff
        n_lo, n_hi = (1, 3) if t_lo > 0.5 else (4, 24)
        (t1, _), (t2, s2) = t_at(n_lo), t_at(n_hi)
        # jitter guard (VERDICT r4 item 7): grow the rep spread until the
        # marginal span dominates tunnel noise — high-elision workloads
        # are ~ms per rep, and a ~25 ms dispatch jitter on a ~50 ms span
        # made the stills-curve points swing ±2x between runs.  Escalate
        # n_hi until the span is ≥250 ms (or the row gets expensive).
        while t2 - t1 < 0.25 and n_hi < 512 and t2 < 15 and not over_budget():
            n_hi *= 4
            t2, s2 = t_at(n_hi)
        fps = scale * frames * (n_hi - n_lo) / max(t2 - t1, 1e-9)
        if with_spread:
            # run-to-run spread of the dominant (n_hi) samples: the
            # quotability record for curve points, at zero extra dispatches
            spread = (max(s2) - min(s2)) / max(min(s2), 1e-9)
            return fps, spread
        return fps

    # ---- headline paths (always run) -------------------------------------
    # strategy 2: K-distinct-motion-vector compose (gather-free); transport
    # comes straight from the native decoder (exact twin of prepare_kmv)
    try:
        if real is not None:
            pc, mvk = kmv_host["paycode"][0], kmv_host["mvk"][0]
        else:
            pc, mvk = sp_recon.prepare_kmv(
                np.asarray(bts), np.asarray(mv), np.asarray(rect),
                np.asarray(payload), K=2)
        kdev = jax.device_put((init, pc, mvk, changed))
        results["kmv"] = timed(sp_recon.decode_sequence_kmv, *kdev)
    except Exception:  # noqa: BLE001 — keep the row null, but say why
        traceback.print_exc(file=sys.stderr)
        results["kmv"] = None
    mark("kmv")
    # strategy 2b: kmv + still-elision (production pipeline shape: stills
    # never enter the device scan; the host's `changed` flags map outputs).
    # Delivered-frame throughput: all T frames come out (stills alias their
    # predecessor via outmap), the device only composes the changed ones.
    try:
        pcc, mvkc, _outmap = sp_recon.compact_changed(
            pc, mvk, np.asarray(changed))
        cdev = jax.device_put((init, pcc, mvkc))
        results["kmv_still_elision"] = timed(
            sp_recon.decode_sequence_kmv_compact, *cdev)
    except Exception:  # noqa: BLE001 — keep the row null, but say why
        traceback.print_exc(file=sys.stderr)
        results["kmv_still_elision"] = None
    mark("kmv_still_elision")
    def native_kmv_single(streams_s):
        from jsplayer_tpu import native as _nat

        return _nat.native_sp_decode_streams_kmv([streams_s], X, Y, K=2)

    # ---- VERDICT-critical rows run FIRST (round-3/round-5 lesson: the
    # deadline expired before exactly the rows the record needed; order is
    # now lane → terminal → curve → batch/padded → model/bc → fallbacks) ----

    # BASELINE config 4 end-to-end: lane-container ingest (payload decoded
    # entirely on device; the host's only per-frame work is array slicing,
    # so these rows are independent of host entropy throughput).  Round-4
    # A/B: raw unit bytes (default) vs renorm-aligned rANS lanes, plus the
    # wire sizes of both (VERDICT round-3 items 2+3).
    lane_fps = lane_rans_fps = lane_elision_fps = lane_prep_ms = None
    lane_bytes = {}
    avi = None
    try:
        if real is not None:
            from jsplayer_tpu.codecs import lane_format
            from jsplayer_tpu.encode.avi_mux import mux_avi
            from jsplayer_tpu.kernels import lane_recon
            from jsplayer_tpu.transcode import transcode_to_lane

            avi = mux_avi(corpus_streams, X, Y, 24, codec="SPV4",
                          keyflags=[t == 0 for t in range(T)])
            extras["lane_container_bytes"] = lane_bytes  # live reference
            lane_bytes["avi"] = len(avi)
            cont_bytes = transcode_to_lane(avi, window=T, K=2)  # raw+deflate
            lane_bytes["raw_deflate"] = len(cont_bytes)
            ncol = lane_format.plane_cols(X) // 128
            t0 = time.perf_counter()
            cont = lane_format.container_from_bytes(cont_bytes)
            w = cont.windows[0]
            row_table, row_idx = w.row_index(Y, ncol)
            lane_prep_ms = (time.perf_counter() - t0) * 1e3
            raw_args = jax.device_put(
                (jnp.zeros((Y, X), jnp.uint32), jnp.asarray(w.payload),
                 jnp.asarray(w.btype), jnp.asarray(w.rect),
                 jnp.asarray(w.mvk), jnp.asarray(row_table),
                 jnp.asarray(row_idx), jnp.asarray(w.changed)))
            lane_fps = timed(lane_recon.decode_window_raw, *raw_args)
            extras["lane_ingest_fps"] = round(lane_fps, 1)
            extras["lane_host_prep_ms_per_window"] = round(lane_prep_ms, 1)
            # production lane config: still-elision keeps stills out of
            # the scan (ingest's compact_arrays_batch semantics) —
            # delivered-frame convention as the kmv headline
            sel = np.nonzero(np.asarray(w.changed))[0]
            el_args = jax.device_put(
                (jnp.zeros((Y, X), jnp.uint32), jnp.asarray(w.payload),
                 jnp.asarray(w.btype[sel]), jnp.asarray(w.rect[sel]),
                 jnp.asarray(w.mvk[sel]), jnp.asarray(row_table),
                 jnp.asarray(row_idx[sel]), jnp.ones(sel.size, bool)))
            lane_elision_fps = timed(lane_recon.decode_window_raw,
                                     *el_args, tries=3)
            extras["lane_ingest_elision_fps"] = round(lane_elision_fps, 1)
            lane_bytes["raw"] = len(transcode_to_lane(
                avi, window=T, K=2, compress=False))
    except Exception:  # noqa: BLE001 — keep the row null, but say why
        traceback.print_exc(file=sys.stderr)
    mark("lane_raw")

    # realistic capture-like corpus: rendered scrolling-terminal session
    terminal_fps = terminal_host_bc_fps = None
    try:
        if real is not None and not over_budget():
            from jsplayer_tpu.utils import corpora
            from jsplayer_tpu import native as _nat

            Tt = 240
            streams_t = cached_streams(
                f"terminal-T{Tt}",
                lambda: corpora.encode_frames(
                    corpora.terminal_session(T=Tt, Y=Y, X=X, seed=0),
                    _nat.NativeScreenPressorEncoder(4, X, Y)))
            k = native_kmv_single(streams_t)
            pcc_t, mvkc_t, _ = sp_recon.compact_changed(
                k["paycode"][0], k["mvk"][0], np.asarray(k["changed"][0]))
            tdev = jax.device_put((init, pcc_t, mvkc_t))
            terminal_fps = timed(sp_recon.decode_sequence_kmv_compact,
                                 *tdev, frames=Tt)
            extras["terminal_corpus_fps"] = round(terminal_fps, 1)
            bct = _nat.native_sp_decode_streams_bc([streams_t], X, Y, K=2)
            best = float("inf")
            for _ in range(6):
                t0 = time.perf_counter()
                bct = _nat.native_sp_decode_streams_bc([streams_t], X, Y,
                                                       K=2, out=bct)
                best = min(best, time.perf_counter() - t0)
            terminal_host_bc_fps = Tt / best
            extras["terminal_host_bc_fps_per_core"] = round(
                terminal_host_bc_fps, 1)
    except Exception:  # noqa: BLE001 — keep the row null, but say why
        traceback.print_exc(file=sys.stderr)
    mark("terminal_corpus")

    # delivered-fps vs stills-ratio sensitivity curve (VERDICT r2 item 3):
    # same event mix, only the idle fraction varies
    stills_curve = {}
    stills_spread = {}
    try:
        if real is not None and not over_budget():
            from jsplayer_tpu.utils import corpora
            from jsplayer_tpu import native as _nat

            for s in (0.0, 1 / 3, 2 / 3, 0.9):
                if over_budget():
                    break
                streams_s = cached_streams(
                    f"mix-s{s:.2f}-T{T}",
                    lambda: corpora.encode_frames(
                        corpora.screen_mix(T=T, Y=Y, X=X, stills=s, seed=3),
                        _nat.NativeScreenPressorEncoder(4, X, Y)))
                k = native_kmv_single(streams_s)
                pcc_s, mvkc_s, _ = sp_recon.compact_changed(
                    k["paycode"][0], k["mvk"][0], np.asarray(k["changed"][0]))
                sdev = jax.device_put((init, pcc_s, mvkc_s))
                # the curve's quotability rests on the recorded sample
                # spread (VERDICT r4 item 7); with_spread reports it from
                # the dominant-rep samples at zero extra dispatches —
                # post-outage, a second full measurement per point would
                # push the curve past the hard watchdog
                v1, sp = timed(sp_recon.decode_sequence_kmv_compact, *sdev,
                               tries=4, with_spread=True)
                stills_curve[f"{s:.2f}"] = round(v1, 1)
                stills_spread[f"{s:.2f}"] = round(sp, 3)
                extras["stills_curve_fps"] = stills_curve
                extras["stills_curve_spread"] = stills_spread
    except Exception:  # noqa: BLE001 — keep the row null, but say why
        traceback.print_exc(file=sys.stderr)
    mark("stills_curve")

    # strategy 2c: BATCHED kmv + still-elision, CONCAT layout (the
    # production batch shape, ingest._kmv_elided): keyframe-led streams'
    # compacted frames run back to back in ONE sequential scan — zero
    # padding, full single-stream throughput.  (The earlier unrolled
    # per-stream batch scan measured 2x slower: TPU executes the B scans
    # sequentially through the same HBM with worse scheduling.)
    pccs = mvkcs = None
    try:
        if not over_budget():
            Bb = 2
            # DISTINCT per-stream pixel bits: identical copies invite XLA CSE
            pc_np, mvk_np = np.asarray(pc), np.asarray(mvk)
            ch_np = np.asarray(changed)
            pccs, mvkcs = [], []
            for b in range(Bb):
                pcc_b, mvkc_b, _ = sp_recon.compact_changed(
                    pc_np ^ np.uint32((b * 0x030507) & 0xFFFFFF), mvk_np,
                    ch_np)
                pccs.append(pcc_b)
                mvkcs.append(mvkc_b)
            cat = jax.device_put((init, jnp.array(np.concatenate(pccs)),
                                  jnp.array(np.concatenate(mvkcs))))
            results["kmv_batch_elision"] = timed(
                sp_recon.decode_sequence_kmv_compact, *cat, scale=Bb)
    except Exception:  # noqa: BLE001 — keep the row null, but say why
        traceback.print_exc(file=sys.stderr)
        results["kmv_batch_elision"] = None
    mark("kmv_batch_elision")
    # mid-GOP PADDED fallback: the per-stream bucketed masked scans used
    # when a window is NOT keyframe-led.  Keyframe-aligned window
    # scheduling (round 4) keeps production windows on the CONCAT layout
    # whenever the stream's keyframe cadence allows; this row records what
    # the fallback costs on the same content (delivered-frame convention
    # identical to kmv_batch_elision: scale=B, frames=T)
    try:
        if pccs is not None and not over_budget():
            pstack = jnp.array(np.stack(pccs))
            mstack = jnp.array(np.stack(mvkcs))
            vstack = jnp.ones(pstack.shape[:2], bool)
            pdev = jax.device_put((jnp.zeros((Bb, Y, X), jnp.uint32),
                                   pstack, mstack, vstack))
            results["kmv_padded_elision"] = timed(
                sp_recon.decode_batch_kmv, *pdev, scale=Bb, tries=3)
    except Exception:  # noqa: BLE001 — keep the row null, but say why
        traceback.print_exc(file=sys.stderr)
        results["kmv_padded_elision"] = None
    mark("kmv_padded_elision")

    # rANS lane variant (the round-3 default) for the A/B size/fps record.
    # Runs AFTER the VERDICT-critical terminal/curve rows: it is the losing
    # side of a settled A/B (raw won both axes, BENCH_NOTES round 4), so it
    # is the first row to sacrifice to the soft deadline.
    try:
        if avi is not None and not over_budget():
            from jsplayer_tpu.codecs import lane_format
            from jsplayer_tpu.kernels import lane_recon
            from jsplayer_tpu.transcode import transcode_to_lane

            ncol = lane_format.plane_cols(X) // 128
            cont_rans = transcode_to_lane(avi, window=T, K=2,
                                          payload="rans", compress=False)
            lane_bytes["rans"] = len(cont_rans)
            w2 = lane_format.container_from_bytes(cont_rans).windows[0]
            init2 = (jnp.asarray(w2.init_plane)
                     if w2.init_plane is not None
                     else jnp.zeros((Y, X), jnp.uint32))
            rt2, ri2 = w2.row_index(Y, ncol)
            rans_args = jax.device_put(
                (init2, jnp.asarray(w2.refills), jnp.asarray(w2.states),
                 jnp.asarray(w2.freq), jnp.asarray(w2.btype),
                 jnp.asarray(w2.rect), jnp.asarray(w2.mvk),
                 jnp.asarray(rt2), jnp.asarray(ri2),
                 jnp.asarray(w2.changed)))
            lane_rans_fps = timed(
                lambda i, rf, st, fq, bt, rc, mk, rt, ri, ch:
                lane_recon.decode_window_lane(i, rf, st, fq, bt, rc, mk,
                                              rt, ri, ch, U=w2.n_units),
                *rans_args, tries=3)
            extras["lane_rans_ingest_fps"] = round(lane_rans_fps, 1)
    except Exception:  # noqa: BLE001 — keep the row null, but say why
        traceback.print_exc(file=sys.stderr)
    mark("lane_rans")

    # fused ML-ingest paths (different output contract): kmv decode -> 2x
    # box downscale -> normalized bf16 NHWC tensors
    model_fps = None
    model_elision_fps = None
    model_packed_fps = None
    model_packed_consumer_fps = model_consumer_fps = None
    try:
        if not over_budget():
            model_elision_fps = timed(
                lambda i, p, m: sp_recon.decode_sequence_kmv_compact_model(
                    i, p, m, downscale=2)[1],
                *cdev, tries=3)
            model_packed_fps = timed(
                lambda i, p, m: sp_recon.decode_sequence_kmv_compact_model(
                    i, p, m, downscale=2, packed=True)[1],
                *cdev, tries=3)
            extras["model_ingest_ds2_elision_fps"] = round(
                model_elision_fps, 1)
            extras["model_ingest_ds2_packed_fps"] = round(
                model_packed_fps, 1)
        if not over_budget():
            # packed-ds2 CONSUMER contract (VERDICT r3 item 7): delivered
            # fps INCLUDING the consuming model step (ViT-style patch
            # embed whose first op fuses the unpack) — vs the same step
            # fed the unfused bf16 tensors.  The packed claim only stands
            # if this row holds near the packed emit rate.
            from jsplayer_tpu.kernels import rgb_convert

            wrng = np.random.default_rng(7)
            wconv = jnp.array(wrng.normal(0, 0.05, (8, 8, 3, 128)),
                              jnp.bfloat16)

            def packed_then_consume(i, p, m, w):
                red = sp_recon.decode_sequence_kmv_compact_model(
                    i, p, m, downscale=2, packed=True)[1]
                return rgb_convert.packed_consumer_step(red, w)

            def unpacked_then_consume(i, p, m, w):
                x = sp_recon.decode_sequence_kmv_compact_model(
                    i, p, m, downscale=2)[1]
                return jax.lax.conv_general_dilated(
                    x, w.astype(x.dtype), window_strides=(8, 8),
                    padding="VALID",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))

            model_packed_consumer_fps = timed(
                packed_then_consume, *cdev, wconv, tries=3)
            model_consumer_fps = timed(
                unpacked_then_consume, *cdev, wconv, tries=3)
            extras["model_packed_consumer_fps"] = round(
                model_packed_consumer_fps, 1)
            extras["model_unpacked_consumer_fps"] = round(
                model_consumer_fps, 1)
        if not over_budget():
            model_fps = timed(
                lambda i, p, m, c: sp_recon.decode_batch_kmv_model(
                    i[None], p[None], m[None], c[None], downscale=2)[1],
                *kdev, tries=3)
            extras["model_ingest_ds2_fps"] = round(model_fps, 1)
    except Exception:  # noqa: BLE001 — keep the row null, but say why
        traceback.print_exc(file=sys.stderr)
    mark("model_rows")

    # bc transport device scan (same traffic as kmv; host feed is 1.5x)
    try:
        if real is not None and not over_budget():
            bc_args = (init, jax.device_put(bc_host["plane"][0]),
                       jax.device_put(bc_host["bcode"][0]),
                       jax.device_put(bc_host["rloc"][0]),
                       jax.device_put(bc_host["mvk"][0]), changed)
            results["bc"] = timed(sp_recon.decode_sequence_bc, *bc_args,
                                  tries=3)
    except Exception:  # noqa: BLE001 — keep the row null, but say why
        traceback.print_exc(file=sys.stderr)
        results["bc"] = None
    mark("bc")

    # ---- slow reference/fallback paths last (never headline winners) ----
    # strategy 1: general XLA compose (arbitrary-gather motion)
    try:
        if not over_budget():
            results["xla"] = timed(
                lambda *a: sp_recon.decode_sequence(*a, jnp.int32(0))[0],
                *dev, tries=2)
    except Exception:  # noqa: BLE001 — keep the row null, but say why
        traceback.print_exc(file=sys.stderr)
        results["xla"] = None
    # strategy 3: Pallas DMA/MXU paths (TPU only; may not compile everywhere)
    try:
        if not over_budget():
            from jsplayer_tpu.kernels.sp_motion_pallas import (
                decode_sequence_fused)

            results["pallas_patch"] = timed(
                lambda *a: decode_sequence_fused(*a, jnp.int32(0))[0],
                *dev, tries=2)
    except Exception:  # noqa: BLE001 — keep the row null, but say why
        traceback.print_exc(file=sys.stderr)
        results["pallas_patch"] = None
    mark("xla_and_pallas_fallbacks")

    live = [(v, k) for k, v in results.items() if v]
    if live:
        frames_per_sec, best_path = max(live)
    else:
        # all device paths failed (tunnel died mid-run?) — report null,
        # never 0.0: a zero reads as a catastrophic perf regression
        frames_per_sec, best_path = None, "none"
    _wd.cancel()
    emit_once({
        "metric": "sp_1080p_device_decode_frames_per_sec_per_chip",
        "value": None if frames_per_sec is None else round(frames_per_sec, 1),
        "unit": "frames/s",
        "vs_baseline": (None if frames_per_sec is None
                        else round(frames_per_sec / BASELINE, 3)),
        "device_unavailable": frames_per_sec is None,
        "source": source,
        "path": best_path,
        "all_paths": {k: (round(v, 1) if v else None)
                      for k, v in results.items()},
        "host_stage_fps_per_core": (
            None if host_bc_fps is None else round(host_bc_fps, 1)),
        "host_stage_kmv_fps_per_core": (
            None if host_fps is None else round(host_fps, 1)),
        # dedicated-core (process_time) twins of the two wall rates —
        # immune to this vCPU's steal bursts (BENCH_NOTES discipline)
        "host_stage_fps_per_core_cpu": extras.get(
            "host_stage_fps_per_core_cpu"),
        "host_stage_kmv_fps_per_core_cpu": extras.get(
            "host_stage_kmv_fps_per_core_cpu"),
        "model_ingest_ds2_fps": None if model_fps is None else round(model_fps, 1),
        "model_ingest_ds2_elision_fps": (
            None if model_elision_fps is None else round(model_elision_fps, 1)),
        "model_ingest_ds2_packed_fps": (
            None if model_packed_fps is None else round(model_packed_fps, 1)),
        "model_packed_consumer_fps": (
            None if model_packed_consumer_fps is None
            else round(model_packed_consumer_fps, 1)),
        "model_unpacked_consumer_fps": (
            None if model_consumer_fps is None
            else round(model_consumer_fps, 1)),
        "stills_curve_fps": stills_curve or None,
        "stills_curve_spread": stills_spread or None,
        "terminal_corpus_fps": (
            None if terminal_fps is None else round(terminal_fps, 1)),
        "terminal_host_bc_fps_per_core": (
            None if terminal_host_bc_fps is None
            else round(terminal_host_bc_fps, 1)),
        "lane_ingest_fps": None if lane_fps is None else round(lane_fps, 1),
        "lane_ingest_elision_fps": (
            None if lane_elision_fps is None
            else round(lane_elision_fps, 1)),
        "lane_rans_ingest_fps": (
            None if lane_rans_fps is None else round(lane_rans_fps, 1)),
        "lane_container_bytes": lane_bytes or None,
        "lane_host_prep_ms_per_window": (
            None if lane_prep_ms is None else round(lane_prep_ms, 1)),
        "row_wall_s": marks,
    })


if __name__ == "__main__":
    main()
