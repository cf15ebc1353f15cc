"""Row-sliced compose experiment: can tiny-delta frames skip the full
25 MB/frame compose?

Terminal-like content: ~28% of frames change ≤16 rows (typing, cursor),
but the kmv/bc scan reads+writes full planes for every changed frame.
Prototype (model-packed output contract):

  * dual scan carry: full-res frame [Y,X] u32 + packed ds2 plane
  * per frame the host provides (use_slice, ylo) — dirty block rows fit
    in a fixed SLICE_H window and |my| <= PAD for all motion slots
  * slice path: dynamic_slice a padded row band, compose it (x-rolls are
    free; y-rolls stay within the pad), dus back into both carries
  * full path: ordinary full compose (lax.cond picks per frame)

Measures current full-scan packed model vs the sliced variant on a
terminal-corpus-shaped synthetic (same event mix), parity-checked.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

import bench
from jsplayer_tpu import native
from jsplayer_tpu.kernels import sp_recon
from jsplayer_tpu.kernels.rgb_convert import ds2_pack
from jsplayer_tpu.utils import corpora

Y, X = 1080, 1920
SLICE_H = 128   # static slice height (core rows)
PAD = 16        # |my| bound for the slice path


def host_row_ranges(bcode, mvk, nbx, nby):
    """Per frame: (use_slice, ylo) — dirty block rows fit in SLICE_H and
    motion vectors are slice-safe."""
    T = bcode.shape[0]
    use = np.zeros(T, dtype=bool)
    ylo = np.zeros(T, dtype=np.int32)
    for t in range(T):
        rows = np.nonzero(bcode[t].reshape(nby, nbx).any(axis=1))[0]
        if rows.size == 0:
            ylo[t] = 0
            use[t] = True  # nothing dirty: slice path is a cheap no-op
            continue
        y0, y1 = int(rows[0]) * 16, (int(rows[-1]) + 1) * 16
        lo = (y0 - PAD) & ~1  # even start keeps ds2 row pairing aligned
        if (lo >= 0 and y1 <= lo + PAD + SLICE_H
                and lo + SLICE_H + 2 * PAD <= Y
                and np.abs(mvk[t, :, 1]).max(initial=0) <= PAD):
            use[t] = True
            ylo[t] = lo
    return use, ylo


def compose_bc_rows(prev_rows, plane_rows, bcode, rect, mvk, y0):
    """compose_frame_bc on a row band [H, X]; block row indexing offset by
    the band's first block row (y0 16-aligned... here y0 may be padded —
    use absolute ly from the global row index)."""
    H = prev_rows.shape[0]
    nbx, nby = (X + 15) // 16, (Y + 15) // 16
    rowmap = sp_recon.bc_row_map(bcode, rect, nby, nbx, X)  # [nby, X]
    # rows y0..y0+H map to block rows (y0+i)>>4 — gather H rows from the
    # row map (row gather, cheap)
    idx = (y0 + jnp.arange(H)) >> 4
    rowv = jnp.take(rowmap, idx, axis=0)                    # [H, X]
    bt = rowv & 0xFF
    y1f = (rowv >> 8) & 0xFF
    y2f = (rowv >> 16) & 0xFF
    ly = ((y0 + jnp.arange(H))[:, None] & 15).astype(jnp.uint32)
    in_y = (ly >= y1f) & (ly < y2f)
    out = jnp.where((bt == 1) & in_y, plane_rows & jnp.uint32(0x00FFFFFF),
                    prev_rows)
    K = mvk.shape[0]
    for k in range(K):
        shifted = jnp.roll(prev_rows, shift=(-mvk[k, 1], -mvk[k, 0]),
                           axis=(0, 1))
        out = jnp.where((bt == 2 + k) & in_y, shifted, out)
    return out


def sliced_scan(init, packed0, plane, bcode, rect, mvk, use_slice, ylo,
                changed):
    CORE = SLICE_H

    def step(carry, inp):
        full, packed = carry
        pl, bc, r, mk, use, y0, chg = inp

        def slice_path(_):
            band = jax.lax.dynamic_slice(full, (y0, 0),
                                         (CORE + 2 * PAD, X))
            pband = jax.lax.dynamic_slice(pl, (y0, 0), (CORE + 2 * PAD, X))
            comp = compose_bc_rows(band, pband, bc, r, mk, y0)
            core = jax.lax.dynamic_slice(comp, (PAD, 0), (CORE, X))
            nfull = jax.lax.dynamic_update_slice(full, core, (y0 + PAD, 0))
            red = ds2_pack(core)
            npacked = jax.lax.dynamic_update_slice(packed, red,
                                                   ((y0 + PAD) // 2, 0))
            return nfull, npacked

        def full_path(_):
            out = sp_recon.compose_frame_bc(full, pl, bc, r, mk)
            return out, ds2_pack(out)

        def not_slice(_):
            return jax.lax.cond(chg, full_path,
                                lambda __: (full, packed), None)

        nfull, npacked = jax.lax.cond(use & chg, slice_path, not_slice, None)
        return (nfull, npacked), npacked

    (_, _), packs = jax.lax.scan(step, (init, packed0),
                                 (plane, bcode, rect, mvk, use_slice, ylo,
                                  changed))
    return packs


def full_scan(init, plane, bcode, rect, mvk, changed):
    def step(prev, inp):
        pl, bc, r, mk, chg = inp
        out = jnp.where(chg, sp_recon.compose_frame_bc(prev, pl, bc, r, mk),
                        prev)
        return out, ds2_pack(out)

    _, packs = jax.lax.scan(step, init, (plane, bcode, rect, mvk, changed))
    return packs


def timed(fn, T, *args):
    @jax.jit
    def loop(nrep, *a):
        def body(i, carry):
            a0 = a[0] ^ carry
            out = fn(a0, *a[1:])
            return out.astype(jnp.uint32).sum(dtype=jnp.uint32) ^ jnp.uint32(i)
        return jax.lax.fori_loop(0, nrep, body, jnp.uint32(0))

    def t_at(n, tries=5):
        int(loop(jnp.int32(n), *args))
        best = 1e30
        for _ in range(tries):
            t0 = time.perf_counter()
            int(loop(jnp.int32(n), *args))
            best = min(best, time.perf_counter() - t0)
        return best

    t1, t2 = t_at(2), t_at(10)
    return T * 8 / max(t2 - t1, 1e-9)


def main():
    T = 120
    frames = corpora.terminal_session(T=T, Y=Y, X=X, seed=0)
    enc = native.NativeScreenPressorEncoder(4, X, Y)
    streams = corpora.encode_frames(frames, enc)
    got = native.native_sp_decode_streams_bc([streams], X, Y, K=2)
    nbx, nby = (X + 15) // 16, (Y + 15) // 16
    bcode, rect = got["bcode"][0], got["rloc"][0]
    plane, mvk = got["plane"][0], got["mvk"][0]
    changed = got["changed"][0]
    use, ylo = host_row_ranges(bcode, mvk, nbx, nby)
    n_slice = int((use & changed).sum())
    print(f"frames: {T}, changed: {int(changed.sum())}, "
          f"slice-eligible: {n_slice}")

    init = jnp.zeros((Y, X), jnp.uint32)
    packed0 = ds2_pack(init)
    args_s = jax.device_put((init, packed0, plane, bcode, rect, mvk,
                             use, ylo, changed))
    args_f = jax.device_put((init, plane, bcode, rect, mvk, changed))

    ref = np.asarray(jax.jit(full_scan)(*args_f))
    got_s = np.asarray(jax.jit(sliced_scan)(*args_s))
    np.testing.assert_array_equal(got_s, ref)
    print("parity ok (sliced == full, packed planes)")

    f_full = timed(jax.jit(full_scan), T, *args_f)
    f_slice = timed(jax.jit(sliced_scan), T, *args_s)
    print(f"full scan:   {f_full:,.0f} delivered fps")
    print(f"sliced scan: {f_slice:,.0f} delivered fps")


if __name__ == "__main__" and "--bands" not in sys.argv:
    main()


def sliced_scan_bands(init, packed0, bands, fulls, full_idx, bcode, rect,
                      mvk, use_slice, ylo, changed):
    """Bands [T, CORE+2P, X] as the scan input (host pre-slices); full
    planes only for non-sliced changed frames, in a [M, Y, X] stack read
    via dynamic_slice inside the taken branch."""
    CORE = SLICE_H

    def step(carry, inp):
        full, packed = carry
        band_pl, fi, bc, r, mk, use, y0, chg = inp

        def slice_path(_):
            band = jax.lax.dynamic_slice(full, (y0, 0), (CORE + 2 * PAD, X))
            comp = compose_bc_rows(band, band_pl, bc, r, mk, y0)
            core = jax.lax.dynamic_slice(comp, (PAD, 0), (CORE, X))
            nfull = jax.lax.dynamic_update_slice(full, core, (y0 + PAD, 0))
            red = ds2_pack(core)
            npacked = jax.lax.dynamic_update_slice(packed, red,
                                                   ((y0 + PAD) // 2, 0))
            return nfull, npacked

        def full_path(_):
            pl = jax.lax.dynamic_slice(fulls, (fi, 0, 0), (1, Y, X))[0]
            out = sp_recon.compose_frame_bc(full, pl, bc, r, mk)
            return out, ds2_pack(out)

        def not_slice(_):
            return jax.lax.cond(chg, full_path,
                                lambda __: (full, packed), None)

        nfull, npacked = jax.lax.cond(use & chg, slice_path, not_slice, None)
        return (nfull, npacked), npacked

    (_, _), packs = jax.lax.scan(
        step, (init, packed0),
        (bands, full_idx, bcode, rect, mvk, use_slice, ylo, changed))
    return packs


def main_bands():
    T = 120
    frames = corpora.terminal_session(T=T, Y=Y, X=X, seed=0)
    enc = native.NativeScreenPressorEncoder(4, X, Y)
    streams = corpora.encode_frames(frames, enc)
    got = native.native_sp_decode_streams_bc([streams], X, Y, K=2)
    nbx, nby = (X + 15) // 16, (Y + 15) // 16
    bcode, rect = got["bcode"][0], got["rloc"][0]
    plane, mvk = got["plane"][0], got["mvk"][0]
    changed = got["changed"][0]
    use, ylo = host_row_ranges(bcode, mvk, nbx, nby)
    H = SLICE_H + 2 * PAD
    bands = np.zeros((T, H, X), dtype=np.uint32)
    full_idx = np.zeros(T, dtype=np.int32)
    fulls = []
    for t in range(T):
        if use[t]:
            bands[t] = plane[t, ylo[t] : ylo[t] + H]
        elif changed[t]:
            full_idx[t] = len(fulls)
            fulls.append(plane[t])
    fulls = (np.stack(fulls) if fulls
             else np.zeros((1, Y, X), np.uint32))
    init = jnp.zeros((Y, X), jnp.uint32)
    packed0 = ds2_pack(init)
    args_b = jax.device_put((init, packed0, bands, fulls, full_idx, bcode,
                             rect, mvk, use, ylo, changed))
    args_f = jax.device_put((init, plane, bcode, rect, mvk, changed))
    ref = np.asarray(jax.jit(full_scan)(*args_f))
    got_b = np.asarray(jax.jit(sliced_scan_bands)(*args_b))
    np.testing.assert_array_equal(got_b, ref)
    print("parity ok (banded == full)")
    print(f"full scan:   {timed(jax.jit(full_scan), T, *args_f):,.0f} fps")
    print(f"banded scan: {timed(jax.jit(sliced_scan_bands), T, *args_b):,.0f} fps")


if __name__ == "__main__" and "--bands" in sys.argv:
    main_bands()
