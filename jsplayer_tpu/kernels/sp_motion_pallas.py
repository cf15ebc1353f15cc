"""ScreenPressor P-frame composition — XLA select pass + Pallas motion patch.

Fast-path re-design of kernels/sp_recon.compose_frame for the bandwidth
ceiling.  Per frame:

  1. select pass (XLA, single fused elementwise sweep at HBM bandwidth):
         base = where(data_mask, payload, prev)
     data/copy masks come from structured broadcasts + iota compares — they
     fuse into the sweep with no extra HBM traffic;
  2. motion patch (Pallas): for each full-block motion command, copy
     prev[y+my : +16, x+mx : +16] → out[block] in-place on `base`
     (input_output_aliases).  This replaces XLA's per-pixel arbitrary
     gather, which measures ~25× slower than streaming on TPU.

     HBM memrefs are (8,128)-tiled, so a DMA slice must start on a tile
     boundary in BOTH dims (Mosaic: "tile index divisible by the tiling") —
     the round-1 version DMA'd at the raw (sy, sx) offsets and could not
     compile on hardware.  The aligned scheme per motion block:

       read   prev[align8(sy) : +24, align128(sx) : +256] → VMEM  (3×2 tiles
              cover any 16×16 window: sy%8 ≤ 8 rows, sx%128 + 16 ≤ 256 lanes)
       shift  two pltpu.roll dynamic rotates put the window at rows [0,16)
              and lanes [off, off+16), where off = (bx*16) % 128 is the
              block's position inside its destination lane-tile
       blend  read-modify-write the destination stripe
              out[by*16 : +16, align128(bx*16) : +128] (dst offsets ARE
              8/128-aligned), selecting lanes [off, off+16) by iota compare

     Per-block traffic is (24·256 + 2·16·128)·4B ≈ 41 KB for a 1 KB patch —
     a ~20× read amplification the kmv path avoids entirely (whole-plane
     K-rolls at HBM bandwidth), which is why kmv remains the production
     transport; this kernel covers the arbitrary-MV long tail exactly.

Block-kind mapping (host side): reference bts 1/2/4 (data, subrect+data,
subrect+motion) become per-pixel DATA pixels — the payload already holds the
decoded frame — while bts 3 (full-block motion) keeps the DMA fast path.
Requires Y%16==0, Y≥24, X%128==0, X≥256 (batch layer pads 1080→1088 and
crops; 1920 = 15×128).

The kernel also runs under `interpret=True` on CPU for the parity suite.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sp_recon import block_broadcast


def _patch_kernel(cmd_ref, prev_ref, base_ref, out_ref,
                  in_s, dst_s, sem_in, sem_dst):
    """grid (1,); out aliases base.  Serial per-block aligned DMAs + rotate
    + stripe RMW (see module docstring).  Serialization is required for
    correctness anyway: up to 8 blocks share one destination lane-stripe,
    so their read-modify-writes must not interleave.

    cmd_ref: [NB] i32, (sy<<16)|sx for a motion block, -1 otherwise — ONE
    packed word per block because 2-D SMEM prefetch operands pad their minor
    dim to 128 (a [NB,2] layout blew the 1 MB SMEM budget at 1080p)."""
    nb = cmd_ref.shape[0]
    Y, X = out_ref.shape
    nbx = X // 16

    def body(bi, _):
        cmd = cmd_ref[bi]

        @pl.when(cmd >= 0)
        def _():
            sy = cmd >> 16
            sx = cmd & 0xFFFF
            by = bi // nbx
            bx = bi - by * nbx
            in_w = in_s.shape[1]  # 256, or 128 when X == 128 (ax always 0)
            # tile-aligned superset of the source window (clamped in-frame)
            ay = jnp.minimum((sy // 8) * 8, Y - 24)
            ax = jnp.minimum((sx // 128) * 128, X - in_w)
            dy = sy - ay            # ∈ [0, 8]
            dx = sx - ax            # ∈ [0, in_w - 16]
            axd = ((bx * 16) // 128) * 128
            off = bx * 16 - axd     # ∈ {0, 16, …, 112}
            cp_in = pltpu.make_async_copy(
                prev_ref.at[pl.ds(pl.multiple_of(ay, 8), 24),
                            pl.ds(pl.multiple_of(ax, 128), in_w)],
                in_s, sem_in)
            cp_in.start()
            cp_dst = pltpu.make_async_copy(
                out_ref.at[pl.ds(pl.multiple_of(by * 16, 8), 16),
                           pl.ds(pl.multiple_of(axd, 128), 128)],
                dst_s, sem_dst)
            cp_dst.start()
            cp_in.wait()
            cp_dst.wait()
            v = in_s[...]
            # rows: result[i] = v[(i + dy) mod 24]; i<16, dy≤8 → no wrap
            v = pltpu.roll(v, 24 - dy, axis=0)
            # lanes: land source [dx, dx+16) on [off, off+16) (no wrap:
            # dx+16 ≤ in_w and off+16 ≤ 128)
            v = pltpu.roll(v, jnp.mod(off - dx, in_w), axis=1)
            lane = jax.lax.broadcasted_iota(jnp.int32, (16, 128), 1)
            dst_s[...] = jnp.where((lane >= off) & (lane < off + 16),
                                   v[:16, :128], dst_s[...])
            cp_back = pltpu.make_async_copy(
                dst_s,
                out_ref.at[pl.ds(pl.multiple_of(by * 16, 8), 16),
                           pl.ds(pl.multiple_of(axd, 128), 128)],
                sem_dst)
            cp_back.start()
            cp_back.wait()

        return 0

    jax.lax.fori_loop(0, nb, body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def motion_patch(
    base: jax.Array,  # [Y, X] uint32 — select-pass output, patched in place
    prev: jax.Array,  # [Y, X] uint32
    src_yx: jax.Array,  # [NB, 2] int32 motion source start (y, x)
    is_motion: jax.Array,  # [NB] int32
    interpret: bool = False,
) -> jax.Array:
    Y, X = base.shape
    assert Y % 16 == 0 and Y >= 24, f"Y={Y} must be ≥24 and 16-aligned"
    assert X % 128 == 0, f"X={X} must be 128-aligned"
    assert Y < (1 << 15) and X < (1 << 16), "packed cmd word limits"
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((24, min(256, X)), jnp.uint32),
            pltpu.VMEM((16, 128), jnp.uint32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    cmd = jnp.where(is_motion != 0,
                    (src_yx[:, 0] << 16) | src_yx[:, 1],
                    jnp.int32(-1)).astype(jnp.int32)
    return pl.pallas_call(
        _patch_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Y, X), jnp.uint32),
        input_output_aliases={2: 0},  # base (arg idx incl. scalar prefetch) → out
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(cmd, prev, base)


def compose_frame_fast(prev, bts, mv, rect, payload, interpret=False):
    """Semantics of sp_recon.compose_frame, fast-path layout (Y%16==0)."""
    Y, X = prev.shape
    nby, nbx = Y // 16, X // 16
    yy = jax.lax.broadcasted_iota(jnp.int32, (Y, X), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (Y, X), 1)
    b = block_broadcast(bts, nby, nbx, Y, X)
    r = block_broadcast(rect, nby, nbx, Y, X)
    in_rect = ((xx >= r[..., 0]) & (xx < r[..., 2])
               & (yy >= r[..., 1]) & (yy < r[..., 3]))
    is_data = (b > 0) & (b != 3) & in_rect  # bts 1/2/4 → payload pixels
    base = jnp.where(is_data, payload, prev)

    by = (jnp.arange(nby * nbx) // nbx) * 16
    bx = (jnp.arange(nby * nbx) % nbx) * 16
    src_yx = jnp.stack([by + mv[:, 1], bx + mv[:, 0]], axis=-1).astype(jnp.int32)
    is_motion = (bts == 3).astype(jnp.int32)
    return motion_patch(base, prev, src_yx, is_motion, interpret=interpret)


def _scan_decode_fused(init_frame, bts, mv, rect, payload, changed,
                       insignificant_blocks, interpret=False):
    def step(prev, inp):
        b, m, r, pay, chg = inp
        composed = compose_frame_fast(prev, b, m, r, pay, interpret=interpret)
        out = jnp.where(chg, composed, prev)
        sig_mask = jnp.arange(b.shape[0]) >= insignificant_blocks
        signif = jnp.logical_and(chg, ((b > 0) & sig_mask).any())
        return out, (out, signif)

    _, (frames, signif) = jax.lax.scan(
        step, init_frame, (bts, mv, rect, payload, changed)
    )
    return frames, signif


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_sequence_fused(
    init_frame: jax.Array,  # [Y, X] uint32
    bts: jax.Array,  # [T, NB] int32
    mv: jax.Array,  # [T, NB, 2] int32
    rect: jax.Array,  # [T, NB, 4] int32
    payload: jax.Array,  # [T, Y, X] uint32
    changed: jax.Array,  # [T] bool
    insignificant_blocks: jax.Array,  # scalar int32
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Drop-in fast variant of sp_recon.decode_sequence.

    Heights that are not 16-multiples (1080p) are zero-padded to the block
    grid and cropped on output — the command grid already covers the padded
    height ((Y+15)//16 block rows) with edge rects clipped to the real Y,
    and motion sources are in-frame by codec contract (msr bounds,
    ScreenPressor.hx:388-405), so padding rows never leak into real pixels.
    """
    Y, X = init_frame.shape
    ypad = (-Y) % 16
    xpad = (-X) % 128 if X >= 128 else 128 - X  # lane-tile alignment
    if ypad or xpad:
        init_frame = jnp.pad(init_frame, ((0, ypad), (0, xpad)))
        payload = jnp.pad(payload, ((0, 0), (0, ypad), (0, xpad)))
        if xpad:
            # widen the block grid: pad block-columns become copy blocks
            # (bts 0, zero rect) — motion sources stay inside the real X
            T = bts.shape[0]
            nby = (Y + 15) // 16
            nbx = (X + 15) // 16
            nbx_p = (X + xpad) // 16

            def padg(a, fill=0):
                a = a.reshape(T, nby, nbx, *a.shape[2:])
                pw = [(0, 0), (0, 0), (0, nbx_p - nbx)] + [(0, 0)] * (
                    a.ndim - 3)
                a = jnp.pad(a, pw, constant_values=fill)
                return a.reshape(T, nby * nbx_p, *a.shape[3:])

            bts, mv, rect = padg(bts), padg(mv), padg(rect)
    frames, signif = _scan_decode_fused(
        init_frame, bts, mv, rect, payload, changed,
        insignificant_blocks, interpret=interpret)
    return frames[:, :Y, :X] if (ypad or xpad) else frames, signif


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_batch_fused(
    init_frames, bts, mv, rect, payload, changed, insignificant_blocks,
    interpret: bool = False,
):
    """Batched fused decode — unrolled over streams (not vmapped: the
    Pallas call's serial per-block loop doesn't batch) and routed through
    decode_sequence_fused so the pad/crop alignment handling applies."""
    outs = [decode_sequence_fused(init_frames[b], bts[b], mv[b], rect[b],
                                  payload[b], changed[b],
                                  insignificant_blocks, interpret=interpret)
            for b in range(init_frames.shape[0])]
    return (jnp.stack([o[0] for o in outs]),
            jnp.stack([o[1] for o in outs]))
