"""ScreenPressor motion compose via MXU shuffle — alignment-safe Pallas path.

Mosaic requires DMA/vector slice offsets provably aligned to the (8, 128)
tile, so arbitrary per-block motion windows cannot be sliced directly
(measured: per-pixel XLA gathers are ~25× slower than streaming; 16×16-slice
XLA gathers barely better).  This kernel sidesteps alignment entirely:

  1. for each motion block, DMA an ALIGNED over-fetch window
     prev[align8(sy) : +24, align128(sx) : +256] → VMEM scratch;
  2. extract the unaligned 16×16 tile with two select-matrix matmuls
         tile = A(ry) @ window @ B(rx)
     where A [16,24] and B [256,16] are one-hot row/column selectors built
     from iota compares — the MXU as a shuffle engine.  Pixels are 24-bit
     (ScreenPressor.hx:189), so float32 accumulation is exact;
  3. write the tile at its STATIC lane offset (the bx loop is unrolled, so
     every store offset is a compile-time constant).

Each grid program owns one 16-row band; the select pass (payload vs prev)
runs vectorized on the band, then motion tiles are patched in.  Runs under
interpret=True on CPU for the parity suite.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WIN_R = 24  # over-fetch rows (16 + 8 alignment slack)
WIN_C = 256  # over-fetch cols (16 + 128 alignment slack, padded to lane tile)


def _kernel(paycode_ref, prev_row_ref, prev_full_ref, src_yx_ref,
            is_motion_ref, out_ref, scratch, sems):
    X = out_ref.shape[1]
    nbx = X // 16

    paycode = paycode_ref[...]
    code = paycode >> 24
    out_ref[...] = jnp.where(code > 0, paycode & jnp.uint32(0x00FFFFFF),
                             prev_row_ref[...])

    # start all motion DMAs for this band (aligned windows), then patch
    for bx in range(nbx):

        @pl.when(is_motion_ref[0, 0, bx] != 0)
        def _(bx=bx):
            sy = src_yx_ref[0, 0, 2 * bx]
            sx = src_yx_ref[0, 0, 2 * bx + 1]
            ay = pl.multiple_of((sy // 8) * 8, 8)
            ax = pl.multiple_of((sx // 128) * 128, 128)
            pltpu.make_async_copy(
                prev_full_ref.at[pl.ds(ay, WIN_R), pl.ds(ax, WIN_C)],
                scratch.at[bx], sems.at[bx],
            ).start()

    for bx in range(nbx):

        @pl.when(is_motion_ref[0, 0, bx] != 0)
        def _(bx=bx):
            sy = src_yx_ref[0, 0, 2 * bx]
            sx = src_yx_ref[0, 0, 2 * bx + 1]
            ay = pl.multiple_of((sy // 8) * 8, 8)
            ax = pl.multiple_of((sx // 128) * 128, 128)
            pltpu.make_async_copy(
                prev_full_ref.at[pl.ds(ay, WIN_R), pl.ds(ax, WIN_C)],
                scratch.at[bx], sems.at[bx],
            ).wait()
            ry = sy - ay  # 0..7
            rx = sx - ax  # 0..127
            # Mosaic lacks a direct u32→f32 cast: bitcast to i32 first
            # (values are 24-bit pixels, so i32 is lossless and positive)
            win = pltpu.bitcast(scratch[bx], jnp.int32).astype(jnp.float32)
            rows24 = jax.lax.broadcasted_iota(jnp.int32, (16, WIN_R), 1)
            rows16 = jax.lax.broadcasted_iota(jnp.int32, (16, WIN_R), 0)
            A = (rows24 == rows16 + ry).astype(jnp.float32)  # [16, 24]
            cols256 = jax.lax.broadcasted_iota(jnp.int32, (WIN_C, 16), 0)
            cols16 = jax.lax.broadcasted_iota(jnp.int32, (WIN_C, 16), 1)
            Bm = (cols256 == cols16 + rx).astype(jnp.float32)  # [256, 16]
            # MXU defaults truncate f32 operands to bf16 — 24-bit pixels
            # need HIGHEST (multi-pass) precision to stay exact
            tile = jnp.dot(
                jnp.dot(A, win, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST),
                Bm, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
            out_ref[:, bx * 16 : (bx + 1) * 16] = pltpu.bitcast(
                tile.astype(jnp.int32), jnp.uint32)


def _pad_prev_for_overfetch(prev: jax.Array) -> jax.Array:
    """Over-fetch windows can extend 8 rows / 128 cols past valid sources at
    the bottom/right edges; pad so DMAs stay in bounds."""
    return jnp.pad(prev, ((0, 8), (0, 128)))


def compose_frame_mxu_safe(prev, paycode, src_yx, is_motion, interpret=False):
    """Wrapper handling over-fetch padding: prev is padded [Y+16?]... the
    padded array keeps alignment (rows+8 multiple of 8; cols+128 multiple of
    128) and the kernel only reads tiles whose VALID 16×16 region is in
    bounds; padded lanes feed only the discarded part of the window."""
    Y, X = prev.shape
    prev_padded = _pad_prev_for_overfetch(prev)
    # the banded inputs (paycode/prev rows) keep the original geometry; only
    # the ANY-space motion source uses the padded buffer
    return _compose_padded(prev, prev_padded, paycode, src_yx, is_motion,
                           interpret)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _compose_padded(prev, prev_padded, paycode, src_yx, is_motion, interpret):
    Y, X = prev.shape
    nby = Y // 16
    nbx = X // 16
    # per-band SMEM slices (a full-array scalar-prefetch operand would be
    # replicated per grid step and overflow SMEM at 1080p scale)
    # band axis leads; last two dims equal the full array dims (Mosaic's
    # SMEM block rule), so each grid step gets exactly its band's scalars.
    src_yx_b = src_yx.reshape(nby, 1, nbx * 2)
    is_motion_b = is_motion.reshape(nby, 1, nbx)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nby,),
        in_specs=[
            pl.BlockSpec((16, X), lambda i: (i, 0)),
            pl.BlockSpec((16, X), lambda i: (i, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 1, nbx * 2), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, nbx), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((16, X), lambda i: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((nbx, WIN_R, WIN_C), jnp.uint32),
            pltpu.SemaphoreType.DMA((nbx,)),
        ],
    )
    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Y, X), jnp.uint32),
        interpret=interpret,
    )(paycode, prev, prev_padded, src_yx_b, is_motion_b)
