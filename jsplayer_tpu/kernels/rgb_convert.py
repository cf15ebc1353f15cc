"""Pixel-format conversion + ML-ingestion transforms — device epilogues.

Parity surface: the per-pixel conversion loops of Manager.fill_bitmap_data
(Manager.hx:325-390) — RGB15→ARGB (`0xFF000000 | (src<<3)`, :369) and the
RGB→ABGR swizzle (`0xFF000000 | ((c&0xFF)<<16) | (c&0xFF00) | ((c>>16)&0xFF)`,
:379) — plus the conversion-buffer variants (:337-354).

TPU-native additions (the reference stops at canvas pixels): fused
channel-split → float/bfloat16 normalize → NHWC/NCHW tensor emit, resize by
integer factors, and bottom-up→top-down flip (frames are stored bottom-up;
the reference compensates with a negative-Y display matrix, Main.hx:318).
These are jnp-level ops so XLA fuses them into the decode epilogue — decoded
frames never round-trip to host for model ingestion.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rgb15_to_argb(frame: jax.Array) -> jax.Array:
    """16bpp ScreenPressor output → ARGB u32 (Manager.hx:363-370)."""
    return (jnp.uint32(0xFF000000) | (frame << 3)).astype(jnp.uint32)


def rgb_to_abgr(frame: jax.Array) -> jax.Array:
    """Packed (b<<16)|(g<<8)|r → 0xFF000000|(r<<16)|(g<<8)|b
    (Manager.hx:371-381)."""
    c = frame
    return (
        jnp.uint32(0xFF000000)
        | ((c & 0xFF) << 16)
        | (c & 0xFF00)
        | ((c >> 16) & 0xFF)
    ).astype(jnp.uint32)


def rgb15_to_argb_conv_buffer(frame: jax.Array) -> jax.Array:
    """The conversion-buffer 16bpp path (`conv_buffer[i] = src[i] << 11`,
    Manager.hx:337-343)."""
    return (frame << 11).astype(jnp.uint32)


def rgb_to_opaque(frame: jax.Array) -> jax.Array:
    """`conv_buffer[i] = 0xFF000000 | c` (Manager.hx:345-355)."""
    return (jnp.uint32(0xFF000000) | frame).astype(jnp.uint32)


def split_channels(frame: jax.Array, bpp16: bool = False) -> jax.Array:
    """u32-packed [..., H, W] → [..., H, W, 3] uint8 (r, g, b).

    Packing is the decode-loop layout (b<<16)|(g<<8)|r for ScreenPressor
    (ScreenPressor.hx:189) and (r<<16)|(g<<8)|b for MSVideo1's fromRGB15
    (MSVideo1.hx:211-214) — pass the matching channel order downstream; for
    16bpp SP content the 5-bit values are scaled <<3 like the display path.
    """
    c = frame
    ch0 = (c & 0xFF).astype(jnp.uint8)
    ch1 = ((c >> 8) & 0xFF).astype(jnp.uint8)
    ch2 = ((c >> 16) & 0xFF).astype(jnp.uint8)
    out = jnp.stack([ch0, ch1, ch2], axis=-1)
    if bpp16:
        out = out << 3
    return out


def to_model_input(
    frame: jax.Array,
    dtype=jnp.bfloat16,
    layout: str = "NHWC",
    mean: float = 0.0,
    scale: float = 1.0 / 255.0,
    flip_vertical: bool = True,
    bpp16: bool = False,
) -> jax.Array:
    """Fused decode→model-tensor epilogue: u32 [..., H, W] → normalized
    [..., H, W, 3] (NHWC) or [..., 3, H, W] (NCHW) in `dtype`."""
    x = split_channels(frame, bpp16=bpp16)
    if flip_vertical:
        x = jnp.flip(x, axis=-3)  # bottom-up storage → top-down tensor
    x = (x.astype(jnp.float32) * scale - mean).astype(dtype)
    if layout == "NCHW":
        x = jnp.moveaxis(x, -1, -3)
    return x


def resize_half(frame_u8: jax.Array) -> jax.Array:
    """2× box downsample on [..., H, W, C] uint8 (ingestion resize)."""
    h, w = frame_u8.shape[-3], frame_u8.shape[-2]
    x = frame_u8.astype(jnp.uint16)
    x = x.reshape(*frame_u8.shape[:-3], h // 2, 2, w // 2, 2, frame_u8.shape[-1])
    return (x.sum(axis=(-4, -2)) // 4).astype(jnp.uint8)
