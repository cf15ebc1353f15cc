"""Lane-container stream format — device-entropy re-encode of SP streams.

BASELINE config 4 end-to-end (VERDICT round-2 item 1): a re-encoded stream
whose payload rides interleaved rANS lanes so BOTH entropy decode and frame
reconstruction run on device — after demux the host never touches entropy,
removing the system bottleneck (host ~2.4k fps/core vs ~30k device fps).

Design (TPU-first; the reference has no analog — its entropy is inherently
host/serial, ANS.hx adaptive contexts):

* Frame commands are the kmv compose's semantics (ScreenPressor.hx:302-484
  via kernels/sp_recon.derive_kmv_commands): per 16x16 block a type
  (0 copy / 1 data-in-rect / 2+k motion-slot-k-in-rect), a block-local rect,
  and K per-frame motion vectors.  Stored sparsely (active blocks only).
* Payload pixels (data-block rect content) are serialized in 128-px
  LANE-ROW UNITS of the padded plane [Y, ceil(X/128)*128]: the device
  rebuilds each frame's data plane with a ROW GATHER (free on TPU) —
  no dynamic_update_slice chain, no 16x16 relayout, and FULL frames
  (keyframes) ride the identical machinery.
* Unit pixel bytes are entropy-coded with the renorm-aligned multi-lane
  rANS (kernels/rans_lanes, ~2 Gsym/s on-device) under a per-window
  static frequency table.  Symbol order is per-unit byte-plane
  triplets [U, 3, 128], so the device-side unpack is one free reshape +
  middle-dim slices + an elementwise combine, invariant under U
  bucketing (padded units decode to rows nothing references).

A container holds GOP-aligned windows; windows are independent decode
chains when keyframe-led, which is what the transcoder emits.

SIZE TRADE (measured, round 3): this is a DECODE-THROUGHPUT format, not
a compression format.  The renorm-aligned refill layout ships a fixed
~2 B per payload symbol regardless of entropy (screen content often
compresses to ~0.1-0.5 B/sym in the source SP stream), and raw init
planes add 8.3 MB per keyframe-led 1080p window — a 1080p screencast
container runs ~1-2 MB/s of content (bench corpus: 12 KB AVI → 16.7 MB;
terminal corpus: 0.5 MB AVI → 31.8 MB).  That is the deliberate price
for 2 Gsym/s device entropy decode with ~zero host work; keep the
SOURCE AVI for archival, stage containers where decode speed matters
(HBM/local disk), and zstd them at rest if needed.

Wire layout (little-endian):

  header:  "JLV1" | u16 X | u16 Y | u8 bpp | u8 K | u16 n_lanes
           | u32 n_frames | u16 window | u32 fps_num | u32 fps_den
  window record:
           u32 record_bytes (excluding this field)
           u16 T (frames in window) | u32 U (payload units)
           | u32 n_active (blocks) | u32 steps (lane scan length)
           changed[T] u8 | signif[T] u8 | mvk[T*K*2] i16
           per-frame active-block counts u32[T]
           active blocks: (u32 block_index | u8 btype | u8 rect[4]) each
           per-frame unit counts u32[T]
           unit plane-row ids u32[U]
           freq i32[256] | states u32[n_lanes]
           refills u8[steps * n_lanes * 2]
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field
from typing import Optional

import numpy as np

from ..kernels import rans_lanes
from ..kernels.sp_recon import derive_kmv_commands

_MAGIC = b"JLV1"
_AUDIO_MAGIC = b"JLAU"
_HDR = "<4sHHBBHIHII"


def plane_cols(X: int) -> int:
    """Padded plane width: payload units are 128-px lane rows."""
    return -(-X // 128) * 128


@dataclass
class LaneWindow:
    """One decoded window record (host arrays, ready for device_put)."""

    T: int
    changed: np.ndarray          # [T] bool
    signif: np.ndarray           # [T] bool
    mvk: np.ndarray              # [T, K, 2] int32
    btype: np.ndarray            # [T, NB] uint8 (dense; 0/1/2+k)
    rect: np.ndarray             # [T, NB, 4] uint8 (block-local x1,y1,x2,y2)
    unit_rows: list              # per frame: np.ndarray of plane-row ids
    n_units: int                 # U — total unit count across frames
    freq: np.ndarray             # [256] int32
    states: np.ndarray           # [N] uint32
    refills: np.ndarray          # [steps, N, 2] uint8
    # Window-leading keyframe extracted as a RAW [Y, X] u32 scan-init
    # plane: entropy-coding a full 1080p frame is ~6M symbols (4 ms even
    # at the 2-level search's 1.5 Gsym/s) and its ~16K payload units make
    # the per-frame row gather latency-bound — shipping it dense is both
    # FASTER and SMALLER on the wire than its refill rows.  Frame 0 then
    # stays in the scan as an all-copy changed frame (carry passthrough
    # of the init).  None = window continues the previous carry.
    init_plane: Optional[np.ndarray] = None

    def inv_index(self, R: int) -> np.ndarray:
        """[T, R] int32: plane row → global unit row (0 where absent; the
        device compose masks absent rows out via the data-rect test)."""
        inv = np.zeros((self.T, R), dtype=np.int32)
        off = 0
        for t, rows in enumerate(self.unit_rows):
            inv[t, rows] = off + np.arange(rows.size, dtype=np.int32)
            off += rows.size
        return inv


@dataclass
class LaneContainer:
    X: int
    Y: int
    bpp: int
    K: int
    n_lanes: int
    n_frames: int
    window: int
    fps: float
    windows: list = field(default_factory=list)  # list[LaneWindow]
    # raw MP3 audio passthrough: the source AVI's concatenated 01wb chunk
    # payloads (the reference's sound stream, MP3Parser.hx input) — the
    # lane re-encode must not silently drop audio.  None = no audio.
    audio: Optional[bytes] = None


def _block_local_rects(rect_g: np.ndarray, nbx: int) -> np.ndarray:
    """Global-coordinate block rects [NB, 4] → block-local u8 [NB, 4]."""
    nb = rect_g.shape[0]
    bx = (np.arange(nb) % nbx) * 16
    by = (np.arange(nb) // nbx) * 16
    loc = np.empty((nb, 4), dtype=np.int64)
    loc[:, 0] = rect_g[:, 0] - bx
    loc[:, 1] = rect_g[:, 1] - by
    loc[:, 2] = rect_g[:, 2] - bx
    loc[:, 3] = rect_g[:, 3] - by
    return np.clip(loc, 0, 16).astype(np.uint8)


def derive_window(bts: np.ndarray, mv: np.ndarray, rect: np.ndarray,
                  payload: np.ndarray, changed: np.ndarray,
                  signif: np.ndarray, X: int, Y: int, K: int,
                  n_lanes: int) -> LaneWindow:
    """Host derivation: captured commands + decoded frames → a LaneWindow.

    Mirrors kernels/sp_recon.prepare_kmv's pixel semantics exactly (same
    derive_kmv_commands grouping, same demotion rule), so the device lane
    compose is bit-exact with the dense-paycode path by construction."""
    T, NB = bts.shape
    nbx, nby = (X + 15) // 16, (Y + 15) // 16
    Xp = plane_cols(X)
    nxu = Xp // 128
    mvk, group, demoted = derive_kmv_commands(bts, mv, rect, K)

    btype = np.zeros((T, NB), dtype=np.uint8)
    rloc = np.zeros((T, NB, 4), dtype=np.uint8)
    yy, xx = np.mgrid[0:Y, 0:X]
    bi_map = (yy >> 4) * nbx + (xx >> 4)
    ly, lx = yy & 15, xx & 15
    unit_rows: list[np.ndarray] = []
    unit_px: list[np.ndarray] = []
    per_frame_units = np.zeros(T, dtype=np.int64)
    pay = payload & np.uint32(0x00FFFFFF)
    # window-leading keyframe → raw init plane (see LaneWindow.init_plane):
    # frame 0 must be a full-frame data paint (every block data, full
    # rects, no motion) — the I-frame capture shape
    full_rects = np.empty((NB, 4), dtype=np.int64)
    full_rects[:, 0] = (np.arange(NB) % nbx) * 16
    full_rects[:, 1] = (np.arange(NB) // nbx) * 16
    full_rects[:, 2] = np.minimum(full_rects[:, 0] + 16, X)
    full_rects[:, 3] = np.minimum(full_rects[:, 1] + 16, Y)
    init_plane = None
    if (T > 0 and changed[0] and (bts[0] == 1).all()
            and (rect[0] == full_rects).all()):
        init_plane = pay[0].copy()
    for t in range(T):
        if t == 0 and init_plane is not None:
            # all-copy changed frame: the scan passes the init through
            unit_rows.append(np.zeros(0, dtype=np.int64))
            continue
        is_mot_block = (bts[t] == 3) | (bts[t] == 4)
        data_blk = (bts[t] > 0) & ~is_mot_block
        loc = _block_local_rects(rect[t], nbx)
        sel = data_blk & ~demoted[t]
        btype[t, sel] = 1
        rloc[t, sel] = loc[sel]
        # demoted motion blocks carry full final content (prepare_kmv's
        # `is_data |= demoted` has no rect mask)
        btype[t, demoted[t]] = 1
        rloc[t, demoted[t]] = (0, 0, 16, 16)
        mot = (group[t] >= 0) & ~demoted[t]
        btype[t, mot] = (2 + group[t, mot]).astype(np.uint8)
        rloc[t, mot] = loc[mot]

        if not changed[t]:
            unit_rows.append(np.zeros(0, dtype=np.int64))
            continue
        bt_px = btype[t][bi_map]
        r_px = rloc[t][bi_map]
        is_data = ((bt_px == 1) & (lx >= r_px[..., 0]) & (lx < r_px[..., 2])
                   & (ly >= r_px[..., 1]) & (ly < r_px[..., 3]))
        mask_p = np.zeros((Y, Xp), dtype=bool)
        mask_p[:, :X] = is_data
        um = mask_p.reshape(Y, nxu, 128).any(axis=-1)
        rows = np.nonzero(um.reshape(-1))[0]
        per_frame_units[t] = rows.size
        unit_rows.append(rows)
        if rows.size:
            plane = np.zeros((Y, Xp), dtype=np.uint32)
            plane[:, :X] = pay[t]
            unit_px.append(plane.reshape(Y * nxu, 128)[rows])

    U = int(per_frame_units.sum())
    units = (np.concatenate(unit_px, axis=0) if U
             else np.zeros((0, 128), dtype=np.uint32))
    # per-unit byte-plane triplets [U, 3, 128]: each unit's byte0 row, then
    # byte1, byte2.  The device unpack (lane_recon.units_from_pack) is a
    # free middle-dim reshape/slice and — crucially — stays correct when U
    # is padded to a bucket (a window-global plane split would shift the
    # byte-plane offsets with U)
    arr = np.empty((U, 3, 128), dtype=np.uint8)
    arr[:, 0] = units & 0xFF
    arr[:, 1] = (units >> 8) & 0xFF
    arr[:, 2] = (units >> 16) & 0xFF
    syms = arr.reshape(-1)
    freq = rans_lanes.build_freq_table(syms if syms.size
                                       else np.zeros(1, np.uint8))
    lane_bytes, states, ns = rans_lanes.encode_lanes(syms, freq, n_lanes)
    # exact step count on the wire — consumers pad refills to their own
    # shape buckets (pipeline/ingest does), so pow2-bucketing here only
    # inflated the container (~35% on the bench corpus)
    steps = max(1, -(-ns // n_lanes))
    refills = rans_lanes.layout_refills(lane_bytes, states, freq, steps)
    return LaneWindow(T=T, changed=changed.astype(bool),
                      signif=signif.astype(bool),
                      mvk=mvk.astype(np.int32), btype=btype, rect=rloc,
                      unit_rows=unit_rows, n_units=U, freq=freq,
                      states=states, refills=refills, init_plane=init_plane)


# ---------------------------------------------------------------------------
# Serialization
# ---------------------------------------------------------------------------

def _window_to_bytes(w: LaneWindow, K: int, n_lanes: int) -> bytes:
    T = w.T
    NB = w.btype.shape[1]
    active = w.btype != 0
    n_active_t = active.sum(axis=1).astype(np.uint32)
    n_active = int(n_active_t.sum())
    blocks = bytearray()
    for t in range(T):
        idx = np.nonzero(active[t])[0]
        rec = np.empty((idx.size, 9), dtype=np.uint8)
        rec[:, 0:4] = idx.astype("<u4").reshape(-1, 1).view(np.uint8)
        rec[:, 4] = w.btype[t, idx]
        rec[:, 5:9] = w.rect[t, idx]
        blocks += rec.tobytes()
    unit_counts = np.array([r.size for r in w.unit_rows], dtype=np.uint32)
    unit_rows = b"".join(r.astype("<u4").tobytes() for r in w.unit_rows)
    steps = w.refills.shape[0]
    has_init = 1 if w.init_plane is not None else 0
    body = (struct.pack("<HIIIB", T, w.n_units, n_active, steps, has_init)
            + w.changed.astype(np.uint8).tobytes()
            + w.signif.astype(np.uint8).tobytes()
            + w.mvk.astype("<i2").tobytes()
            + n_active_t.astype("<u4").tobytes()
            + bytes(blocks)
            + unit_counts.astype("<u4").tobytes()
            + bytes(unit_rows)
            + w.freq.astype("<i4").tobytes()
            + w.states.astype("<u4").tobytes()
            + w.refills.tobytes()
            + (w.init_plane.astype("<u4").tobytes() if has_init else b""))
    return struct.pack("<I", len(body)) + body


def container_to_bytes(c: LaneContainer) -> bytes:
    import math

    fps_den = 1000
    fps_num = int(round(c.fps * fps_den)) if math.isfinite(c.fps) else 0
    head = struct.pack(_HDR, _MAGIC, c.X, c.Y, c.bpp, c.K, c.n_lanes,
                       c.n_frames, c.window, fps_num, fps_den)
    body = head + b"".join(_window_to_bytes(w, c.K, c.n_lanes)
                           for w in c.windows)
    if c.audio:
        body += _AUDIO_MAGIC + struct.pack("<Q", len(c.audio)) + c.audio
    return body


def is_lane_container(data: bytes) -> bool:
    return data[:4] == _MAGIC


def container_from_bytes(data: bytes) -> LaneContainer:
    """Parse a container.  Untrusted input: every size field is validated
    against the remaining byte count before allocation (the adversarial-
    stream discipline of the codecs)."""
    hs = struct.calcsize(_HDR)
    if len(data) < hs:
        raise ValueError("lane container truncated (header)")
    magic, X, Y, bpp, K, n_lanes, n_frames, window, fps_num, fps_den = (
        struct.unpack_from(_HDR, data, 0))
    if magic != _MAGIC:
        raise ValueError("not a lane container")
    if not (0 < X <= 1 << 15 and 0 < Y <= 1 << 15 and 0 < n_lanes <= 1 << 15
            and 0 < K <= 8):
        raise ValueError("implausible lane container header")
    c = LaneContainer(X=X, Y=Y, bpp=bpp, K=K, n_lanes=n_lanes,
                      n_frames=n_frames, window=window,
                      fps=(fps_num / fps_den if fps_den else 0.0))
    nbx = (X + 15) // 16
    nby = (Y + 15) // 16
    NB = nbx * nby
    R = Y * (plane_cols(X) // 128)
    off = hs
    while off < len(data):
        if data[off : off + 4] == _AUDIO_MAGIC:
            if off + 12 > len(data):
                raise ValueError("lane container truncated (audio header)")
            (alen,) = struct.unpack_from("<Q", data, off + 4)
            if off + 12 + alen > len(data):
                raise ValueError("lane container truncated (audio)")
            c.audio = bytes(data[off + 12 : off + 12 + alen])
            off += 12 + alen
            continue
        if off + 4 > len(data):
            raise ValueError("lane container truncated (record size)")
        (rec_len,) = struct.unpack_from("<I", data, off)
        off += 4
        end = off + rec_len
        if end > len(data):
            raise ValueError("lane container truncated (record)")
        c.windows.append(_window_from_bytes(
            memoryview(data)[off:end], K, n_lanes, NB, R, X, Y))
        off = end
    return c


def _window_from_bytes(buf: memoryview, K: int, n_lanes: int, NB: int,
                       R: int, X: int, Y: int) -> LaneWindow:
    def take(n):
        nonlocal pos
        if pos + n > len(buf):
            raise ValueError("lane window truncated")
        out = buf[pos : pos + n]
        pos += n
        return out

    pos = 0
    T, U, n_active, steps, has_init = struct.unpack_from("<HIIIB", buf, 0)
    pos = struct.calcsize("<HIIIB")
    if T > 1 << 12 or U > 1 << 26 or n_active > (1 << 12) * NB \
            or steps > 1 << 24:
        raise ValueError("implausible lane window header")
    changed = np.frombuffer(take(T), dtype=np.uint8).astype(bool)
    signif = np.frombuffer(take(T), dtype=np.uint8).astype(bool)
    mvk = np.frombuffer(take(T * K * 2 * 2), dtype="<i2").astype(
        np.int32).reshape(T, K, 2)
    n_active_t = np.frombuffer(take(T * 4), dtype="<u4").astype(np.int64)
    if int(n_active_t.sum()) != n_active:
        raise ValueError("lane window: active-block counts disagree")
    rec = np.frombuffer(take(n_active * 9), dtype=np.uint8).reshape(-1, 9)
    bi_all = rec[:, 0:4].copy().view("<u4").reshape(-1).astype(np.int64)
    if (bi_all >= NB).any():
        raise ValueError("lane window: block index out of range")
    btype = np.zeros((T, NB), dtype=np.uint8)
    rect = np.zeros((T, NB, 4), dtype=np.uint8)
    o = 0
    for t in range(T):
        n = int(n_active_t[t])
        bi = bi_all[o : o + n]
        btype[t, bi] = rec[o : o + n, 4]
        rect[t, bi] = rec[o : o + n, 5:9]
        o += n
    bt_bad = (btype > 1 + K)  # valid codes 0..K+1 (motion slots 0..K-1)
    if bt_bad.any():
        raise ValueError("lane window: block type out of range")
    unit_counts = np.frombuffer(take(T * 4), dtype="<u4").astype(np.int64)
    if int(unit_counts.sum()) != U:
        raise ValueError("lane window: unit counts disagree")
    rows_all = np.frombuffer(take(U * 4), dtype="<u4").astype(np.int64)
    if (rows_all >= R).any():
        raise ValueError("lane window: unit row out of range")
    unit_rows = []
    o = 0
    for t in range(T):
        n = int(unit_counts[t])
        rows = rows_all[o : o + n]
        if n and (np.diff(rows) <= 0).any():
            raise ValueError("lane window: unit rows not strictly increasing")
        unit_rows.append(rows)
        o += n
    freq = np.frombuffer(take(256 * 4), dtype="<i4").astype(np.int32)
    if int(freq.sum()) != rans_lanes.PROB_SCALE or (freq <= 0).any():
        raise ValueError("lane window: invalid frequency table")
    states = np.frombuffer(take(n_lanes * 4), dtype="<u4").astype(np.uint32)
    refills = np.frombuffer(take(steps * n_lanes * 2), dtype=np.uint8)
    refills = refills.reshape(steps, n_lanes, 2).copy()
    if 3 * U * 128 > steps * n_lanes:
        raise ValueError("lane window: payload exceeds lane capacity")
    init_plane = None
    if has_init:
        init_plane = np.frombuffer(take(X * Y * 4), dtype="<u4").astype(
            np.uint32).reshape(Y, X)
    return LaneWindow(T=T, changed=changed, signif=signif, mvk=mvk,
                      btype=btype, rect=rect, unit_rows=unit_rows,
                      n_units=U, freq=freq, states=states, refills=refills,
                      init_plane=init_plane)
