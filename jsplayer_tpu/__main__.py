"""Command-line surface: info / play / transcode / ingest.

Headless counterparts of the reference's browser embed (readme.txt:1-6):

  python -m jsplayer_tpu info file.avi          # stream metadata + indexes
  python -m jsplayer_tpu play file.avi          # headless playback stats
  python -m jsplayer_tpu transcode in.avi out.avi --version 4
  python -m jsplayer_tpu ingest a.avi b.avi     # batched decode → tensor shapes
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def cmd_info(args) -> int:
    from .core.source import open_source
    from .player import Player, PlayerConfig

    p = Player(PlayerConfig(indexed=not args.seq))
    try:
        vi = p.load(open_source(args.file))
    except ValueError as e:
        print(json.dumps({"error": str(e)}))
        return 1
    loader = p.manager.loader
    out = {
        "width": vi.width, "height": vi.height, "bpp": vi.bpp,
        "fps": round(vi.fps, 3), "nframes": vi.nframes,
        "codec": vi.codec.value,
        "has_palette": vi.palette is not None,
        "riff_size": vi.riff_size,
        "indexes": len(loader.indexes or []),
        "audio_indexes": len(loader.audio_indexes or []),
    }
    print(json.dumps(out, indent=2))
    return 0


def cmd_play(args) -> int:
    from .core.source import open_source
    from .pipeline.manager import FrameResult
    from .player import Player, PlayerConfig
    from .utils.logging import LOG

    p = Player(PlayerConfig(indexed=not args.seq, autoskip=args.autoskip))
    vi = p.load(open_source(args.file))
    t0 = time.monotonic()
    shown = 0
    for _ in range(100000):
        res = p.tick()
        if res == FrameResult.DECOMPRESSED and p.first_shown:
            break
    p.play()
    fake = [0.0]
    p._clock = lambda: fake[0]
    p.play()
    for i in range(vi.nframes):
        fake[0] = i / vi.fps + 0.001
        for _ in range(500):
            if p.tick() == FrameResult.DECOMPRESSED:
                shown += 1
                break
            if not p.playing:
                p.play()
    dt = time.monotonic() - t0
    print(json.dumps({
        "frames_presented": shown,
        "wall_seconds": round(dt, 3),
        "decode_fps": round(vi.nframes / dt, 1) if dt else None,
        "counters": dict(LOG.counters),
    }, indent=2))
    return 0


def cmd_transcode(args) -> int:
    from .transcode import transcode_sp

    with open(args.infile, "rb") as f:
        data = f.read()
    out = transcode_sp(data, target_version=args.version,
                       jobs=getattr(args, 'jobs', 1))
    with open(args.outfile, "wb") as f:
        f.write(out)
    print(json.dumps({"in_bytes": len(data), "out_bytes": len(out),
                      "version": args.version}))
    return 0


def cmd_ingest(args) -> int:
    from .core.source import open_source
    from .pipeline.ingest import IngestConfig, VideoIngestPipeline

    pipe = VideoIngestPipeline(
        [open_source(f) for f in args.files],
        IngestConfig(window=args.window, sp_device_path=args.path,
                     model_downscale=args.downscale,
                     emit_frames=not args.model_only,
                     sparse_lane_payload=args.lane_payload,
                     streaming=args.streaming,
                     still_elision=args.elide),
    )
    t0 = time.monotonic()
    n = 0
    for batch in pipe:
        mi = batch.get("model_input")
        if mi is None:  # all-stills elided window: nothing hit the device
            print(f"window @{batch['start_frame']}: all stills (elided)",
                  file=sys.stderr)
            continue
        n += mi.shape[0] * mi.shape[1]
        print(f"window @{batch['start_frame']}: model_input "
              f"{tuple(mi.shape)} {mi.dtype}", file=sys.stderr)
    dt = time.monotonic() - t0
    print(json.dumps({"streams": len(args.files), "frames_decoded": n,
                      "wall_seconds": round(dt, 3),
                      "frames_per_sec": round(n / dt, 1) if dt else None}))
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="jsplayer_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    a = sub.add_parser("info", help="stream metadata")
    a.add_argument("file")
    a.add_argument("--seq", action="store_true", help="sequential loader")
    a.set_defaults(fn=cmd_info)

    a = sub.add_parser("play", help="headless playback run")
    a.add_argument("file")
    a.add_argument("--seq", action="store_true")
    a.add_argument("--autoskip", action="store_true")
    a.set_defaults(fn=cmd_play)

    a = sub.add_parser("transcode", help="re-encode SP stream")
    a.add_argument("infile")
    a.add_argument("outfile")
    a.add_argument("--version", type=int, default=4, choices=(2, 3, 4))
    a.add_argument("--jobs", type=int, default=0,
                   help="GOP-parallel workers (0 = all cores)")
    a.set_defaults(fn=cmd_transcode)

    a = sub.add_parser("ingest", help="batched decode to model tensors")
    a.add_argument("files", nargs="+")
    a.add_argument("--window", type=int, default=16)
    a.add_argument("--path", default="kmv",
                   choices=("kmv", "kmv_sparse", "general"),
                   help="SP device compose (kmv_sparse for link-fed hosts)")
    a.add_argument("--downscale", type=int, default=1,
                   help="power-of-two box downsample in the model epilogue")
    a.add_argument("--model-only", action="store_true",
                   help="fused model emission; skip full-res frame stacks")
    a.add_argument("--elide", action="store_true",
                   help="still-elision (single-stream exact or batched"
                        " bucketed compaction)")
    a.add_argument("--streaming", action="store_true",
                   help="windowed-memory demux: O(window) host residency"
                        " for multi-hour streams")
    a.add_argument("--lane-payload", action="store_true",
                   help="kmv_sparse: lane-rANS-coded tile payload decoded"
                        " on device (link-fed serving)")
    a.set_defaults(fn=cmd_ingest)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
