"""CLI surface (python -m jsplayer_tpu …): the JS ExternalInterface analog
(Main.hx:1025-1034) as a command-line API."""

import numpy as np
import pytest

from jsplayer_tpu.__main__ import main


@pytest.fixture(scope="module")
def avi_path(tmp_path_factory):
    from jsplayer_tpu.encode.avi_mux import mux_avi
    from jsplayer_tpu.encode.sp_enc import ScreenPressorEncoder, pack_rgb

    X = Y = 32
    enc = ScreenPressorEncoder(2, X, Y)
    rng = np.random.default_rng(4)
    f = np.full((Y, X), pack_rgb(3, 3, 3), dtype=np.uint32).reshape(-1)
    streams = [enc.encode_i(f)]
    for t in range(5):
        nf = f.copy().reshape(Y, X)
        nf[4:8, 2:20] = pack_rgb(*rng.integers(0, 256, 3))
        f = nf.reshape(-1)
        streams.append(enc.encode_p(f))
    avi = mux_avi(streams, X, Y, 24, codec="SPV2",
                  keyflags=[t == 0 for t in range(6)])
    p = tmp_path_factory.mktemp("cli") / "v.avi"
    p.write_bytes(avi)
    return str(p)


def test_cli_info(avi_path, capsys):
    assert main(["info", avi_path]) == 0
    out = capsys.readouterr().out
    assert "32" in out and ("SCREENPRESSOR" in out or "codec" in out.lower())


def test_cli_play(avi_path, capsys):
    assert main(["play", avi_path]) == 0
    out = capsys.readouterr().out
    assert "frames_presented" in out


def test_cli_transcode(avi_path, tmp_path, capsys):
    out = str(tmp_path / "v4.avi")
    assert main(["transcode", avi_path, out, "--version", "4"]) == 0
    data = open(out, "rb").read()
    assert data[:4] == b"RIFF"


def test_cli_ingest(avi_path, capsys):
    assert main(["ingest", avi_path, "--window", "3"]) == 0
    out = capsys.readouterr().out
    assert "frames" in out.lower() or "window" in out.lower()


def test_cli_ingest_sparse_elide(avi_path, capsys):
    assert main(["ingest", avi_path, "--window", "3", "--path", "kmv_sparse",
                 "--downscale", "1"]) == 0
    assert main(["ingest", avi_path, "--window", "3", "--elide"]) == 0


def test_cli_render_frames_and_wav(tmp_path):
    """render: PNG frames + WAV audio.  Color ground truth: the PNG we
    write must equal OpenCV's own decode of the same AVI (third-party
    color-order check — guards the R/B orientation end-to-end)."""
    import subprocess
    import sys

    import numpy as np

    from jsplayer_tpu.encode.avi_mux import mux_avi
    from jsplayer_tpu.encode.mp3_synth import make_silence_frames
    from jsplayer_tpu.encode.sp_enc import ScreenPressorEncoder, pack_rgb

    W, H = 32, 32
    # v3 + SCPR fourcc: decodable by OpenCV's FFmpeg (scpr supports v1-3),
    # giving a third-party ground truth for the rendered colors
    enc = ScreenPressorEncoder(3, W, H, bpp=24)
    # pack_rgb's 3rd arg lands in the HIGH byte = displayed red
    f = np.full(W * H, pack_rgb(10, 20, 200), dtype=np.uint32)  # reddish
    pkts = [enc.encode_i(f)]
    g = f.copy()
    g[: W * 8] = pack_rgb(200, 20, 10)  # blueish rows
    pkts.append(enc.encode_p(g))
    import json as _json

    def render(avi_bytes, name, wav):
        src = tmp_path / f"{name}.avi"
        src.write_bytes(avi_bytes)
        outdir = tmp_path / f"out_{name}"
        cmd = [sys.executable, "-m", "jsplayer_tpu", "render", str(src),
               str(outdir)] + (["--wav"] if wav else [])
        r = subprocess.run(
            cmd, capture_output=True, text=True, timeout=240,
            cwd="/root/repo",
            env={"JAX_PLATFORMS": "cpu",
                 "PATH": "/usr/bin:/bin:/usr/local/bin", "HOME": "/root"})
        assert r.returncode == 0, r.stderr[-2000:]
        return src, outdir, _json.loads(r.stdout.strip().splitlines()[-1])

    # video-only: cv2 can demux it -> third-party color ground truth
    avi_v = mux_avi(pkts, W, H, 24, codec="SCPR", keyflags=[True, False])
    src, outdir, res = render(avi_v, "v", wav=False)
    assert res["frames_written"] == 2
    try:
        import cv2
    except ImportError:
        cv2 = None
    if cv2 is not None and res["format"] == "png":
        img = cv2.imread(str(outdir / "frame_000001.png"))  # BGR
        cap = cv2.VideoCapture(str(src))
        cap.read()
        ok, ref = cap.read()
        cap.release()
        assert ok
        np.testing.assert_array_equal(img, ref)

    # with audio: WAV emission (cv2 chokes on the minimal audio strh)
    mp3, n_mp3, rate = make_silence_frames(5)
    avi_av = mux_avi(pkts, W, H, 24, codec="SCPR", keyflags=[True, False],
                     sound_chunks=[(0, mp3)])
    _src, _outdir, res = render(avi_av, "av", wav=True)
    assert res["frames_written"] == 2
    if res["wav"]:
        import wave

        with wave.open(res["wav"], "rb") as w:
            assert w.getframerate() == rate
            assert w.getnframes() == n_mp3 * 1152


def test_cli_serve(avi_path):
    # `serve` blocks in serve_forever; drive it from a subprocess and hit
    # the page + info endpoints (the chrome itself is tested in test_web).
    import json
    import socket
    import subprocess
    import sys
    import time
    import urllib.request

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    proc = subprocess.Popen(
        [sys.executable, "-m", "jsplayer_tpu", "serve", avi_path,
         "--port", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL)
    try:
        base = f"http://127.0.0.1:{port}"
        for _ in range(100):
            try:
                with urllib.request.urlopen(base + "/info", timeout=2) as r:
                    info = json.loads(r.read())
                break
            except OSError:
                time.sleep(0.1)
        else:
            raise AssertionError("serve did not come up")
        assert info["loaded"] and info["width"] == 32
        with urllib.request.urlopen(base + "/", timeout=5) as r:
            page = r.read()
        assert b"spplay" in page and b"<canvas" in page
    finally:
        proc.terminate()
        proc.wait(timeout=10)
