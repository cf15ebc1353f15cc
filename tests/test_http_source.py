"""HTTP byte-range transport (PostStream.hx parity): standard Range GET and
the reference's custom s=/e= POST protocol, served by a localhost test
server; full Player playback over HTTP."""

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs

import numpy as np
import pytest

from jsplayer_tpu.core.source import HttpRangeSource, open_source


def make_server(payload: bytes):
    class H(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def do_HEAD(self):
            self.send_response(200)
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()

        def do_GET(self):
            rng = self.headers.get("Range")
            if rng:
                spec = rng.split("=")[1]
                s, _, e = spec.partition("-")
                start = int(s)
                end = int(e) if e else len(payload) - 1
            else:
                start, end = 0, len(payload) - 1
            end = min(end, len(payload) - 1)
            body = payload[start:end + 1]
            self.send_response(206 if rng else 200)
            self.send_header("Content-Range",
                             f"bytes {start}-{end}/{len(payload)}")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            # the reference's player_js protocol: s/e in headers AND body
            n = int(self.headers.get("Content-Length", 0))
            body = parse_qs(self.rfile.read(n).decode())
            start = int(self.headers.get("s", body.get("s", ["0"])[0]))
            e_hdr = self.headers.get("e", body.get("e", [""])[0])
            end = int(e_hdr) if e_hdr else len(payload) - 1
            end = min(end, len(payload) - 1)
            out = payload[start:end + 1]
            self.send_response(200)
            self.send_header("Content-Length", str(len(out)))
            self.end_headers()
            self.wfile.write(out)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), H)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv, f"http://127.0.0.1:{srv.server_address[1]}/v.avi"


@pytest.fixture(scope="module")
def avi_server():
    from jsplayer_tpu.encode.avi_mux import mux_avi
    from jsplayer_tpu.encode.sp_enc import ScreenPressorEncoder, pack_rgb

    X = Y = 32
    enc = ScreenPressorEncoder(4, X, Y)
    rng = np.random.default_rng(3)
    f = np.full((Y, X), pack_rgb(2, 4, 6), dtype=np.uint32).reshape(-1)
    streams, golds = [enc.encode_i(f)], [f]
    for t in range(7):
        nf = f.copy().reshape(Y, X)
        nf[6:10, 4:28] = pack_rgb(*rng.integers(0, 256, 3))
        f = nf.reshape(-1)
        streams.append(enc.encode_p(f))
        golds.append(f)
    keys = [t == 0 for t in range(8)]
    avi = mux_avi(streams, X, Y, 24, codec="SPV4", keyflags=keys)
    srv, url = make_server(avi)
    yield url, avi, golds
    srv.shutdown()


@pytest.mark.parametrize("protocol", ["range", "post"])
def test_http_range_reads(avi_server, protocol):
    url, avi, _ = avi_server
    src = HttpRangeSource(url, protocol=protocol)
    assert src.size() == len(avi)
    assert src.read_range(0, 11) == avi[:12]
    assert src.read_range(5, 5) == avi[5:6]
    assert src.read_range(len(avi) - 7) == avi[-7:]
    got = b"".join(src.stream_range(3, 300, chunk_size=64))
    assert got == avi[3:301]


def test_open_source_http(avi_server):
    url, avi, _ = avi_server
    src = open_source(url)
    assert isinstance(src, HttpRangeSource)
    assert src.read_range(0, 3) == avi[:4]


def test_player_over_http(avi_server):
    """Full playback pipeline through the HTTP transport."""
    from jsplayer_tpu.pipeline.manager import FrameResult
    from jsplayer_tpu.player import Player, PlayerConfig

    url, _, golds = avi_server
    p = Player(PlayerConfig(indexed=False))
    vi = p.load(open_source(url))
    assert vi.nframes == len(golds)
    for _ in range(500):
        if p.tick() == FrameResult.DECOMPRESSED and p.first_shown:
            break
    assert p.first_shown
    np.testing.assert_array_equal(
        p.manager.buffers[p.manager._last_filled_buffer], golds[0])


def test_indexed_player_seek_over_http():
    """OpenDML-indexed AVI streamed over HTTP: seek triggers byte-range
    re-requests through the transport (the reference's LoadPart flow,
    DataLoaderAVIIndexed.hx:482-618)."""
    from jsplayer_tpu.encode.avi_mux import mux_avi_opendml
    from jsplayer_tpu.encode.sp_enc import ScreenPressorEncoder, pack_rgb
    from jsplayer_tpu.player import Player, PlayerConfig

    X = Y = 32
    n = 24
    enc = ScreenPressorEncoder(4, X, Y)
    rng = np.random.default_rng(9)
    f = np.full((Y, X), pack_rgb(1, 1, 1), dtype=np.uint32).reshape(-1)
    streams, golds = [], []
    for t in range(n):
        if t % 6 == 0:
            enc = ScreenPressorEncoder(4, X, Y)  # fresh GOP
            nf = f.copy().reshape(Y, X)
            nf[:] = pack_rgb(t, 3, 5)
            f = nf.reshape(-1)
            streams.append(enc.encode_i(f))
        else:
            nf = f.copy().reshape(Y, X)
            nf[4:8, 2:30] = pack_rgb(*rng.integers(0, 256, 3))
            f = nf.reshape(-1)
            streams.append(enc.encode_p(f))
        golds.append(f)
    keys = [t % 6 == 0 for t in range(n)]
    avi = mux_avi_opendml(streams, X, Y, 12, codec="SPV4", keyflags=keys)
    srv, url = make_server(avi)
    try:
        p = Player(PlayerConfig(indexed=True))
        vi = p.load(open_source(url))
        assert vi.nframes == n
        from jsplayer_tpu.pipeline.manager import FrameResult

        for _ in range(800):
            if p.tick() == FrameResult.DECOMPRESSED and p.first_shown:
                break
        assert p.first_shown
        # seek deep into the third GOP — range re-request over HTTP
        target = 14
        p.seek_time(target / p.manager.fps + 1e-3)
        for _ in range(800):
            p.tick()
            if p.manager.last_frame_drawn == target:
                break
        np.testing.assert_array_equal(
            p.manager.buffers[p.manager._last_filled_buffer], golds[target])
    finally:
        srv.shutdown()


def make_misbehaving_server(payload: bytes, mode: str):
    """Server that violates the range contract in a configurable way —
    exercising the client-side response validation (the PostStream.hx
    status/Content-Range checks, PostStream.hx:42-58 analog)."""
    class H(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_HEAD(self):
            self.send_response(200)
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()

        def do_GET(self):
            if mode == "ignores_range":
                self.send_response(200)
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)
                return
            if mode == "wrong_content_range":
                body = payload[: 8]
                self.send_response(206)
                # lies about the slice start (claims 0, whatever was asked)
                self.send_header("Content-Range",
                                 f"bytes 0-7/{len(payload)}")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            # odd success status a range client must not trust
            self.send_response(204)
            self.end_headers()

    srv = ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, f"http://127.0.0.1:{srv.server_address[1]}/v.avi"


def test_server_ignoring_range_rejected_and_sliceable():
    payload = bytes(range(256)) * 4
    srv, url = make_misbehaving_server(payload, "ignores_range")
    try:
        src = HttpRangeSource(url)
        # full-file request: a 200 whole-entity response IS the answer
        assert src.read_range(0) == payload
        # mid-file slice: corrupt if trusted — must be rejected by default
        with pytest.raises(IOError, match="ignored Range"):
            src.read_range(100, 199)
        with pytest.raises(IOError, match="ignored Range"):
            b"".join(src.stream_range(100, 199))
        # opt-in client-side slicing still returns the right bytes
        lenient = HttpRangeSource(url, accept_full_body=True)
        assert lenient.read_range(100, 199) == payload[100:200]
    finally:
        srv.shutdown()


def test_wrong_content_range_rejected():
    payload = bytes(range(256)) * 4
    srv, url = make_misbehaving_server(payload, "wrong_content_range")
    try:
        src = HttpRangeSource(url)
        with pytest.raises(IOError, match="Content-Range"):
            src.read_range(100, 199)
    finally:
        srv.shutdown()


def test_unexpected_status_rejected():
    payload = b"x" * 64
    srv, url = make_misbehaving_server(payload, "status_204")
    try:
        src = HttpRangeSource(url)
        with pytest.raises(IOError, match="unexpected HTTP status"):
            src.read_range(0, 7)
    finally:
        srv.shutdown()
