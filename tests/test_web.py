"""Browser chrome server: the Main.hx UI layer (init_controls, Main.hx:515-720)
served over HTTP by jsplayer_tpu.web.PlayerServer.

Exercises every endpoint the embedded page uses — / (page with flashvar
colors), /info, /state (the 50 ms UI tick), /frame.rgba (canvas bytes), and
/control (the ExternalInterface JS API verbs, Main.hx:1025-1034) — against a
real muxed AVI fixture over a real local HTTP connection.
"""

import json
import urllib.request

import numpy as np
import pytest

from jsplayer_tpu.core.source import MemorySource
from jsplayer_tpu.player import PlayerConfig
from jsplayer_tpu.web import PlayerServer

from test_player import make_sp_avi


@pytest.fixture()
def server():
    avi, golds = make_sp_avi(nframes=12, keyevery=4)
    srv = PlayerServer(MemorySource(avi), PlayerConfig(indexed=False))
    srv.start()
    try:
        yield srv, golds
    finally:
        srv.stop()


def _get(srv, path):
    with urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}{path}", timeout=10) as r:
        return r.read()


def _post(srv, cmd, arg=None):
    body = json.dumps({"cmd": cmd, "arg": arg}).encode()
    req = urllib.request.Request(
        f"http://127.0.0.1:{srv.port}/control", data=body, method="POST",
        headers={"X-Control-Token": srv.control_token})
    with urllib.request.urlopen(req, timeout=10) as r:
        return json.loads(r.read())


def _state(srv):
    return json.loads(_get(srv, "/state"))


def test_page_carries_js_api_and_colors(server):
    srv, _ = server
    page = _get(srv, "/").decode()
    # the reference's window-level JS API (Main.hx:1025-1034)
    for fn in ("spplay", "sppause", "spposition", "spseek", "spload",
               "spnextchange", "spresize"):
        assert f"window.{fn}" in page
    # flashvar color defaults (Main.hx:244-249)
    assert "#2a6fbb" in page       # loaded-range fill
    assert "on_player_loaded" in page and "on_next_btn" in page


def test_page_honors_config_colors():
    avi, _ = make_sp_avi(nframes=4)
    srv = PlayerServer(MemorySource(avi),
                       PlayerConfig(indexed=False,
                                    colors={"loaded": "#ff0000"}))
    srv.start()
    try:
        page = _get(srv, "/").decode()
        assert "#ff0000" in page and "#2a6fbb" not in page
    finally:
        srv.stop()


def test_info_reports_stream_metadata(server):
    srv, _ = server
    info = json.loads(_get(srv, "/info"))
    assert info["loaded"] and info["width"] == 32 and info["height"] == 32
    assert info["nframes"] == 12 and info["fps"] == pytest.approx(10.0)


def test_state_tick_presents_first_frame_rgba(server):
    srv, golds = server
    st = None
    for _ in range(500):  # each /state poll is one UI tick (Main.hx:1037)
        st = _state(srv)
        if st["ok"] and st["frame_serial"] >= 0:
            break
    assert st["frame_serial"] == 0
    assert st["loaded"][1] > 0.0
    raw = _get(srv, "/frame.rgba")
    assert len(raw) == 32 * 32 * 4
    got = np.frombuffer(raw, dtype="<u4")
    g = golds[0].astype(np.uint32)
    # the canvas swizzle (Manager.hx:377-380): packed RGB word → ABGR word
    want = (0xFF000000 | ((g & 0xFF) << 16) | (g & 0xFF00)
            | ((g >> 16) & 0xFF)).astype(np.uint32)
    assert np.array_equal(got, want)


def test_play_pause_seek_and_resize(server):
    srv, golds = server
    for _ in range(200):
        if _state(srv)["frame_serial"] >= 0:
            break
    assert _post(srv, "play")["ok"]
    last = -1
    for _ in range(2000):
        st = _state(srv)
        if st["playing"] and st["frame_serial"] > 0:
            last = st["frame_serial"]
            break
    assert last > 0
    assert _post(srv, "pause")["ok"]
    assert _state(srv)["playing"] is False
    # seek back to the start fraction → frame 0 again
    assert _post(srv, "seek", 0.0)["ok"]
    for _ in range(200):
        st = _state(srv)
        if st["frame_serial"] == 0:
            break
    assert st["frame_serial"] == 0
    raw = _get(srv, "/frame.rgba")
    got = np.frombuffer(raw, dtype="<u4")
    g = golds[0].astype(np.uint32)
    want = (0xFF000000 | ((g & 0xFF) << 16) | (g & 0xFF00)
            | ((g >> 16) & 0xFF)).astype(np.uint32)
    assert np.array_equal(got, want)
    r = _post(srv, "resize", [64, 48])
    assert r["ok"] and r["size"] == [48, 48]  # aspect preserved (32x32)


def test_next_change_and_unknown_cmd(server):
    srv, _ = server
    for _ in range(200):
        if _state(srv)["frame_serial"] >= 0:
            break
    r = _post(srv, "next_change")
    assert r["ok"] and r["next_change"] is not None
    r = _post(srv, "bogus")
    assert r["ok"] is False and "unknown" in r["error"]


def test_frame_before_first_decode_is_black():
    avi, _ = make_sp_avi(nframes=4)
    srv = PlayerServer(MemorySource(avi), PlayerConfig(indexed=False))
    srv.start()
    try:
        raw = _get(srv, "/frame.rgba")  # no /state tick yet → nothing shown
        assert raw == bytes(32 * 32 * 4)
    finally:
        srv.stop()


def test_audio_wav_endpoint():
    """MP3 audio reaches the page: /audio.wav serves the Player's aligned
    PCM (the WebAudio decodeAudioData analog, AudioTrack.hx:54-65) as a
    playable 16-bit WAV whose duration matches the PTS model, and /state
    carries the seconds clock the page syncs <audio> to."""
    import struct

    from jsplayer_tpu.av import pcm
    from jsplayer_tpu.codecs.msvideo1 import from_rgb15
    from jsplayer_tpu.encode.mp3_synth import make_silence_frames
    from jsplayer_tpu.encode.avi_mux import mux_avi
    from jsplayer_tpu.encode.msv1_enc import encode_frame_16

    if not pcm.available():
        pytest.skip("system libavcodec not available")
    W, H, fps = 32, 24, 15.0
    prev, pkts = None, []
    for i in range(6):
        f = np.full(W * H, from_rgb15(0x0421), dtype=np.uint32)
        f[: W * (i + 1)] = from_rgb15(0x7C00)
        pkts.append(encode_frame_16(f, prev, W, H))
        prev = f
    mp3, n_mp3, rate = make_silence_frames(20)
    avi = mux_avi(pkts, W, H, 16, codec="CRAM", fps=fps,
                  keyflags=[i == 0 for i in range(6)],
                  sound_chunks=[(0, mp3)])
    srv = PlayerServer(MemorySource(avi), PlayerConfig(indexed=False))
    srv.start()
    try:
        wav = _get(srv, "/audio.wav")
        assert wav[:4] == b"RIFF" and wav[8:12] == b"WAVE"
        (nch,) = struct.unpack_from("<H", wav, 22)
        (got_rate,) = struct.unpack_from("<I", wav, 24)
        (dlen,) = struct.unpack_from("<I", wav, 40)
        assert got_rate == rate
        assert dlen == len(wav) - 44
        # PTS model: 1152 samples per MP3 frame (MP3Parser.hx:206)
        assert dlen // (2 * nch) == n_mp3 * 1152
        st = json.loads(_get(srv, "/state"))
        assert "time" in st
        # page wiring: the audio element and sync hook are in the chrome
        page = _get(srv, "/").decode()
        assert 'id="au"' in page and "/audio.wav" in page
    finally:
        srv.stop()


def test_audio_wav_404_without_audio(server):
    srv, _ = server
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(srv, "/audio.wav")
    assert ei.value.code == 404


def test_audio_wav_from_lane_container():
    """The chrome's audio endpoint also works for .jlv sources: MP3
    passthrough (lane_format JLAU section) -> LaneDataLoader ->
    /audio.wav, same PCM contract as the AVI path."""
    from jsplayer_tpu.av import pcm
    from jsplayer_tpu.codecs.msvideo1 import from_rgb15
    from jsplayer_tpu.encode.mp3_synth import make_silence_frames
    from jsplayer_tpu.encode.avi_mux import mux_avi
    from jsplayer_tpu.encode.msv1_enc import encode_frame_16
    from jsplayer_tpu.transcode import transcode_to_lane

    if not pcm.available():
        pytest.skip("system libavcodec not available")
    W, H = 32, 24
    prev, pkts = None, []
    for i in range(6):
        f = np.full(W * H, from_rgb15(0x0421), dtype=np.uint32)
        f[: W * (i + 1)] = from_rgb15(0x7C00)
        pkts.append(encode_frame_16(f, prev, W, H))
        prev = f
    mp3, _, _ = make_silence_frames(20)
    avi = mux_avi(pkts, W, H, 16, codec="CRAM", fps=15.0,
                  keyflags=[i == 0 for i in range(6)],
                  sound_chunks=[(0, mp3)])
    cont = transcode_to_lane(avi, window=4, K=2)
    srv = PlayerServer(MemorySource(cont), PlayerConfig())
    srv.start()
    try:
        wav = _get(srv, "/audio.wav")
        assert wav[:4] == b"RIFF" and len(wav) > 44
    finally:
        srv.stop()


def test_wait_mode_defers_load_until_play():
    """-Dwait parity (Main.hx:266-276, 406-426): with PlayerConfig(wait=
    True) the stream is NOT loaded at server start — /info reports the
    wait state and thumbnail URL for the page's start overlay — and the
    first 'play' control loads it."""
    avi, golds = make_sp_avi(nframes=8, keyevery=4)
    srv = PlayerServer(MemorySource(avi),
                       PlayerConfig(indexed=False, wait=True,
                                    thumb="/my-thumb.png"))
    srv.start()
    try:
        info = json.loads(_get(srv, "/info"))
        assert info == {"loaded": False, "wait": True,
                        "thumb": "/my-thumb.png"}
        page = _get(srv, "/").decode()
        assert "waitov" in page and "start" in page
        assert _post(srv, "play")["ok"]
        info = json.loads(_get(srv, "/info"))
        assert info["loaded"] and info["nframes"] == 8
        for _ in range(500):
            st = _state(srv)
            if st["ok"] and st["frame_serial"] >= 0:
                break
        assert st["frame_serial"] >= 0
    finally:
        srv.stop()


def test_audio_wav_range_request():
    """Browsers require byte-range support for media elements (Safari
    refuses sources without it): /audio.wav honors Range with 206 +
    Content-Range and advertises Accept-Ranges."""
    from jsplayer_tpu.av import pcm
    from jsplayer_tpu.codecs.msvideo1 import from_rgb15
    from jsplayer_tpu.encode.mp3_synth import make_silence_frames
    from jsplayer_tpu.encode.avi_mux import mux_avi
    from jsplayer_tpu.encode.msv1_enc import encode_frame_16

    if not pcm.available():
        pytest.skip("system libavcodec not available")
    W, H = 32, 24
    f = np.full(W * H, from_rgb15(0x0421), dtype=np.uint32)
    pkts = [encode_frame_16(f, None, W, H)]
    mp3, _, _ = make_silence_frames(12)
    avi = mux_avi(pkts, W, H, 16, codec="CRAM", fps=15.0, keyflags=[True],
                  sound_chunks=[(0, mp3)])
    srv = PlayerServer(MemorySource(avi), PlayerConfig(indexed=False))
    srv.start()
    try:
        whole = _get(srv, "/audio.wav")
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/audio.wav",
            headers={"Range": "bytes=4-11"})
        with urllib.request.urlopen(req, timeout=10) as r:
            assert r.status == 206
            assert r.headers["Content-Range"] == f"bytes 4-11/{len(whole)}"
            assert r.headers["Accept-Ranges"] == "bytes"
            assert r.read() == whole[4:12]
        # open-ended suffix range
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/audio.wav",
            headers={"Range": f"bytes={len(whole) - 8}-"})
        with urllib.request.urlopen(req, timeout=10) as r:
            assert r.status == 206 and r.read() == whole[-8:]
    finally:
        srv.stop()


def test_wait_mode_failed_load_is_retryable():
    """A failed deferred load must re-park the source and report the error
    — not leave wait mode silently dead behind an ok:true no-op."""
    srv = PlayerServer("/nonexistent/path.avi",
                       PlayerConfig(indexed=False, wait=True))
    srv.start()
    try:
        for _ in range(2):  # still failing on retry, still reported
            r = _post(srv, "play")
            assert r["ok"] is False and "load failed" in r["error"]
        assert json.loads(_get(srv, "/info"))["wait"] is True
    finally:
        srv.stop()


def test_control_malformed_inputs_return_400(server):
    """Page-supplied /control input must never kill the request thread:
    None/dict args (TypeError), inf seeks (OverflowError), NaN fractions
    (ValueError) and garbage JSON all come back as clean error responses,
    and the server keeps serving afterwards."""
    import urllib.error
    import urllib.request

    srv, p = server

    def post(body: bytes):
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/control", data=body, method="POST",
            headers={"X-Control-Token": srv.control_token})
        try:
            with urllib.request.urlopen(req, timeout=10) as r:
                return r.status, json.loads(r.read())
        except urllib.error.HTTPError as e:
            return e.code, json.loads(e.read())

    bad = [
        b"{not json",
        b'{"cmd": "seek"}',                      # arg None -> TypeError
        b'{"cmd": "seek", "arg": {"x": 1}}',     # dict -> TypeError
        b'{"cmd": "resize", "arg": 3}',          # not a pair -> TypeError
        b"6",                                    # valid JSON, not an object
        b"[1, 2]",                               # (fuzz seed 904710: .get
        b"null",                                 #  on int escaped to 500)
        b'"play"',
    ]
    for body in bad:
        code, resp = post(body)
        assert code == 400 and "error" in resp, (body, code, resp)
    # numeric edge values are VALID scrubber input: the manager clamps
    # them to the stream range instead of erroring (fuzz-found, seed
    # 271828 — a negative seek_time used to negative-index the frame
    # list; see test_player.test_hostile_seek_times_clamp)
    for body in (b'{"cmd": "seek", "arg": Infinity}',
                 b'{"cmd": "seek", "arg": NaN}',
                 b'{"cmd": "seek_time", "arg": -1}',
                 b'{"cmd": "seek_time", "arg": 1e18}'):
        code, resp = post(body)
        assert code == 200 and resp["ok"], (body, code, resp)
    # ...AND the surfaced position stays finite: python json accepts
    # NaN/Infinity on input, but emitting them back makes /state invalid
    # JSON for the browser (review-found: start_pos kept the raw value)
    raw = _get(srv, "/state").decode()
    assert "NaN" not in raw and "Infinity" not in raw, raw
    json.loads(raw)
    # a malformed/negative Content-Length is page-supplied input too:
    # 400, not an escape into the 500 handler (urllib can't send these —
    # raw socket)
    import socket

    for cl in (b"abc", b"-5", b"99999999999"):
        with socket.create_connection(("127.0.0.1", srv.port),
                                      timeout=10) as s:
            s.sendall(b"POST /control HTTP/1.1\r\nHost: 127.0.0.1\r\n"
                      b"Content-Length: " + cl + b"\r\n\r\n")
            status = s.recv(65536).decode().splitlines()[0]
        assert " 400 " in status, (cl, status)
    # the server is still healthy
    code, resp = post(b'{"cmd": "pause"}')
    assert code == 200 and resp["ok"]


def test_paused_state_polls_do_no_decode_work(server):
    """The reference's known defect is CPU/GPU load while PAUSED
    (readme.txt:8-9, an OpenFL glitch).  This chrome must idle: once the
    decode-ahead ring is full, paused /state polls present no new frame
    (stable frame_serial — the page then skips /frame.rgba refetches) and
    decode no further frames."""
    from jsplayer_tpu.utils.logging import LOG

    srv, p = server
    assert _post(srv, "pause")["ok"]
    # drain decode-ahead until the ring is full
    for _ in range(50):
        _state(srv)
    before = LOG.counters["frames_decoded"]
    serials = {_state(srv)["frame_serial"] for _ in range(30)}
    assert len(serials) == 1
    assert LOG.counters["frames_decoded"] == before


def test_page_carries_dom_render_mode(server):
    """?dom=1 renders frames through an <img> DOM element instead of the
    canvas — the reference's -Ddom build variant (readme.txt:8-9; mk.bat).
    The page ships both paths; the query switch selects at load."""
    srv, p = server
    page = _get(srv, "/").decode()
    assert "DOM_MODE" in page and "dom=1" not in page.split("?")[0]
    assert "toDataURL" in page           # the img-swap path
    assert "putImageData" in page        # the canvas path stays default
    assert "URLSearchParams(location.search).get('dom')" in page


def test_request_origin_discipline(server):
    """Advisor r4 (medium): loopback binding alone stops neither CSRF (a
    cross-origin POST is a no-preflight simple request) nor DNS rebinding
    (evil.com resolving to 127.0.0.1 exposes /frame.rgba).  Three gates:
    Host must name this loopback server, a browser-sent Origin must be a
    loopback origin, and /control needs the page's per-session token."""
    import urllib.error
    import urllib.request

    srv, p = server
    url = f"http://127.0.0.1:{srv.port}"

    def req(path, headers, body=None):
        r = urllib.request.Request(
            url + path, data=body, headers=headers,
            method="POST" if body is not None else "GET")
        try:
            with urllib.request.urlopen(r, timeout=10) as resp:
                return resp.status
        except urllib.error.HTTPError as e:
            return e.code

    play = json.dumps({"cmd": "pause"}).encode()
    tok = {"X-Control-Token": srv.control_token}
    # DNS rebinding: a non-loopback Host is refused on every endpoint
    assert req("/frame.rgba", {"Host": "evil.example:80"}) == 403
    assert req("/state", {"Host": "evil.example"}) == 403
    assert req("/control", {"Host": "evil.example", **tok}, play) == 403
    # CSRF: a cross-origin browser POST is refused even with the token
    assert req("/control",
               {"Origin": "http://evil.example", **tok}, play) == 403
    # token: same-origin posts without the page token are refused
    assert req("/control", {}, play) == 403
    assert req("/control", {"X-Control-Token": "wrong"}, play) == 403
    # and the legitimate combinations still work
    assert req("/control", tok, play) == 200
    assert req("/control", {"Origin": f"http://127.0.0.1:{srv.port}",
                            **tok}, play) == 200
    assert req("/state", {}) == 200
    # the served page embeds the token for its own posts
    assert srv.control_token in _get(srv, "/").decode()


def test_dom_query_url_serves_page(server):
    """Navigating to /?dom=1 (how the -Ddom variant is actually reached)
    must serve the page, not 404 on the literal path match."""
    srv, p = server
    page = _get(srv, "/?dom=1").decode()
    assert "DOM_MODE" in page


def test_load_of_missing_path_is_clean_400(server):
    """Advisor r4: control('load') with a nonexistent file used to raise
    FileNotFoundError past the handler and kill the request with no
    response; it must come back as a clean JSON 400."""
    import urllib.error
    import urllib.request

    srv, p = server
    body = json.dumps({"cmd": "load",
                       "arg": "/nonexistent/path.avi"}).encode()
    r = urllib.request.Request(
        f"http://127.0.0.1:{srv.port}/control", data=body, method="POST",
        headers={"X-Control-Token": srv.control_token})
    try:
        with urllib.request.urlopen(r, timeout=10) as resp:
            code, payload = resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        code, payload = e.code, json.loads(e.read())
    assert code in (200, 400) and "error" in payload
    # server is still healthy
    assert _post(srv, "pause")["ok"]
