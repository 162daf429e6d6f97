"""HTTP-level server tests against the stdlib serving stack, using the fake
engine (hermetic — no TPU, no model)."""

import http.client
import io
import json
import wave

import numpy as np
import pytest

from omnilingual_asr_tpu.serving.app import OmniServer
from omnilingual_asr_tpu.testing import FakeEngine


def make_wav_bytes(seconds=1.0, sr=8000):
    buf = io.BytesIO()
    x = (np.sin(np.arange(int(seconds * sr)) * 0.1) * 10000).astype("<i2")
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(x.tobytes())
    return buf.getvalue()


def multipart(fields: dict, files: list):
    """files: [(name, filename, bytes)]"""
    boundary = "testboundary123"
    out = io.BytesIO()
    for k, v in fields.items():
        out.write(f"--{boundary}\r\nContent-Disposition: form-data; "
                  f"name=\"{k}\"\r\n\r\n{v}\r\n".encode())
    for name, fname, data in files:
        out.write(f"--{boundary}\r\nContent-Disposition: form-data; "
                  f"name=\"{name}\"; filename=\"{fname}\"\r\n"
                  f"Content-Type: application/octet-stream\r\n\r\n".encode())
        out.write(data)
        out.write(b"\r\n")
    out.write(f"--{boundary}--\r\n".encode())
    return out.getvalue(), f"multipart/form-data; boundary={boundary}"


class Client:
    def __init__(self, port, token=None):
        self.port = port
        self.token = token

    def request(self, method, path, body=None, content_type=None, raw=False,
                headers=None):
        conn = http.client.HTTPConnection("127.0.0.1", self.port, timeout=30)
        headers = dict(headers or {})
        if content_type:
            headers["Content-Type"] = content_type
        if self.token:
            headers["Authorization"] = f"Bearer {self.token}"
        conn.request(method, path, body=body, headers=headers)
        resp = conn.getresponse()
        data = resp.read()
        conn.close()
        if raw:
            return resp.status, data
        return resp.status, (json.loads(data) if data else None)

    def sse(self, method, path, body, content_type):
        status, data = self.request(method, path, body, content_type, raw=True)
        events = []
        for block in data.decode().split("\n\n"):
            if not block.strip():
                continue
            ev = {}
            for line in block.splitlines():
                k, _, v = line.partition(": ")
                ev[k] = v
            if "event" in ev:
                events.append((ev["event"], json.loads(ev["data"])))
        return status, events


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    srv = OmniServer(engine=FakeEngine(),
                     base_dir=tmp_path_factory.mktemp("srv"),
                     auth_required=False)
    port = srv.serve_background()
    yield Client(port)
    srv.shutdown()


@pytest.fixture(scope="module")
def auth_server(tmp_path_factory):
    srv = OmniServer(engine=FakeEngine(),
                     base_dir=tmp_path_factory.mktemp("authsrv"),
                     auth_required=True)
    port = srv.serve_background()
    yield Client(port)
    srv.shutdown()


class TestTranscribeRoutes:
    def test_sync_transcribe(self, server):
        body, ctype = multipart({}, [("file", "a.wav", make_wav_bytes())])
        status, entry = server.request("POST", "/api/transcribe", body, ctype)
        assert status == 200
        assert entry["file_name"] == "a.wav"
        assert entry["id"]
        assert len(entry["segments"]) == 2
        seg = entry["segments"][0]
        assert seg["speaker"] == "Speaker 1"
        assert seg["languages"][0]["code"] == "lis"
        assert "summary" in entry and "detected_languages" in entry

    def test_zip_rejected_on_single(self, server):
        body, ctype = multipart({}, [("file", "a.zip", b"PK\x03\x04junk")])
        status, err = server.request("POST", "/api/transcribe", body, ctype)
        assert status == 400
        assert "batch" in err["detail"]

    def test_unsupported_type(self, server):
        body, ctype = multipart({}, [("file", "a.txt", b"hi")])
        status, err = server.request("POST", "/api/transcribe", body, ctype)
        assert status == 400
        assert err["detail"] == "Unsupported file type."

    def test_stream_events(self, server):
        body, ctype = multipart({"language": "en"},
                                [("file", "b.wav", make_wav_bytes())])
        status, events = server.sse("POST", "/api/transcribe-stream",
                                    body, ctype)
        assert status == 200
        names = [e for e, _ in events]
        # 4 progress steps then result (reference app.py:210-269)
        assert names[-1] == "result"
        steps = [d["step"] for e, d in events if e == "progress"]
        assert steps == ["uploading", "transcribing", "processing", "done"]
        result = events[-1][1]
        assert result["file_name"] == "b.wav"
        assert result["id"]

    def test_batch_stream(self, server):
        body, ctype = multipart(
            {}, [("files", "x.wav", make_wav_bytes()),
                 ("files", "y.wav", make_wav_bytes())])
        status, events = server.sse("POST", "/api/transcribe-batch-stream",
                                    body, ctype)
        assert status == 200
        result = events[-1][1]
        assert len(result["results"]) == 2
        prog = [d for e, d in events if e == "progress"]
        assert all("file_index" in p and p["file_count"] == 2 for p in prog)

    def test_batch_zip(self, server):
        import zipfile

        zbuf = io.BytesIO()
        with zipfile.ZipFile(zbuf, "w") as z:
            z.writestr("one.wav", make_wav_bytes())
            z.writestr("sub/two.wav", make_wav_bytes())
            z.writestr("../evil.wav", make_wav_bytes())  # traversal: skipped
            z.writestr("notes.txt", b"skip me")
        body, ctype = multipart({}, [("files", "batch.zip", zbuf.getvalue())])
        status, events = server.sse("POST", "/api/transcribe-batch-stream",
                                    body, ctype)
        assert status == 200
        results = events[-1][1]["results"]
        names = sorted(r["file_name"] for r in results)
        assert names == ["one.wav", "sub/two.wav"]


class TestHistoryRoutes:
    def test_crud(self, server):
        body, ctype = multipart({}, [("file", "h.wav", make_wav_bytes())])
        _, entry = server.request("POST", "/api/transcribe", body, ctype)
        hid = entry["id"]

        status, items = server.request("GET", "/api/history")
        assert status == 200
        assert any(i["id"] == hid for i in items)
        assert set(items[0]) == {"id", "file_name", "created_at"}

        status, got = server.request("GET", f"/api/history/{hid}")
        assert status == 200
        assert got["file_name"] == "h.wav"
        assert len(got["segments"]) == 2

        status, updated = server.request(
            "PUT", f"/api/history/{hid}",
            json.dumps({"file_name": "renamed.wav"}),
            "application/json")
        assert status == 200
        assert updated["file_name"] == "renamed.wav"

        status, out = server.request("DELETE", f"/api/history/{hid}")
        assert status == 200 and out == {"ok": True}
        status, _ = server.request("GET", f"/api/history/{hid}")
        assert status == 404

    def test_edit_audit_log(self, server, tmp_path):
        body, ctype = multipart({}, [("file", "e.wav", make_wav_bytes())])
        _, entry = server.request("POST", "/api/transcribe", body, ctype)
        server.request("PUT", f"/api/history/{entry['id']}",
                       json.dumps({"file_name": "edited.wav"}),
                       "application/json")
        # direct store check (edits table, reference migrations/0001:32-42)
        # via a fresh GET — audit is internal, entry must reflect the edit
        _, got = server.request("GET", f"/api/history/{entry['id']}")
        assert got["file_name"] == "edited.wav"

    def test_missing_404(self, server):
        status, err = server.request("GET", "/api/history/nope")
        assert status == 404
        assert err["detail"] == "History entry not found."


class TestAuth:
    def test_register_login_me_flow(self, auth_server):
        # no token -> 401 (middleware, reference _middleware.js:24-29)
        status, err = auth_server.request("GET", "/api/history")
        assert status == 401
        assert err["error"] == "Authentication required."

        # bad access code -> 403 (reference auth/register.js:54-58)
        status, err = auth_server.request(
            "POST", "/api/auth/register",
            json.dumps({"access_code": "wrong", "email": "a@b.co",
                        "password": "longenough"}), "application/json")
        assert status == 403

        status, out = auth_server.request(
            "POST", "/api/auth/register",
            json.dumps({"access_code": "sesquip", "email": "a@b.co",
                        "password": "longenough"}), "application/json")
        assert status == 201
        token = out["token"]
        assert out["user"]["email"] == "a@b.co"

        # duplicate -> 409
        status, _ = auth_server.request(
            "POST", "/api/auth/register",
            json.dumps({"access_code": "sesquip", "email": "a@b.co",
                        "password": "longenough"}), "application/json")
        assert status == 409

        # login
        status, out = auth_server.request(
            "POST", "/api/auth/login",
            json.dumps({"email": "a@b.co", "password": "longenough"}),
            "application/json")
        assert status == 200
        # bad password
        status, _ = auth_server.request(
            "POST", "/api/auth/login",
            json.dumps({"email": "a@b.co", "password": "wrongwrong"}),
            "application/json")
        assert status == 401

        # authenticated requests
        auth_client = Client(auth_server.port, token=token)
        status, items = auth_client.request("GET", "/api/history")
        assert status == 200 and items == []
        status, me = auth_client.request("GET", "/api/auth/me")
        assert status == 200 and me["user"]["email"] == "a@b.co"

    def test_password_rules(self, auth_server):
        status, err = auth_server.request(
            "POST", "/api/auth/register",
            json.dumps({"access_code": "sesquip", "email": "x@y.co",
                        "password": "short"}), "application/json")
        assert status == 400
        status, err = auth_server.request(
            "POST", "/api/auth/register",
            json.dumps({"access_code": "sesquip", "email": "bademail",
                        "password": "longenough"}), "application/json")
        assert status == 400

    def test_user_scoping(self, auth_server):
        # user B cannot see user A's transcript
        _, a = auth_server.request(
            "POST", "/api/auth/register",
            json.dumps({"access_code": "sesquip", "email": "ua@s.co",
                        "password": "longenough"}), "application/json")
        _, b = auth_server.request(
            "POST", "/api/auth/register",
            json.dumps({"access_code": "sesquip", "email": "ub@s.co",
                        "password": "longenough"}), "application/json")
        ca = Client(auth_server.port, token=a["token"])
        cb = Client(auth_server.port, token=b["token"])
        body, ctype = multipart({}, [("file", "mine.wav", make_wav_bytes())])
        _, entry = ca.request("POST", "/api/transcribe", body, ctype)
        status, _ = cb.request("GET", f"/api/history/{entry['id']}")
        assert status == 404
        status, _ = ca.request("GET", f"/api/history/{entry['id']}")
        assert status == 200

    def test_cross_user_delete_keeps_segments(self, auth_server):
        # ADVICE r1 (high): user B's DELETE on user A's transcript must not
        # wipe A's segments even though the transcript row is user-scoped.
        _, a = auth_server.request(
            "POST", "/api/auth/register",
            json.dumps({"access_code": "sesquip", "email": "da@s.co",
                        "password": "longenough"}), "application/json")
        _, b = auth_server.request(
            "POST", "/api/auth/register",
            json.dumps({"access_code": "sesquip", "email": "db@s.co",
                        "password": "longenough"}), "application/json")
        ca = Client(auth_server.port, token=a["token"])
        cb = Client(auth_server.port, token=b["token"])
        body, ctype = multipart({}, [("file", "mine.wav", make_wav_bytes())])
        _, entry = ca.request("POST", "/api/transcribe", body, ctype)
        n_segs = len(entry["segments"])
        assert n_segs > 0
        status, _ = cb.request("DELETE", f"/api/history/{entry['id']}")
        assert status == 404
        status, mine = ca.request("GET", f"/api/history/{entry['id']}")
        assert status == 200
        assert len(mine["segments"]) == n_segs
        # owner's delete still cascades
        status, _ = ca.request("DELETE", f"/api/history/{entry['id']}")
        assert status == 200
        status, _ = ca.request("GET", f"/api/history/{entry['id']}")
        assert status == 404


class TestAuthPrimitives:
    def test_password_roundtrip(self):
        from omnilingual_asr_tpu.serving.auth import hash_password, verify_password

        h = hash_password("s3cretpass")
        salt, digest = h.split(":")
        assert len(salt) == 32 and len(digest) == 64  # 16B salt, 32B hash hex
        assert verify_password("s3cretpass", h)
        assert not verify_password("wrong", h)

    def test_jwt_roundtrip_and_expiry(self):
        from omnilingual_asr_tpu.serving.auth import (
            JWT_EXPIRY_SECONDS,
            create_jwt,
            verify_jwt,
        )

        tok = create_jwt({"sub": "u1", "email": "e@x.co"}, "secret", now=1000)
        payload = verify_jwt(tok, "secret", now=1001)
        assert payload["sub"] == "u1"
        assert payload["exp"] == 1000 + JWT_EXPIRY_SECONDS  # 30 days
        assert verify_jwt(tok, "wrong-secret", now=1001) is None
        assert verify_jwt(tok, "secret", now=payload["exp"] + 1) is None


class TestExportRoute:
    def test_export_formats(self, server):
        body, ctype = multipart({}, [("file", "ex.wav", make_wav_bytes())])
        _, entry = server.request("POST", "/api/transcribe", body, ctype)
        hid = entry["id"]
        status, eaf = server.request(
            "GET", f"/api/history/{hid}/export?format=eaf", raw=True)
        assert status == 200
        assert eaf.startswith(b'<?xml version="1.0" encoding="UTF-8"?>')
        status, srt = server.request(
            "GET", f"/api/history/{hid}/export?format=srt", raw=True)
        assert status == 200 and b"-->" in srt
        status, tg = server.request(
            "GET", f"/api/history/{hid}/export?format=textgrid", raw=True)
        assert status == 200 and tg.startswith(b'File type = "ooTextFile"')
        status, err = server.request(
            "GET", f"/api/history/{hid}/export?format=nope")
        assert status == 400

    def test_spa_served(self, server):
        status, html = server.request("GET", "/", raw=True)
        assert status == 200
        assert b"OmniScribe" in html
        status, js = server.request("GET", "/static/app.js", raw=True)
        assert status == 200 and b"uploadFiles" in js


class TestDemoRoute:
    def test_demo_entry(self, server):
        status, demo = server.request("GET", "/api/demo")
        assert status == 200
        assert demo["id"] == "demo"
        assert len(demo["segments"]) == 2
        assert demo["segments"][0]["languages"][0]["code"] == "lis"


class TestLiveStreamRoute:
    def test_segments_events_then_result(self, server):
        body, ctype = multipart({}, [("file", "live.wav", make_wav_bytes())])
        status, events = server.sse("POST", "/api/transcribe-stream-live",
                                    body, ctype)
        assert status == 200
        kinds = [e for e, _ in events]
        assert kinds[0] == "progress"
        assert "segments" in kinds
        assert kinds[-1] == "result"
        seg_events = [d for e, d in events if e == "segments"]
        total = sum(len(d["segments"]) for d in seg_events)
        assert total == 2  # demo result has 2 segments
        steps = [d["step"] for e, d in events if e == "progress"]
        assert steps == ["uploading", "transcribing", "processing", "done"]


class TestAudioBlobs:
    def test_audio_served_by_id(self, server):
        wav = make_wav_bytes()
        body, ctype = multipart({}, [("file", "blob.wav", wav)])
        _, entry = server.request("POST", "/api/transcribe", body, ctype)
        status, blob = server.request("GET", f"/api/audio/{entry['id']}",
                                      raw=True)
        assert status == 200
        assert blob == wav  # byte-exact blob roundtrip
        # entry carries the audio_key after reload
        _, got = server.request("GET", f"/api/history/{entry['id']}")
        assert got.get("audio_key", "").startswith("audio/")


class TestSchemaEdges:
    def test_result_to_entry_without_optional_fields(self):
        from omnilingual_asr_tpu.serving.schema import result_to_entry
        from omnilingual_asr_tpu.types import TranscriptSegment, TranscriptionResult

        res = TranscriptionResult(
            summary=None,
            segments=[TranscriptSegment(start=0, end=1, speaker="Speaker 1",
                                        text="x")],
            detected_languages=None)
        entry = result_to_entry(res, file_name="f.wav", audio_url="/u")
        # optional keys absent when falsy (reference app.py hasattr probing)
        assert "summary" not in entry
        assert "detected_languages" not in entry
        seg = entry["segments"][0]
        assert "language" not in seg and "translation" not in seg
        assert seg["words"] == []


class TestConcurrency:
    def test_parallel_sse_requests(self, tmp_path_factory):
        """Two simultaneous SSE transcriptions must not interleave state
        (the reference had a singleton race here, SURVEY §5 race row)."""
        import threading

        from omnilingual_asr_tpu.serving.app import OmniServer
        from omnilingual_asr_tpu.testing import FakeEngine

        srv = OmniServer(engine=FakeEngine(delay_s=0.3),
                         base_dir=tmp_path_factory.mktemp("conc"),
                         auth_required=False)
        port = srv.serve_background()
        client = Client(port)
        results = {}

        def run(name):
            body, ctype = multipart({}, [("file", f"{name}.wav",
                                          make_wav_bytes())])
            status, events = client.sse("POST", "/api/transcribe-stream",
                                        body, ctype)
            results[name] = (status, events)

        threads = [threading.Thread(target=run, args=(n,))
                   for n in ("a", "b", "c")]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=30)
        srv.shutdown()
        assert set(results) == {"a", "b", "c"}
        for name, (status, events) in results.items():
            assert status == 200
            final = events[-1][1]
            assert final["file_name"] == f"{name}.wav"
            # per-request progress events carry only this request's file
            for e, d in events[:-1]:
                assert d["file_name"] == f"{name}.wav"


class TestMemoryMode:
    def test_memory_history_server(self, tmp_path_factory):
        """In-memory mode: reference local-server semantics (entries die
        with the process, audio route unavailable)."""
        srv = OmniServer(engine=FakeEngine(),
                         base_dir=tmp_path_factory.mktemp("mem"),
                         auth_required=False, use_sqlite=False)
        port = srv.serve_background()
        c = Client(port)
        body, ctype = multipart({}, [("file", "m.wav", make_wav_bytes())])
        status, entry = c.request("POST", "/api/transcribe", body, ctype)
        assert status == 200
        status, items = c.request("GET", "/api/history")
        assert status == 200 and items[0]["id"] == entry["id"]
        status, _ = c.request("GET", f"/api/audio/{entry['id']}")
        assert status == 404  # no blob store in memory mode
        srv.shutdown()


class TestWav2ElanShell:
    """The reference's second frontend (workflows/wav2elan_web): a
    /wav2elan bootstrap of the same SPA with the x-session-key protocol.
    The reference server IGNORES the header (history is global); here it
    namespaces history per browser session when auth is off."""

    def test_shell_route_injects_mode_flag(self, server):
        status, body = server.request("GET", "/wav2elan", raw=True)
        assert status == 200
        html = body.decode()
        assert 'window.OMNI_SHELL="wav2elan"' in html
        assert "password-modal" in html

    def test_session_key_namespaces_history(self, server):
        body, ctype = multipart({}, [("file", "w2e.wav", make_wav_bytes())])
        status, entry = server.request(
            "POST", "/api/transcribe", body, ctype,
            headers={"x-session-key": "AbCd12345678"})
        assert status == 200
        s, mine = server.request(
            "GET", "/api/history",
            headers={"x-session-key": "AbCd12345678"})
        assert s == 200
        assert any(e["id"] == entry["id"] for e in mine)
        s, theirs = server.request(
            "GET", "/api/history",
            headers={"x-session-key": "Zz9876543210"})
        assert s == 200
        assert not any(e["id"] == entry["id"] for e in theirs)

    def test_invalid_session_key_ignored(self, server):
        # non-alphanumeric keys fall back to the anonymous namespace
        s, out = server.request(
            "GET", "/api/history",
            headers={"x-session-key": "../etc/passwd"})
        assert s == 200
        assert isinstance(out, list)
