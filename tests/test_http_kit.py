"""HTTP kit unit tests: router, multipart parsing, error mapping."""

import json

from omnilingual_asr_tpu.serving.http_kit import (
    AppServer,
    HTTPError,
    JSONResponse,
    Request,
    Router,
    _parse_multipart,
)


def make_request(method="GET", path="/", body=b"", headers=None, query=None):
    return Request(method=method, path=path, query=query or {},
                   headers=headers or {}, body=body)


class TestRouter:
    def test_path_params(self):
        r = Router()

        @r.route("GET", "/api/history/{hid}")
        def h(req):
            return JSONResponse({"id": req.path_params["hid"]})

        resp = r.dispatch(make_request(path="/api/history/abc123"))
        assert json.loads(resp.body) == {"id": "abc123"}

    def test_method_mismatch(self):
        r = Router()
        r.add("POST", "/x", lambda req: JSONResponse({}))
        assert r.dispatch(make_request(method="GET", path="/x")) is None

    def test_no_partial_match(self):
        r = Router()
        r.add("GET", "/api/history", lambda req: JSONResponse({}))
        assert r.dispatch(make_request(path="/api/history/extra")) is None


class TestMultipart:
    BOUNDARY = b"BoUnDaRy42"

    def build(self, parts):
        out = b""
        for headers, payload in parts:
            out += b"--" + self.BOUNDARY + b"\r\n" + headers + b"\r\n\r\n" \
                + payload + b"\r\n"
        return out + b"--" + self.BOUNDARY + b"--\r\n"

    def test_fields_and_files(self):
        body = self.build([
            (b'Content-Disposition: form-data; name="language"', b"en"),
            (b'Content-Disposition: form-data; name="file"; '
             b'filename="a.wav"\r\nContent-Type: audio/wav', b"RIFFdata"),
        ])
        fields, files = _parse_multipart(body, self.BOUNDARY)
        assert fields == {"language": "en"}
        assert files["file"][0].filename == "a.wav"
        assert files["file"][0].content == b"RIFFdata"
        assert files["file"][0].content_type == "audio/wav"

    def test_repeated_file_fields(self):
        body = self.build([
            (b'Content-Disposition: form-data; name="files"; filename="1.wav"',
             b"one"),
            (b'Content-Disposition: form-data; name="files"; filename="2.wav"',
             b"two"),
        ])
        _, files = _parse_multipart(body, self.BOUNDARY)
        assert [f.content for f in files["files"]] == [b"one", b"two"]

    def test_binary_payload_with_crlf(self):
        payload = b"\r\n\x00\xff--not-a-boundary\r\n\x01"
        body = self.build([
            (b'Content-Disposition: form-data; name="file"; filename="b.bin"',
             payload),
        ])
        _, files = _parse_multipart(body, self.BOUNDARY)
        assert files["file"][0].content == payload

    def test_request_form_urlencoded(self):
        req = make_request(
            method="POST", body=b"a=1&b=two",
            headers={"content-type": "application/x-www-form-urlencoded"})
        fields, files = req.form()
        assert fields == {"a": "1", "b": "two"}
        assert files == {}


class TestAppServer:
    def test_http_error_maps_to_detail_json(self):
        r = Router()

        @r.route("GET", "/boom")
        def boom(req):
            raise HTTPError(418, "teapot")

        app = AppServer(r)
        resp = app.handle(make_request(path="/boom"))
        assert resp.status == 418
        assert json.loads(resp.body) == {"detail": "teapot"}

    def test_unhandled_exception_is_500(self):
        r = Router()

        @r.route("GET", "/crash")
        def crash(req):
            raise RuntimeError("oops")

        app = AppServer(r)
        resp = app.handle(make_request(path="/crash"))
        assert resp.status == 500

    def test_404(self):
        app = AppServer(Router())
        resp = app.handle(make_request(path="/nope"))
        assert resp.status == 404

    def test_middleware_short_circuit(self):
        r = Router()
        r.add("GET", "/x", lambda req: JSONResponse({"ok": True}))
        app = AppServer(r, middleware=lambda req: JSONResponse(
            {"error": "blocked"}, 401))
        resp = app.handle(make_request(path="/x"))
        assert resp.status == 401
