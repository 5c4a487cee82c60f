"""Live-HTTP transport over loopback: the reference Fetch gate order
(brink.go:166-229) — request cookies + one-way Authorization drop,
response-cookie merge, post-request domain gate, and the HEADER
Content-Length gate including the unknown-length(-1)-passes quirk —
exercised against a real socket (http.server on 127.0.0.1), which the
fetch-as-join path cannot do (a lookup join has no headers)."""

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pyarrow as pa
import pytest

from brinkray.ref.config import (
    AUTH_BASIC,
    Cookie,
    CrawlOptions,
    new_config_with_opts,
)

MAX_CL = 1024  # small gate so the fixtures can exceed it cheaply


class _Handler(BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.1"

    def log_message(self, *a):  # quiet
        pass

    def _send(self, status: int, body: bytes, headers=(), content_length=True):
        self.send_response(status)
        for k, v in headers:
            self.send_header(k, v)
        if content_length:
            self.send_header("Content-Length", str(len(body)))
        else:
            # no Content-Length, no chunking: read-until-close (the
            # Go ContentLength == -1 case)
            self.send_header("Connection", "close")
        self.end_headers()
        self.wfile.write(body)
        if not content_length:
            self.close_connection = True

    def do_GET(self):
        p = self.path
        if p == "/ok":
            self._send(200, b"hello world")
        elif p == "/missing":
            self._send(404, b"not here")
        elif p == "/big":
            self._send(200, b"x" * (MAX_CL + 10))
        elif p == "/nolen":
            self._send(200, b"y" * (MAX_CL + 10), content_length=False)
        elif p == "/liar":
            # header says huge, body is tiny: the reference trusts the
            # HEADER and drops before reading
            self.send_response(200)
            self.send_header("Content-Length", str(MAX_CL + 999))
            self.end_headers()
            self.wfile.write(b"tiny")
            self.close_connection = True
        elif p == "/setcookie":
            self._send(200, b"take this", headers=[("Set-Cookie", "sid=abc123; Path=/")])
        elif p == "/echo-auth":
            has = "yes" if self.headers.get("Authorization") else "no"
            self._send(200, f"auth:{has}".encode())
        elif p == "/echo-cookie":
            self._send(200, (self.headers.get("Cookie") or "").encode())
        else:
            self._send(404, b"")


@pytest.fixture(scope="module")
def http_site():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield f"http://127.0.0.1:{srv.server_address[1]}"
    finally:
        srv.shutdown()


def _cfg(base, **opt_kw):
    opts = CrawlOptions(max_content_length=MAX_CL, **opt_kw)
    return new_config_with_opts(base, opts)


def _fetcher(base, **opt_kw):
    from brinkray.engine.fetch import HttpFetcher

    return HttpFetcher(_cfg(base, **opt_kw), seen_actors=[], nshards=0)


def test_gate_order_statuses_and_content_length(http_site):
    """Status passthrough, header-CL drop, liar-header drop (trusts the
    HEADER, never reads the oversized body), and the -1 quirk: a
    missing Content-Length PASSES even though the body exceeds the
    cap — byte-for-byte the reference's `-1 > max == false`."""
    f = _fetcher(http_site)
    assert f.fetch_one(f"{http_site}/ok") == (200, b"hello world")
    assert f.fetch_one(f"{http_site}/missing") == (404, b"not here")
    assert f.fetch_one(f"{http_site}/big") is None  # ContentTooLarge
    assert f.fetch_one(f"{http_site}/liar") is None  # header gate, not body
    status, body = f.fetch_one(f"{http_site}/nolen")  # unknown length passes
    assert status == 200 and len(body) == MAX_CL + 10


def test_domain_gate_after_request(http_site):
    """NotAllowed drops AFTER the request: the server observed the hit
    (we verify via the cookie it set), but the row vanished."""
    f = _fetcher(http_site)
    f._allowed = set()  # nothing allowed
    assert f.fetch_one(f"{http_site}/setcookie") is None
    # the response was still processed far enough to merge its cookie
    assert f.session.cookies["sid"].value == "abc123"


def test_transport_error_drops(http_site):
    f = _fetcher(http_site)
    assert f.fetch_one("http://127.0.0.1:9/ok") is None  # refused port
    assert f.fetch_one("not a url") is None


def test_cookie_and_auth_session_oracle_diff(http_site):
    """Cookie+auth config through the live transport, oracle-diffed
    against CookieSession (the unit-tested port of brink.go:166-203):
    request 1 carries Basic auth + the configured cookie; the response
    sets a session-named cookie; request 2 must carry BOTH cookies and
    NO Authorization header — permanently (the one-way drop)."""
    f = _fetcher(
        http_site,
        auth_type=AUTH_BASIC,
        user="u",
        password="p",
        cookies={"greet": Cookie(name="greet", value="hi")},
        session_cookie_names=["sid"],
    )
    # request 1: auth present (no session cookie in the jar yet)
    status, body = f.fetch_one(f"{http_site}/echo-auth")
    assert (status, body) == (200, b"auth:yes")
    # response plants the session cookie
    f.fetch_one(f"{http_site}/setcookie")
    assert f.session.cookies["sid"].value == "abc123"
    # request 3: both cookies sent, Authorization permanently dropped
    _, cookie_hdr = f.fetch_one(f"{http_site}/echo-cookie")
    sent = {kv.split("=")[0] for kv in cookie_hdr.decode().split("; ")}
    assert sent == {"greet", "sid"}
    _, body = f.fetch_one(f"{http_site}/echo-auth")
    assert body == b"auth:no"
    # oracle diff: an identically-configured CookieSession replaying the
    # same response-cookie merge agrees on headers for the NEXT request
    from brinkray.engine.fetch import CookieSession

    oracle = CookieSession(
        _cfg(
            http_site,
            auth_type=AUTH_BASIC,
            user="u",
            password="p",
            cookies={"greet": Cookie(name="greet", value="hi")},
            session_cookie_names=["sid"],
        )
    )
    oracle.prepare_headers()
    oracle.merge_response_cookies([Cookie(name="sid", value="abc123")])
    assert oracle.prepare_headers() == f.session.prepare_headers()


def test_http_batch_contract_matches_join_fetcher(http_site, ray_session):
    """The HttpFetcher stage output (mixed cached/novel batch) matches
    Fetcher's contract: cached replays pass through, novel rows carry
    live status/body, dropped rows vanish, output sorted by order_key,
    and fetched canons are marked in the seen shards."""
    from brinkray.engine.fetch import HttpFetcher
    from brinkray.state.seen import ShardedSeenSet

    seen = ShardedSeenSet(2)
    f = HttpFetcher(_cfg(http_site), seen.actors, 2)
    batch = pa.table(
        {
            "canon": pa.array(
                [f"{http_site}/ok", f"{http_site}/missing",
                 f"{http_site}/big", f"{http_site}/already"],
                pa.string(),
            ),
            "order_key": pa.array(["b", "c", "d", "a"], pa.string()),
            "seen_status": pa.array([-1, -1, -1, 200], pa.int32()),
        }
    )
    out = f(batch)
    assert out["order_key"].to_pylist() == ["a", "b", "c"]  # /big dropped
    assert out["cached"].to_pylist() == [True, False, False]
    assert out["status"].to_pylist() == [200, 200, 404]
    assert out["body"].to_pylist() == [b"", b"hello world", b"not here"]
    marks = seen.all_items()
    assert marks[f"{http_site}/ok"] == 200
    assert marks[f"{http_site}/missing"] == 404
