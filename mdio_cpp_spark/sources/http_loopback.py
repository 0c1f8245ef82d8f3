"""Loopback HTTP object-store server — the wheel-free twin of the
reference's live-cloud tests.

The reference exercises its GCS/S3 kvstore drivers against servers
(`gcs_test.cc` 374 LoC, `s3_test.cc` 372 LoC — both talk HTTP under the
SDKs). This module is that testbench for our ``HttpKVStore``: a stdlib
``ThreadingHTTPServer`` on 127.0.0.1 serving a directory with the object
-store verb set the engine needs —

  * ``GET``    with RFC 9110 single-range support (206 / 416 semantics),
  * ``HEAD``   (existence + Content-Length),
  * ``PUT``    (atomic tmp+rename publish, like a real object PUT),
  * ``DELETE`` (file → unlink, directory → recursive, for DeleteDataset),
  * directory ``GET`` → a minimal HTML index (the listing fallback).

It also records every request (method, path, Range header, status) so
tests can pin fetch SHAPES — "the partial shard read issued two ranged
GETs and never fetched the full object" — and injects failures
(``fail_first`` consecutive 5xx per key) to exercise the retry layer the
way a throttling object store would.

Real Spark executors' Python workers are separate OS processes; they reach
127.0.0.1 like any remote host, so distributed scans/writes through this
server traverse genuine sockets, not an in-process fake.
"""

from __future__ import annotations

import hashlib
import html
import os
import re
import shutil
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

_RANGE_RE = re.compile(r"bytes=(\d*)-(\d*)$")


def _etag(data: bytes) -> str:
    """Strong content ETag (what S3 returns for single-part objects)."""
    return '"' + hashlib.md5(data).hexdigest() + '"'


class LoopbackHttpServer:
    """Serve ``root_dir`` over http://127.0.0.1:<ephemeral-port>.

    ``fail_first``: each distinct (method, path) answers its first N
    requests with ``fail_status`` before succeeding — deterministic
    transient-failure injection for the retry suite. ``ignore_range``:
    answer ranged GETs with 200 + full body (a server that does not
    implement Range), which clients must handle by slicing locally.
    """

    def __init__(self, root_dir: str, fail_first: int = 0,
                 fail_status: int = 503, fail_methods: tuple = ("GET",),
                 ignore_range: bool = False,
                 strip_head_content_length: bool = False,
                 tls_cert: str | None = None, tls_key: str | None = None):
        self.root_dir = os.path.abspath(root_dir)
        self.requests: list[tuple[str, str, str | None, int]] = []
        self._fail_left: dict[tuple[str, str], int] = {}
        self._faults: list[dict] = []
        self._lock = threading.Lock()
        self._put_lock = threading.Lock()
        self.fail_first = fail_first
        self.fail_status = fail_status
        self.fail_methods = tuple(fail_methods)
        self.ignore_range = ignore_range
        # HEAD without Content-Length is legal (chunked/compressed); this
        # flag simulates such a server for the size()-fallback test
        self.strip_head_content_length = strip_head_content_length
        outer = self

        class Handler(BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def log_message(self, *a):  # quiet
                pass

            # ----------------------------------------------------- plumbing
            def _local(self) -> str | None:
                raw = urllib.parse.unquote(
                    urllib.parse.urlsplit(self.path).path)
                parts = [p for p in raw.split("/") if p]
                if any(p == ".." for p in parts):
                    return None
                path = os.path.join(outer.root_dir, *parts)
                # Containment must hold on the RESOLVED path too: the server
                # accepts PUT/DELETE, so a symlink inside root_dir pointing
                # outside it would otherwise let a request read or write
                # beyond the served tree even with ".." rejected above.
                root = os.path.realpath(outer.root_dir)
                real = os.path.realpath(path)
                if real != root and not real.startswith(root + os.sep):
                    return None
                return path

            def _record(self, status: int) -> None:
                with outer._lock:
                    outer.requests.append((
                        self.command, urllib.parse.urlsplit(self.path).path,
                        self.headers.get("Range"), status))

            def _send_faulted(self, status: int, body: bytes,
                              extra: dict, fault: str) -> None:
                """Serve ``body`` under an active byte-level fault — the
                failure modes real object stores exhibit that a clean 5xx
                test never covers (truncated replies, header/body
                disagreement, mid-transfer resets)."""
                if fault == "reset":
                    # close before any reply, RST-style: client sees a
                    # connection reset / RemoteDisconnected, not an HTTP
                    # status. SO_LINGER(0) makes the close abortive so the
                    # kernel does not deliver a graceful FIN.
                    self._record(-1)
                    import socket
                    import struct
                    self.connection.setsockopt(
                        socket.SOL_SOCKET, socket.SO_LINGER,
                        struct.pack("ii", 1, 0))
                    self.close_connection = True
                    self.connection.close()
                    # the stdlib request loop still flushes wfile after the
                    # verb handler returns; hand it a sink so the abortive
                    # close doesn't raise inside the server thread
                    self.wfile = open(os.devnull, "wb")
                    return
                if fault == "wrong_content_range":
                    # lie in the header: claim a window 3 bytes longer than
                    # the body actually carries (a metadata/data race on a
                    # mutating object presents exactly like this)
                    cr = extra.get("Content-Range")
                    if cr and "/" in cr:
                        win, total = cr.rsplit("/", 1)
                        a, b = win[len("bytes "):].split("-")
                        extra = dict(extra, **{
                            "Content-Range":
                                f"bytes {a}-{int(b) + 3}/{total}"})
                    self._reply(status, body, extra)
                    return
                # "truncate": full headers (Content-Length of the whole
                # window), half the bytes, abrupt close — the classic
                # truncated-206 failure
                self._record(status)
                self.send_response(status)
                for k, v in extra.items():
                    self.send_header(k, v)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body[: max(1, len(body) // 2)])
                self.wfile.flush()
                self.close_connection = True
                self.connection.close()
                self.wfile = open(os.devnull, "wb")

            def _fail_injected(self) -> bool:
                if not outer.fail_first or self.command not in outer.fail_methods:
                    return False
                key = (self.command, self.path)
                with outer._lock:
                    left = outer._fail_left.setdefault(key, outer.fail_first)
                    if left <= 0:
                        return False
                    outer._fail_left[key] = left - 1
                self._reply(outer.fail_status, b"injected transient failure")
                return True

            def _reply(self, status: int, body: bytes = b"",
                       extra: dict | None = None) -> None:
                self._record(status)
                self.send_response(status)
                for k, v in (extra or {}).items():
                    self.send_header(k, v)
                if outer.strip_head_content_length and self.command == "HEAD":
                    self.send_header("Connection", "close")
                else:
                    self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                if self.command != "HEAD":
                    self.wfile.write(body)

            # -------------------------------------------------------- verbs
            def do_HEAD(self):
                self.do_GET()

            def do_GET(self):
                if self._fail_injected():
                    return
                path = self._local()
                if path is None:
                    return self._reply(400, b"bad path")
                if os.path.isdir(path):
                    entries = sorted(os.listdir(path))
                    rows = "".join(
                        '<a href="{0}{1}">{2}{1}</a>\n'.format(
                            urllib.parse.quote(e),
                            "/" if os.path.isdir(os.path.join(path, e)) else "",
                            html.escape(e))
                        for e in entries)
                    body = f"<html><body>\n{rows}</body></html>".encode()
                    return self._reply(
                        200, body, {"Content-Type": "text/html; charset=utf-8"})
                if not os.path.isfile(path):
                    return self._reply(404, b"not found")
                size = os.path.getsize(path)
                rng = self.headers.get("Range")
                if rng and not outer.ignore_range:
                    m = _RANGE_RE.match(rng.strip())
                    if not m or (m.group(1) == "" and m.group(2) == ""):
                        return self._reply(400, b"bad range")  # "bytes=-"
                    a, b = m.group(1), m.group(2)
                    if a == "":  # suffix: bytes=-N (clamped to the object)
                        start = max(0, size - int(b))
                        end = size - 1
                    else:
                        start = int(a)
                        end = min(size - 1, int(b)) if b else size - 1
                    if start >= size:
                        return self._reply(
                            416, b"", {"Content-Range": f"bytes */{size}"})
                    if end < start:
                        # inverted range (bytes=5-2): invalid per RFC 9110
                        return self._reply(400, b"bad range")
                    # serve O(window) bytes — ranged reads against multi-MB
                    # objects must not cost a full-file read per request
                    with open(path, "rb") as f:
                        f.seek(start)
                        window = f.read(end - start + 1)
                    hdrs = {"Content-Range": f"bytes {start}-{end}/{size}",
                            "Content-Type": "application/octet-stream"}
                    fault = outer._take_fault(self.command, self.path)
                    if fault is not None:
                        return self._send_faulted(206, window, hdrs, fault)
                    return self._reply(206, window, hdrs)
                with open(path, "rb") as f:
                    data = f.read()
                hdrs = {"Content-Type": "application/octet-stream",
                        "ETag": _etag(data)}
                fault = outer._take_fault(self.command, self.path)
                if fault is not None:
                    return self._send_faulted(200, data, hdrs, fault)
                return self._reply(200, data, hdrs)

            def do_PUT(self):
                if self._fail_injected():
                    return
                path = self._local()
                if path is None:
                    return self._reply(400, b"bad path")
                n = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(n)
                # Conditional-PUT preconditions (RFC 9110 §13): If-Match
                # must equal the current ETag; If-None-Match: * requires
                # absence. Checked under the PUT lock so two conditional
                # writers serialize — the object-store generation-match
                # guard (GCS ifGenerationMatch / S3 conditional writes).
                with outer._put_lock:
                    im = self.headers.get("If-Match")
                    inm = self.headers.get("If-None-Match")
                    if im is not None or inm is not None:
                        current = None
                        if os.path.isfile(path):
                            with open(path, "rb") as f:
                                current = _etag(f.read())
                        if inm == "*" and current is not None:
                            return self._reply(412, b"precondition failed")
                        if im is not None and im != current:
                            return self._reply(412, b"precondition failed")
                    os.makedirs(os.path.dirname(path) or outer.root_dir,
                                exist_ok=True)
                    tmp = f"{path}.__put_{threading.get_ident()}"
                    with open(tmp, "wb") as f:
                        f.write(body)
                    os.replace(tmp, path)  # atomic publish, object-PUT style
                return self._reply(201, b"", {"ETag": _etag(body)})

            def do_DELETE(self):
                if self._fail_injected():
                    return
                path = self._local()
                if path is None:
                    return self._reply(400, b"bad path")
                if os.path.isdir(path):
                    shutil.rmtree(path)
                    return self._reply(204)
                if os.path.isfile(path):
                    os.remove(path)
                    return self._reply(204)
                return self._reply(404, b"not found")

        self._server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self._server.daemon_threads = True
        self._scheme = "http"
        if tls_cert:
            # TLS termination on the same verb set: wrap the listening
            # socket so every test above can run identically over https://
            # (the client side verifies against an env-pinned CA bundle —
            # see HttpKVStore; there is no verify-off mode).
            import ssl

            ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
            ctx.load_cert_chain(tls_cert, tls_key or tls_cert)
            self._server.socket = ctx.wrap_socket(
                self._server.socket, server_side=True)
            self._scheme = "https"
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True)

    # ------------------------------------------------------------ lifecycle
    @property
    def url(self) -> str:
        return f"{self._scheme}://127.0.0.1:{self._server.server_address[1]}"

    def start(self) -> "LoopbackHttpServer":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()

    def __enter__(self) -> "LoopbackHttpServer":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()

    def clear_log(self) -> None:
        with self._lock:
            self.requests.clear()

    # ------------------------------------------------------- fault schedule
    def schedule_fault(self, kind: str, times: int = 1, after: int = 0,
                       path_substr: str | None = None) -> None:
        """Queue a deterministic byte-level fault on upcoming data GETs
        (HEADs and the injected-5xx layer are unaffected). Kinds:

          * ``truncate``            — full headers, half the body, abrupt
                                      close (truncated 206/200),
          * ``wrong_content_range`` — intact body under a Content-Range
                                      claiming a longer window,
          * ``reset``               — abortive close before any reply
                                      (mid-scan connection reset).

        ``after`` skips that many matching GETs first; ``times`` bounds how
        many requests the fault hits; ``path_substr`` scopes it to matching
        URLs. Faults are consumed in scheduling order, so a resilient
        client's RETRY of the faulted request succeeds — exactly the
        transient-fault contract cloud object stores present."""
        with self._lock:
            self._faults.append({"kind": kind, "times": times,
                                 "after": after, "path_substr": path_substr})

    def _take_fault(self, method: str, path: str) -> str | None:
        if method != "GET":
            return None
        with self._lock:
            for f in self._faults:
                if f["path_substr"] and f["path_substr"] not in path:
                    continue
                if f["after"] > 0:
                    f["after"] -= 1
                    continue
                if f["times"] > 0:
                    f["times"] -= 1
                    return f["kind"]
        return None

    def pending_faults(self) -> int:
        """Scheduled-but-unfired fault count (0 = every fault was hit)."""
        with self._lock:
            return sum(f["times"] for f in self._faults)
