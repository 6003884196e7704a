"""WebSocket push serving: the reference backend's LITERAL protocol.

The reference serves `/ws` (backend/main.py:53-63) and broadcasts each
Kafka record as a JSON text message with a `data_priority` tag
(backend/main.py:90-99). streaming/push.py covers those semantics over
SSE; this module closes the remaining protocol gap with a stdlib
RFC 6455 server -- no websocket library in the container, and none is
needed for a server->client broadcast:

- handshake: HTTP/1.1 101 with Sec-WebSocket-Accept =
  base64(sha1(Sec-WebSocket-Key + GUID))  (RFC 6455 section 4.2.2)
- data: FIN text frames (opcode 0x1), server->client frames unmasked
  (section 5.1), 7/16/64-bit payload-length encoding (section 5.2)

Backpressure/eviction mirror SSEBroadcaster exactly: bounded
drop-oldest per-client queues, idle timeout, copy-on-iterate fan-out,
and the same `/health` gauge (S14). The foreachBatch sink is the
transport-agnostic `push.sse_foreach_batch` (it only needs
`.broadcast(list[str])`), re-exported here as `ws_foreach_batch` --
including its W8-shaped cap on the per-batch driver materialization.

The broadcast loop is write-only like the reference's (`send_text` in
a loop; disconnects are discovered as write failures and the client
is dropped -- backend/main.py:65-71). Client ping/close frames are
therefore not parsed; a stalled or closed peer is reclaimed by the
write failure or the idle timeout.
"""

from __future__ import annotations

import base64
import hashlib
import json
import queue
import struct
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any

from .push import sse_foreach_batch as ws_foreach_batch  # noqa: F401

_WS_GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"


def websocket_accept_key(key: str) -> str:
    """RFC 6455 section 4.2.2 handshake digest."""
    return base64.b64encode(
        hashlib.sha1((key + _WS_GUID).encode()).digest()
    ).decode()


def text_frame(payload: bytes) -> bytes:
    """One FIN text frame, unmasked (server->client, RFC 6455 5.1/5.2)."""
    n = len(payload)
    if n < 126:
        header = struct.pack("!BB", 0x81, n)
    elif n < 1 << 16:
        header = struct.pack("!BBH", 0x81, 126, n)
    else:
        header = struct.pack("!BBQ", 0x81, 127, n)
    return header + payload


class WebSocketBroadcaster:
    """Stdlib `/ws` hub with the same client-management contract as
    SSEBroadcaster: GET /ws upgrades and streams JSON text frames,
    GET /health returns the S14 gauge, each client owns a bounded
    drop-oldest queue, and fan-out iterates a snapshot of the client
    list so disconnects never stall the loop."""

    def __init__(
        self,
        host: str = "127.0.0.1",
        port: int = 0,
        max_queue_frames: int = 256,
        client_idle_timeout: float = 60.0,
    ) -> None:
        self._clients: dict[int, queue.Queue] = {}
        self._lock = threading.Lock()
        self._next_id = 0
        self._max_queue_frames = max_queue_frames
        self._client_idle_timeout = client_idle_timeout
        self.dropped_frames = 0
        hub = self

        class Handler(BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def log_message(self, *args: Any) -> None:
                pass

            def do_GET(self) -> None:
                if self.path == "/health":
                    body = json.dumps(hub.health()).encode()
                    self.send_response(200)
                    self.send_header("Content-Type", "application/json")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                    return
                if self.path != "/ws":
                    self.send_response(404)
                    self.send_header("Content-Length", "0")
                    self.end_headers()
                    return
                key = self.headers.get("Sec-WebSocket-Key")
                upgrade = (self.headers.get("Upgrade") or "").lower()
                if not key or upgrade != "websocket":
                    self.send_response(400)
                    self.send_header("Content-Length", "0")
                    self.end_headers()
                    return
                self.send_response(101, "Switching Protocols")
                self.send_header("Upgrade", "websocket")
                self.send_header("Connection", "Upgrade")
                self.send_header("Sec-WebSocket-Accept", websocket_accept_key(key))
                self.end_headers()

                q: queue.Queue = queue.Queue(maxsize=hub._max_queue_frames)
                with hub._lock:
                    cid = hub._next_id
                    hub._next_id += 1
                    hub._clients[cid] = q
                try:
                    while True:
                        try:
                            frame = q.get(timeout=hub._client_idle_timeout)
                        except queue.Empty:
                            break  # idle past heartbeat cadence -> evict
                        if frame is None:
                            break
                        self.wfile.write(frame)
                        self.wfile.flush()
                except (BrokenPipeError, ConnectionResetError):
                    pass
                finally:
                    with hub._lock:
                        hub._clients.pop(cid, None)
                    self.close_connection = True

        self._server = ThreadingHTTPServer((host, port), Handler)
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True
        )

    def start(self) -> tuple[str, int]:
        self._thread.start()
        host, port = self._server.server_address[:2]
        return str(host), int(port)

    @property
    def n_clients(self) -> int:
        with self._lock:
            return len(self._clients)

    def health(self) -> dict[str, Any]:
        # S14 shape (backend/main.py:112-114)
        return {"status": "healthy", "connected_clients": self.n_clients}

    def broadcast(self, payloads: list[str]) -> None:
        if not payloads:
            return
        frames = b"".join(text_frame(p.encode()) for p in payloads)
        with self._lock:
            targets = list(self._clients.values())
        for q in targets:
            while True:
                try:
                    q.put_nowait(frames)
                    break
                except queue.Full:  # drop-oldest, never block the hub
                    try:
                        q.get_nowait()
                        self.dropped_frames += 1
                    except queue.Empty:
                        pass

    def heartbeat(self) -> None:
        """The keep-alive message clients drop (F7, useWebsocket.js:42-44)."""
        self.broadcast([json.dumps({"type": "heartbeat"})])

    def stop(self) -> None:
        with self._lock:
            targets = list(self._clients.values())
            self._clients.clear()
        for q in targets:
            # NON-blocking sentinel delivery: a stalled client's queue
            # is full and never drains (its handler is wedged in a
            # socket write), so a blocking put(None) deadlocks
            # shutdown -- found by the backpressure soak test. Evict
            # oldest frames until the sentinel fits, same drop-oldest
            # contract as broadcast().
            while True:
                try:
                    q.put_nowait(None)
                    break
                except queue.Full:
                    try:
                        q.get_nowait()
                    except queue.Empty:
                        pass
        self._server.shutdown()
        self._server.server_close()
