"""Push-serving fan-out: the reference backend's Kafka->WebSocket
broadcast (backend/main.py:65-106) as a foreachBatch sink.

Transport is Server-Sent Events over plain HTTP (stdlib only -- no
websocket library in this container): the reference's broadcast is
strictly server->client push, which SSE covers one-for-one, including
the copy-on-iterate fan-out that drops broken sockets
(backend/main.py:65-71), the heartbeat frames the frontend filters
out (F7, useWebsocket.js:42-44), and the S14 health shape
{status, connected_clients} (backend/main.py:112-114).

Scale note: this is the LAST hop -- everything upstream is Spark; the
per-batch collect() ships only the routed/alert serving stream (the
reference ships every record to every browser; our gold views are
bounded by construction, e.g. W8's 2000-point cap) AND is itself
capped at the W8 retention size (sse_foreach_batch.max_rows_per_batch
-- a catch-up batch after downtime would otherwise be an unbounded
driver materialization). Per-client queues are bounded drop-oldest,
so one stalled browser can't hold the hub's memory. A production
deployment would put N broadcaster replicas behind a balancer and
feed them from the routed Kafka topics; the foreachBatch shape is
identical.
"""

from __future__ import annotations

import json
import queue
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class SSEBroadcaster:
    """Stdlib server-push hub: GET /events streams `data: <json>`
    frames to every connected client; GET /health returns the S14
    gauge. Each client owns a queue; `broadcast` enqueues to a
    snapshot of the client list so disconnects during fan-out never
    stall the loop (the reference's copy-on-iterate)."""

    def __init__(
        self,
        host: str = "127.0.0.1",
        port: int = 0,
        max_queue_frames: int = 256,
        client_idle_timeout: float = 60.0,
    ) -> None:
        # Bounded per-client queues with drop-oldest: a stalled client
        # (blocked wfile.write) can hold at most max_queue_frames of
        # backlog -- newer frames evict the oldest (a live dashboard
        # wants the newest state, same reason W8 keeps the newest
        # 2000). dropped_frames counts evictions for observability.
        # client_idle_timeout evicts a client whose queue stays empty
        # that long -- with pipeline heartbeats flowing, an empty queue
        # means the hub stopped serving this client.
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
                if self.path != "/events":
                    self.send_response(404)
                    self.send_header("Content-Length", "0")
                    self.end_headers()
                    return
                q: queue.Queue = queue.Queue(maxsize=hub._max_queue_frames)
                with hub._lock:
                    cid = hub._next_id
                    hub._next_id += 1
                    hub._clients[cid] = q
                try:
                    self.send_response(200)
                    self.send_header("Content-Type", "text/event-stream")
                    self.send_header("Cache-Control", "no-cache")
                    self.send_header("Connection", "close")
                    self.end_headers()
                    while True:
                        try:
                            frame = q.get(timeout=hub._client_idle_timeout)
                        except queue.Empty:
                            break  # idle past the heartbeat cadence -> evict
                        if frame is None:
                            break
                        self.wfile.write(frame)
                        self.wfile.flush()
                except (BrokenPipeError, ConnectionResetError):
                    pass
                finally:
                    with hub._lock:
                        hub._clients.pop(cid, None)

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
        frames = b"".join(f"data: {p}\n\n".encode() for p in payloads)
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
        """The keep-alive frame clients drop (F7)."""
        self.broadcast([json.dumps({"type": "heartbeat"})])

    def stop(self) -> None:
        with self._lock:
            targets = list(self._clients.values())
            self._clients.clear()
        for q in targets:
            # non-blocking sentinel (drop-oldest to make room): a
            # stalled client's full queue would deadlock a blocking
            # put -- same fix as WebSocketBroadcaster.stop, found by
            # the WS backpressure soak test
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


def sse_foreach_batch(
    broadcaster: SSEBroadcaster,
    tag_priority: bool = True,
    max_rows_per_batch: int = 2000,
):
    """S12 sink: each micro-batch of the serving stream is serialized
    to one JSON object per record (`data_priority` tagged like
    backend/main.py:92-97) and fanned out to every connected client.

    The driver-side materialization is CAPPED at max_rows_per_batch
    (default = W8's 2000-point retention): a steady-state trigger
    batch is far smaller, but a catch-up batch after downtime is
    unbounded, and an unbounded collect() is a driver OOM. The cap
    keeps the NEWEST rows by event time (TakeOrderedAndProject --
    per-partition heaps, no global sort), matching what a live
    dashboard can display anyway; older catch-up rows are superseded
    state, same semantics as recent_points. Pair with
    maxOffsetsPerTrigger / maxFilesPerTrigger on the source to bound
    the batch before it reaches the sink. Pass None to disable.
    """
    from .serving import priority_tag

    def fn(batch: DataFrame, epoch_id: int) -> None:
        df = batch
        if tag_priority and "critical" in batch.columns:
            df = priority_tag(batch)
        if max_rows_per_batch is not None:
            order = [
                F.col(c).desc()
                for c in ("timestamp", "event_id")
                if c in df.columns
            ]
            if order:
                df = df.orderBy(*order).limit(max_rows_per_batch)
            else:
                df = df.limit(max_rows_per_batch)
        rows = df.select(
            F.to_json(F.struct(*df.columns)).alias("j")
        ).collect()
        broadcaster.broadcast([r["j"] for r in rows])

    return fn
