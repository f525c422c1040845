"""Productized socket CdcFeed: a network replication client for the
``tcp://host:port`` SOURCE_HOST scheme, with reconnect/backoff and
position-based resume.

This is the production shape of the loopback feed that proved the
CdcFeed seam (tests/test_replica_controller.py): the reference's
analogous components are the vitess binlog client
(binlogreplication/binlog_replica_applier.go:170-265, reconnect loop
at :208) and pglogrepl (pgserver/logrepl/replication.go:153-178).
Everything downstream — buffering, flush triggers, condense, atomic
multi-table commit, exactly-once position bookkeeping — consumes only
the CdcFeed contract (streaming/feed.py).

Wire protocol (line-oriented, JSONL — the loopback server's):
    client → server:  ``AFTER <position>\\n``
    server → client:  one JSON object per line, each a CdcEvent dict
                      with strictly increasing ``position``, then EOF.

Resume/exactly-once: the feed tracks the last position it YIELDED and
re-requests ``AFTER last`` after a reconnect, so a mid-stream drop
never skips or replays an event to the applier; the applier's
position bookkeeping (committed atomically with the data) makes even
a full redelivery safe.
"""

from __future__ import annotations

import json
import socket
import time
from typing import Iterator

from myduckserver_spark.streaming.cdc_source import CdcEvent
from myduckserver_spark.streaming.feed import CdcFeed


class SocketCdcFeed(CdcFeed):
    """CdcFeed over a TCP socket (``tcp://host:port``)."""

    def __init__(self, uri: str, engine=None, *,
                 connect_timeout: float = 10.0,
                 max_retries: int = 5,
                 backoff_base: float = 0.05,
                 backoff_cap: float = 2.0):
        rest = uri.split("://", 1)[1] if "://" in uri else uri
        host, _, port = rest.rpartition(":")
        if not host or not port.isdigit():
            raise ValueError(
                f"SOURCE_HOST {uri!r}: expected tcp://host:port"
            )
        self.addr = (host, int(port))
        self.connect_timeout = connect_timeout
        self.max_retries = max_retries
        self.backoff_base = backoff_base
        self.backoff_cap = backoff_cap

    # -- internals -----------------------------------------------------

    def _stream_once(self, position: int) -> Iterator[dict]:
        """One connection attempt: request AFTER position, yield parsed
        event dicts INCREMENTALLY (a mid-stream drop keeps everything
        already yielded — the caller resumes from its last position)."""
        with socket.create_connection(
                self.addr, timeout=self.connect_timeout) as conn:
            conn.sendall(f"AFTER {position}\n".encode())
            buf = b""
            while True:
                chunk = conn.recv(65536)
                if not chunk:
                    break
                buf += chunk
                while b"\n" in buf:
                    line, buf = buf.split(b"\n", 1)
                    if line.strip():
                        yield json.loads(line)
            if buf.strip():  # server closed without trailing newline
                yield json.loads(buf)

    # -- CdcFeed contract ----------------------------------------------

    def events_after(self, position: int) -> Iterator[CdcEvent]:
        """Yield events with position > ``position``; reconnect with
        exponential backoff on connection failures, resuming from the
        last yielded position. Raises ConnectionError after
        ``max_retries`` consecutive failures WITHOUT progress (a
        retry that advances the position resets the counter)."""
        last = position
        failures = 0
        while True:
            progressed = False
            try:
                for d in self._stream_once(last):
                    pos = int(d["position"])
                    if pos <= last:
                        continue  # redelivery across reconnects: skip
                    yield CdcEvent(
                        position=pos, action=d["action"], row=d["row"],
                        txn_group=d.get("txn_group", "g0"),
                        txn_seq=d.get("txn_seq", 0),
                        txn_stmt=d.get("txn_stmt", 0),
                        table=d.get("table"),
                    )
                    last = pos
                    progressed = True
                return  # clean EOF: batch complete
            except (OSError, json.JSONDecodeError) as e:
                failures = 0 if progressed else failures + 1
                if failures >= self.max_retries:
                    raise ConnectionError(
                        f"CDC source {self.addr[0]}:{self.addr[1]} "
                        f"unreachable after {self.max_retries} "
                        f"attempts (last error: {e}); replica state "
                        f"is consistent — retry START REPLICA / "
                        "replica_poll when the source is back"
                    ) from e
                time.sleep(min(
                    self.backoff_cap,
                    self.backoff_base * (2 ** failures),
                ))
