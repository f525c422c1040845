"""The CdcFeed seam: the exact boundary a network replication client
implements to drive this engine's appliers.

The reference consumes replication through two network clients — the
vitess binlog stream (binlog_replica_applier.go:170-265) and pglogrepl
(pgserver/logrepl/replication.go:153-178). The wire protocols are out
of scope here (BASELINE.json), but the SEAM is not: everything
downstream of the client — buffering, flush triggers, condense, atomic
multi-table commit, exactly-once position bookkeeping — consumes only
this interface. A socket/vitess/pglogrepl client drops in by
implementing ``events_after`` (and optionally ``state_at``) and
registering a URI scheme with ``Engine.register_feed_scheme``; no
engine or applier change is needed (proved by the loopback-socket feed
in tests/test_replica_controller.py).

Contract
--------
- ``events_after(position)`` yields ``CdcEvent``s with strictly
  increasing ``position > position``, in apply order. Positions are
  opaque monotone integers (GTID/file-pos analog); re-delivery of
  already-seen positions is safe (the applier dedupes on position).
- ``state_at(position)`` optionally returns a JSON-able snapshot of
  the feed's own resume state as of that position (e.g. a Kafka
  per-partition offset vector). The applier commits it in the SAME
  atomic transaction as the data and hands it back on restart.
"""

from __future__ import annotations

import abc
from typing import Iterator

from myduckserver_spark.streaming.cdc_source import CdcEvent


class CdcFeed(abc.ABC):
    """Ordered, resumable CDC event source (see module docstring)."""

    @abc.abstractmethod
    def events_after(self, position: int) -> Iterator[CdcEvent]:
        """Yield events with position > ``position``, in order."""

    def state_at(self, position: int) -> dict | None:
        """Feed-private resume state as of ``position`` (committed
        atomically with the data), or None for stateless feeds."""
        return None


def _register_builtin_feeds() -> None:
    """Bless the in-repo feeds as CdcFeed implementations (virtual
    subclassing — they predate the ABC and must not import it)."""
    from myduckserver_spark.streaming.cdc_source import FileCdcFeed
    from myduckserver_spark.streaming.log_feed import LogFeedCdcSource

    CdcFeed.register(FileCdcFeed)
    CdcFeed.register(LogFeedCdcSource)


_register_builtin_feeds()
