"""Multicast fan-out — rook's listener delivery loop, upgraded.

Rook delivers each event synchronously to every registered listener; a
throwing listener gets a warn log + optional exception-handler callback
and LOSES the event (at-most-once per failing sink,
MySQLReplicationStream.java:161-179; hook
ReplicationEventExceptionHandler.java:21-23).

Here each target applies the same immutable change shards through its
own exactly-once watermarked pipeline, so one target failing does not
lose anything: the failed target simply has not advanced its watermark
and re-presents the shards next round.  Failures are recorded to a
dead-letter log (a JSON lines file per fan-out root) instead of a warn
log — the ``ReplicationEventExceptionHandler`` analog with durable
evidence.
"""

from __future__ import annotations

import json
import os
import time
import traceback


class Fanout:
    """Apply one epoch of shards to N independent targets.

    ``targets``: dict name → object with ``.apply(shard_paths, **kw)``
    (a ``LakeTable``, a ``DerivedIndexTarget``, or anything
    duck-compatible — the listener-registry analog,
    MySQLReplicationStream.registerListener :127-151)."""

    def __init__(self, targets: dict[str, object], dead_letter_dir: str | None = None):
        self.targets = dict(targets)
        self.dead_letter_dir = dead_letter_dir

    def register(self, name: str, target: object) -> None:
        self.targets[name] = target

    def unregister(self, name: str) -> None:
        self.targets.pop(name, None)

    def unregister_by_class(self, cls: type) -> int:
        """Unregister every target that is an instance of ``cls`` —
        the ``unregisterListener(Class)`` variant
        (MySQLReplicationStream.java:140-151).  Returns count removed."""
        victims = [n for n, t in self.targets.items() if isinstance(t, cls)]
        for n in victims:
            del self.targets[n]
        return len(victims)

    def manifest(self) -> dict | None:
        """Aggregate manifest for tailer overlap pruning: the composite
        ``closed_watermark`` is the MIN over children (a shard may be
        pruned only when EVERY child has committed past it).  If any
        child lacks a manifest or a closed watermark, the aggregate is
        unknown — return no watermark so the tailer falls back to
        re-presenting all applied shards (idempotent, never stalls)."""
        if not self.targets:
            return None
        floors = []
        for t in self.targets.values():
            get_m = getattr(t, "manifest", None)
            if not callable(get_m):
                return {}
            m = get_m()
            floor = (m or {}).get("closed_watermark")
            if floor is None:
                return {}
            floors.append(floor)
        return {"closed_watermark": min(floors)}

    def apply(self, shard_paths: list[str], **kw) -> dict[str, dict]:
        results: dict[str, dict] = {}
        for name, target in self.targets.items():
            try:
                results[name] = {"ok": True, "result": target.apply(shard_paths, **kw)}
            except Exception as e:  # noqa: BLE001 — the fan-out must continue
                results[name] = {"ok": False, "error": repr(e)}
                self._dead_letter(name, shard_paths, e)
        return results

    def _dead_letter(self, name: str, shard_paths: list[str], exc: Exception) -> None:
        if not self.dead_letter_dir:
            return
        os.makedirs(self.dead_letter_dir, exist_ok=True)
        rec = {
            "target": name,
            "shards": list(shard_paths),
            "error": repr(exc),
            "traceback": traceback.format_exc(),
            "unix_time": time.time(),
        }
        path = os.path.join(self.dead_letter_dir, f"{name}.jsonl")
        with open(path, "a") as f:
            f.write(json.dumps(rec) + "\n")
