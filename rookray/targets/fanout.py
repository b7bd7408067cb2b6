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


class AtomicFanout(Fanout):
    """Fan-out with a CROSS-TARGET consistent commit point.

    Plain ``Fanout`` gives each target exactly-once delivery, but
    between two child commits a reader joining target A against target
    B sees A's new epoch next to B's old one.  rook has the same gap —
    listeners are notified sequentially (one cache evicted, the next
    not yet, MySQLReplicationStream.java:161-179) — and closes it only
    by being single-threaded and in-process.  Here the closure is a
    coordinator manifest: after every child has committed its epoch
    for a round, one atomic JSON swap records ``{target → epoch}``,
    and ``consistent_read`` serves every target AS OF its recorded
    epoch (the children keep epoch history, so the snapshot stays
    readable until their GC horizon).

    Crash anywhere before the swap ⇒ readers keep the LAST consistent
    set (children that already committed are simply ahead, invisible
    to consistent readers); re-running ``apply`` is free — children
    skip re-presented shards by watermark — and completes the swap.
    A child FAILURE in a round leaves the coordinator manifest
    untouched (no torn set is ever published); the dead-letter log
    records the failure as usual.
    """

    def __init__(self, targets: dict[str, object], root: str,
                 dead_letter_dir: str | None = None):
        super().__init__(targets, dead_letter_dir)
        self.root = root
        os.makedirs(root, exist_ok=True)

    # ---------------------------------------------------- coordinator

    def _coord_path(self) -> str:
        return os.path.join(self.root, "atomic.json")

    def consistent_epochs(self) -> dict | None:
        """The last atomically-published ``{target: epoch}`` set."""
        p = self._coord_path()
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def apply(self, shard_paths: list[str], **kw) -> dict[str, dict]:
        results = super().apply(shard_paths, **kw)
        if not all(r["ok"] for r in results.values()):
            return results  # no torn set: coordinator stays put
        epochs = {}
        for name, target in self.targets.items():
            m = target.manifest() or {}
            epochs[name] = int(m["epoch"])
        from rookray import sink
        prev = self.consistent_epochs() or {"seq": -1}
        sink.atomic_write_json(
            {"seq": int(prev["seq"]) + 1, "epochs": epochs},
            self._coord_path())
        return results

    def consistent_read(self, name: str):
        """The named target's state AS OF the last consistent commit —
        joins across targets built from ``consistent_read`` calls are
        cross-target consistent even while a new round is mid-flight."""
        coord = self.consistent_epochs()
        if coord is None:
            raise ValueError(f"no consistent commit at {self.root} yet")
        target = self.targets[name]
        epoch = int(coord["epochs"][name])
        cur = (target.manifest() or {}).get("epoch")
        if cur == epoch:
            return target.read()
        return target.read(as_of=epoch)


def replay_dead_letters(fanout: Fanout) -> dict:
    """Re-apply every dead-lettered epoch to its (presumably healed)
    target — applies are idempotent (watermark-skip), so replaying a
    shard set that partially succeeded is free.  Entries that now
    succeed are dropped from the log; entries that fail again stay
    (with a fresh record appended by the normal path).  Returns
    per-target counts.  The operational closer of the dead-letter
    story: rook's exception handler observes the loss
    (ReplicationEventExceptionHandler.java:21-23) but nothing can
    replay it — here the immutable shard files make replay a no-risk
    retry."""
    if not fanout.dead_letter_dir or not os.path.isdir(fanout.dead_letter_dir):
        return {}
    out: dict[str, dict] = {}
    for name in sorted(os.listdir(fanout.dead_letter_dir)):
        if not name.endswith(".jsonl"):
            continue
        tname = name[:-6]
        target = fanout.targets.get(tname)
        path = os.path.join(fanout.dead_letter_dir, name)
        with open(path) as f:
            records = [json.loads(ln) for ln in f if ln.strip()]
        ok = failed = 0
        keep = []
        for rec in records:
            if target is None:
                keep.append(rec)
                continue
            try:
                target.apply(rec["shards"])
                ok += 1
            except Exception as e:  # noqa: BLE001 — keep the record
                rec["last_retry_error"] = repr(e)
                keep.append(rec)
                failed += 1
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            for rec in keep:
                f.write(json.dumps(rec) + "\n")
        os.replace(tmp, path)
        if not keep:
            os.unlink(path)
        out[tname] = {"replayed": ok, "still_failing": failed,
                      "unregistered": target is None and len(keep) or 0}
    return out
