"""Sink targets — Ray-Data analogs of rook's pluggable listeners.

Rook fans one event stream out to registered listeners
(MySQLReplicationStream.notifyListeners, :161-179): a Hibernate
2nd-level/query cache evictor and a Hibernate-Search full-text-index
maintainer.  Here each target is a pipeline over the same change-event
shards; delivery is upgraded from at-most-once (rook loses the event
for a throwing listener, :167-176) to exactly-once via each target's
own watermarked lake table, with failures captured to a dead-letter
dataset instead of a warn log.
"""

from rookray.targets.invalidation import EvictionTarget, CacheInvalidationTarget
from rookray.targets.derived import ContainerSpec, DerivedIndexTarget
from rookray.targets.fanout import Fanout
from rookray.targets.introspect import container_specs, eviction_registry

__all__ = [
    "EvictionTarget",
    "CacheInvalidationTarget",
    "ContainerSpec",
    "DerivedIndexTarget",
    "Fanout",
    "eviction_registry",
    "container_specs",
]
