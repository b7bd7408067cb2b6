"""Target-registry introspection from a committed lake schema.

rook builds its eviction / index column maps from LIVE database
metadata — ``SynchronizationContext`` walks JDBC table metadata and
Hibernate mappings at attach time
(rook-target-hibernate4-cache/.../SynchronizationContext.java:89-113)
so nobody hand-writes column lists.  rookray's catalog analog is the
lake manifest's committed payload schema
(``LakeTable.payload_schema()``); this module derives the same
registries from it:

* ``eviction_registry`` — one ENTITY ``EvictionTarget`` per table
  keyed by the payload's merge key (first payload field, the engine's
  key contract), plus one COLLECTION target per list-typed payload
  column (the collection-role analog: each ``@OneToMany`` list
  property is its own cache region, EvictionTarget.java:21-46).  The
  table itself is the query space.
* ``container_specs`` — one ``ContainerSpec`` per non-key string
  column (the ``@ContainedIn`` edge analog: a scalar attribute like
  ``source`` names the container a document rolls up into,
  rook-target-hibernate4-fulltextindex/.../Reference.java:28-61).

Both are pure schema walks: zero hand-written column maps, and they
track additive schema evolution automatically (a later epoch's new
list column becomes a new collection target on the next attach).
"""

from __future__ import annotations

import pyarrow as pa

from rookray.targets.derived import ContainerSpec
from rookray.targets.invalidation import EvictionTarget

__all__ = ["eviction_registry", "container_specs"]


def eviction_registry(lake, db: str = "rook",
                      table: str | None = None,
                      ) -> dict[str, list[EvictionTarget]]:
    """``{qualified_table: [EvictionTarget, ...]}`` introspected from
    the lake's committed payload schema — the attach-time registry
    builder.  ``table`` defaults to the lake's configured CDC table."""
    schema = lake.payload_schema()
    tbl = table or lake.config.table
    key = schema.names[0]  # the merge key, by the payload contract
    targets = [EvictionTarget(name=tbl, key_fields=(key,),
                              is_collection=False, query_spaces=(tbl,))]
    for f in schema:
        if pa.types.is_list(f.type) or pa.types.is_large_list(f.type):
            targets.append(EvictionTarget(
                name=f"{tbl}.{f.name}", key_fields=(key,),
                is_collection=True, query_spaces=(tbl,)))
    return {f"{db}.{tbl}": targets}


def container_specs(lake) -> list[ContainerSpec]:
    """Container rollup specs introspected from the committed payload
    schema: every non-key string column is a containment edge (the
    document rolls up into the container that column names)."""
    schema = lake.payload_schema()
    key = schema.names[0]
    return [ContainerSpec(name=f"by_{f.name}", child="primary",
                          key_col=f.name)
            for f in schema
            if f.name != key and (pa.types.is_string(f.type)
                                  or pa.types.is_large_string(f.type))]
