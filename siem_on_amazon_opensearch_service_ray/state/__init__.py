"""Stateful query-side components (shard readers, search actors)."""
