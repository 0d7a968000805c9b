"""Stateful actor pools: URL-seen shards (A1), politeness partitions (A2/A3)."""
