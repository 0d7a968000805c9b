"""Output sinks (resumable partitioned writers)."""
