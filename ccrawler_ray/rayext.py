"""Thin extensions over Ray Data internals (pinned to ray 2.49.x).

``ray.data.from_arrow_refs`` launches ONE remote task per block ref
just to compute BlockMetadataWithSchema on a worker and ``ray.get``s
the round trip (read_api.py, DeveloperAPI). In the stepped crawl
regime that metadata fan-out is pure per-generation fixed cost
(~190 ms/generation measured at 8 CPUs for ~16 blocks — the largest
single driver-side line item after the fused execution itself).

The producer actors already HOLD the tables when they ``ray.put`` the
chunks, so they can compute the exact same metadata for free.
``from_arrow_refs_with_md`` builds the MaterializedDataset from
(refs, metadata) directly — identical logical plan, zero extra tasks.

Version seam: imports are pinned to the sealed image's ray 2.49.2; if
Ray changes these internals, fall back to ``ray.data.from_arrow_refs``
(``_FALLBACK`` flips on import failure).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

if TYPE_CHECKING:  # pragma: no cover
    import pyarrow as pa

_FALLBACK = False
try:
    from ray.data._internal.logical.interfaces import LogicalPlan
    from ray.data._internal.logical.operators.from_operators import FromArrow
    from ray.data._internal.plan import ExecutionPlan
    from ray.data._internal.stats import DatasetStats
    from ray.data.block import BlockExecStats, BlockMetadataWithSchema
    from ray.data.context import DataContext
    from ray.data.dataset import MaterializedDataset
except ImportError:  # pragma: no cover - future ray versions
    _FALLBACK = True


def block_metadata(table: "pa.Table"):
    """The exact metadata ``from_arrow_refs``'s remote helper computes
    (read_api.get_table_block_metadata_schema), evaluated in-process by
    whoever already holds the table."""
    if _FALLBACK:  # pragma: no cover
        return None
    stats = BlockExecStats.builder()
    return BlockMetadataWithSchema.from_block(table, stats=stats.build())


def from_arrow_refs_with_md(refs: list, metadata: list):
    """``ray.data.from_arrow_refs(refs)`` without the per-block remote
    metadata tasks: the caller supplies ``block_metadata(...)`` results
    computed where the tables were produced."""
    import ray

    if _FALLBACK or any(m is None for m in metadata):  # pragma: no cover
        return ray.data.from_arrow_refs(refs)
    execution_plan = ExecutionPlan(
        DatasetStats(metadata={"FromArrow": metadata}, parent=None),
        DataContext.get_current().copy(),
    )
    logical_plan = LogicalPlan(FromArrow(refs, metadata), execution_plan._context)
    return MaterializedDataset(execution_plan, logical_plan)
