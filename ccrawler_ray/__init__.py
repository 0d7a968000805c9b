"""ccrawler_ray — a Ray-Data-native crawl/data-processing engine.

A brand-new engine (NOT a port) with the query/data-processing
capabilities of the reference crawler ``qwang2505/ccrawler``: a
streaming URL frontier over tables of interleaved text+media documents,
expressed as ``ray.data.Dataset`` pipelines of ``map_batches`` over
zero-copy Arrow batches, with stateful stages (URL-seen membership,
per-host politeness) as Ray actor pools.

Reference provenance: the reference mount ``/root/reference`` is EMPTY
(verified — see SURVEY.md §0.1); semantics are pinned to BASELINE.json
(driver-extracted ground truth about the reference's components) and to
the executable serial oracle ``tests/refsim.py``.

Layout:
  spec.py       frozen pure functions + Arrow schemas (shared with refsim)
  config.py     crawl configuration
  storage.py    dataset-directory storage seam (Parquet now, Lance later)
  state/        stateful actor pools: seen-shards, politeness partitions
  stages/       stateless map_batches stages: canonicalize, fetch, extract
  pipelines/    the generation-loop crawl driver + checkpoints
  functions/    large-scale training-data ops: dedup, similarity, text, multimodal
  relational.py relational operator library over parquet tables
"""

__version__ = "0.1.0"

import os as _os

# Every Ray worker imports this package before polars; without a cap,
# polars sizes its thread pool to ALL machine cores in EVERY worker
# process (32 workers x 32 threads), collapsing under oversubscription.
# Batch-level parallelism comes from Ray; keep per-worker pools tiny.
_os.environ.setdefault("POLARS_MAX_THREADS", "2")

import logging as _logging


class _SchemaHashNoiseFilter(_logging.Filter):
    """Drop Ray Data's cosmetic 'Failed to hash the schemas (for
    deduplication)' warning: pa.Schema.__hash__ raises on any schema
    carrying metadata (e.g. parquet pandas metadata) and
    PandasBlockSchema is never hashable, so Ray's unify_schemas logs
    this on EVERY multi-block concat — it then proceeds down the
    correct (unify) path, so the message carries no signal."""

    def filter(self, record: _logging.LogRecord) -> bool:  # pragma: no cover
        return "Failed to hash the schemas" not in record.getMessage()


_logging.getLogger("ray.data._internal.arrow_ops.transform_pyarrow").addFilter(
    _SchemaHashNoiseFilter()
)


class _EmptyPartitionSchemaNoiseFilter(_logging.Filter):
    """Drop the executor's 'RefBundle with a different schema' warning
    ONLY for the columnless-empty case: groupby().map_groups sorts into
    hash partitions and emits empty partitions as zero-column blocks
    WITHOUT calling the UDF, so salted-shuffle stages log this on every
    empty salt partition. A genuinely different non-empty schema still
    warns."""

    def filter(self, record: _logging.LogRecord) -> bool:  # pragma: no cover
        m = record.getMessage()
        return not (
            "RefBundle with a different schema" in m
            and ("new schema: PandasBlockSchema(names=[]" in m
                 or "new schema: None" in m
                 # empty Arrow schema str()s to "" → "new schema: ."
                 or "new schema: . This may" in m)
        )


_logging.getLogger(
    "ray.data._internal.execution.streaming_executor_state"
).addFilter(_EmptyPartitionSchemaNoiseFilter())
