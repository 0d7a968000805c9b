"""§2.10 — user-extension surface: the Stage protocol.

The reference exposes a pipeline-of-handlers API (handler classes with
a ``process(message)`` method registered in config). Our equivalent: a
``Stage`` — (name, fn_or_actor_cls, kind) — inserted into the crawl's
docs_out path. ``batch_map`` stages are plain map_batches callables;
``actor_pool`` stages are callable classes run with a pool. Custom
stages compose after extract, before the analysis/write steps.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Literal


@dataclasses.dataclass(frozen=True)
class Stage:
    name: str
    fn: Callable | type
    kind: Literal["batch_map", "actor_pool"] = "batch_map"
    batch_size: int = 4096
    concurrency: int | None = None
    batch_format: str = "pyarrow"
    num_cpus: float = 1.0
    fn_constructor_args: tuple = ()

    def apply(self, ds) -> Any:
        if self.kind == "actor_pool":
            return ds.map_batches(
                self.fn,
                batch_format=self.batch_format,
                batch_size=self.batch_size,
                concurrency=self.concurrency or 2,
                num_cpus=self.num_cpus,
                fn_constructor_args=self.fn_constructor_args,
            )
        return ds.map_batches(
            self.fn, batch_format=self.batch_format, batch_size=self.batch_size
        )


def apply_stages(ds, stages: list[Stage]):
    for st in stages:
        ds = st.apply(ds)
    return ds
