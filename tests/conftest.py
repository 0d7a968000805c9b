import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            # 8 cpus: the 90-query conformance sweep is fixed-overhead
            # bound (one Dataset execution per query); results are
            # partition-count-independent by design, so more cpus only
            # change wall-clock
            num_cpus=8,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_corpus():
    from tests.gen_corpus import generate_corpus

    return generate_corpus(num_hosts=5, total_pages=50)


@pytest.fixture(scope="session")
def small_corpus():
    from tests.gen_corpus import generate_corpus

    return generate_corpus(num_hosts=50, total_pages=2_000)
