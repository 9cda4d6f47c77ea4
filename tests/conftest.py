import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    import ray
    from ray.data import DataContext

    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def small_corpus(tmp_path_factory):
    """Deterministic synthetic code corpus (FIXTURES.md F1) — shared by
    build/search/bench-shaped tests."""
    from siem_on_amazon_opensearch_service_ray.corpus import generate_corpus

    out = str(tmp_path_factory.mktemp("corpus") / "sfxs")
    generate_corpus(out, n_docs=1200, seed=42)
    return out
