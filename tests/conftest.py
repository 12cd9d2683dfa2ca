import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    """One Ray session for the whole pytest run (driver contract)."""
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_corpus():
    """100-doc deterministic corpus table (FIXTURES.md corpus_tiny)."""
    from wse_ray.fixtures import make_corpus

    return make_corpus(100)


@pytest.fixture(scope="session")
def tiny_corpus_dir(tmp_path_factory):
    from wse_ray.fixtures import write_corpus_parquet

    d = tmp_path_factory.mktemp("corpus_tiny")
    write_corpus_parquet(str(d), 100, n_files=3)
    return str(d)
