"""Shared fixtures. Ray is initialised ONCE per pytest session (only when a
test actually requests the ``ray_session`` fixture) and shut down at
teardown."""

from __future__ import annotations

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
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def small_corpus_dir(tmp_path_factory):
    """Tiny deterministic corpus shared across tests."""
    from simple_crawler_ray.corpus import CorpusSpec, ensure_corpus

    spec = CorpusSpec(n_pages=120, n_hosts=4, branch=4, seed=7)
    return ensure_corpus(spec, root=str(tmp_path_factory.mktemp("corpus")))
