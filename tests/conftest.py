"""Shared Spark fixtures for the test suite (session-scoped: one JVM)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "src"))


@pytest.fixture(scope="session")
def spark():
    from webextract.session import get_spark

    s = get_spark(app="webextract-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus_dir(tmp_path_factory):
    """A 600-doc corpus on disk (web_pages.parquet + truth.parquet)."""
    from webextract.corpus import write_corpus_parquet

    d = tmp_path_factory.mktemp("corpus")
    write_corpus_parquet(str(d), 600, seed=42)
    return str(d)
