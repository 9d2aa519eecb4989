from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from newsraag_crawler_spark.session import build_session

    s = build_session("tests", cpus=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"
