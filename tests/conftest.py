from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from linkkchecker_net_spark.session import build_session

    s = build_session(app_name="lnks-tests", cores=4, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def golden_fixtures():
    from linkkchecker_net_spark.fixtures import webgen

    return webgen.make_fixtures("golden", seed=42)
