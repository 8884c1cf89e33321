import pytest

from web_archive_downloader_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    # 8 cores / 8 shuffle partitions: at test data sizes the suite is
    # bound by per-task scheduling + python-worker overhead, not
    # compute — 16/16 measured ~35% slower on the same crawl tests.
    # Tests that need a specific parallelism (skew, AQE, cogroup
    # pid-pruning) set their own confs/partitioning explicitly.
    s = get_spark("tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()
