import pytest

from web_archive_downloader_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cores=16, shuffle_partitions=16)
    yield s
    s.stop()
