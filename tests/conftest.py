import pytest

from wordscape_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    s = build_session(
        app_name="wordscape-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.driver.memory": "4g"},
    )
    yield s
    s.stop()
