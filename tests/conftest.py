import pytest


@pytest.fixture(scope="session")
def spark():
    from riksdagen_sentences_spark.session import get_spark

    s = get_spark(parallelism=4, app_name="tests", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
