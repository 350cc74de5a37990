import pytest

from s3_log_parser_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="pytest", cores=8, shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def transcripts(spark):
    """Shared deterministic fixture: 3,000 turns, cached."""
    from s3_log_parser_spark.sources.gen import gen_transcripts

    df = gen_transcripts(spark, rows=3000).cache()
    df.count()
    return df
