import pytest

from searchengine_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("searchengine-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def corpus_small(spark):
    """300-doc deterministic corpus as a cached DataFrame."""
    from searchengine_spark.sources.corpus import corpus_df

    df = corpus_df(spark, 300).cache()
    df.count()
    return df
