import os
import shutil

import pytest

os.environ.setdefault("SPARK_DRIVER_MEMORY", "8g")


@pytest.fixture(scope="session")
def spark():
    from siem_on_amazon_opensearch_service_spark.session import get_spark

    s = get_spark("tests", cores=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def tiny_corpus_pdf():
    from siem_on_amazon_opensearch_service_spark.sources.transcripts import generate_pandas

    return generate_pandas(0.001)


@pytest.fixture(scope="session")
def tiny_index(spark, tiny_corpus_pdf, tmp_path_factory):
    """Index built over the sf0.001 corpus, shared across tests."""
    from siem_on_amazon_opensearch_service_spark.operators.build import build_index

    out = str(tmp_path_factory.mktemp("idx") / "index")
    df = spark.createDataFrame(tiny_corpus_pdf)
    stats = build_index(spark, df, out, n_shards=8, n_salts=4)
    yield out, stats
    shutil.rmtree(out, ignore_errors=True)
