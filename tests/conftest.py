import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from accelerated_intelligent_document_processing_on_aws_spark.sources.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="idp-spark-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def transcripts_path(tmp_path_factory):
    from accelerated_intelligent_document_processing_on_aws_spark.fixtures import (
        write_transcripts_parquet,
    )

    p = tmp_path_factory.mktemp("corpus") / "transcripts.parquet"
    write_transcripts_parquet(str(p), n_convs=200, seed=42)
    return str(p)


SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
