import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from parse_html_spark.session import get_spark

    spark = get_spark(cpus=4, app="parse_html_spark_tests")
    yield spark
    spark.stop()
