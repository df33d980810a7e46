"""Driver contract for the spark-graft builder (PySpark target).

Delegates to ph_ee_nats_importer_rdbms_spark.plans.queries — the query
registry pairing each implemented operator (SURVEY.md §2) with its DuckDB
oracle SQL. The driver smoke-runs ``entry``, then compares each
``queries()[name]`` against ``oracle_sql()[name]`` at sf=0.01.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ph_ee_nats_importer_rdbms_spark.plans.queries import QUERIES  # noqa: E402
from ph_ee_nats_importer_rdbms_spark.session import tune_session  # noqa: E402

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full Zeebe import pipeline replay -> materialized
    ph_transfers over the sf0.001-derived event corpus."""
    tune_session(spark)
    fn, _ = QUERIES["zeebe_transfers"]
    return fn(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune_session(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, (fn, _) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: oracle for name, (_, oracle) in QUERIES.items() if oracle is not None
    }
