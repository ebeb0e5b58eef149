"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship entity-resolution query on
/root/testdata/sf0.001; ``queries()`` / ``oracle_sql()`` expose one
operator per SURVEY.md §2 item, implemented in
name_matching_spark/contract*.py (Spark side calls the real package
operators; oracles are dialect-portable DuckDB SQL over the same tables).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: company-name corpus from sf0.001 → interleaved-span
    documents → extract → normalize → block → score → threshold-accept →
    large-star/small-star CC → (name, cluster, group_name)."""
    from name_matching_spark.contract import flagship

    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from name_matching_spark.contract import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    from name_matching_spark.contract import all_oracles

    return all_oracles()
