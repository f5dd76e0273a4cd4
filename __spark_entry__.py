"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in data_pipeline_and_visualization_dashboard_spark/;
this module only aggregates the per-module query/oracle registries.
"""

from __future__ import annotations

import os
import sys

# resolve the package regardless of the harness's CWD
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from data_pipeline_and_visualization_dashboard_spark import charts as _charts
from data_pipeline_and_visualization_dashboard_spark import queries as _q
from data_pipeline_and_visualization_dashboard_spark import queries_ext as _qx
from data_pipeline_and_visualization_dashboard_spark.extras import dedup as _dedup
from data_pipeline_and_visualization_dashboard_spark.extras import (
    multimodal as _mm,
)
from data_pipeline_and_visualization_dashboard_spark.extras import (
    similarity as _sim,
)
from data_pipeline_and_visualization_dashboard_spark.extras import (
    sketches as _sk,
)
from data_pipeline_and_visualization_dashboard_spark.extras import text as _text


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (q1_top_nations: join → group-count → top-k) on
    /root/testdata/sf0.001; driver checks rows>0."""
    return _q.q1_top_nations(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    registry: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    registry.update(_q.QUERIES)
    registry.update(_qx.QUERIES)
    registry.update(_charts.QUERIES)
    registry.update(_dedup.QUERIES)
    registry.update(_text.QUERIES)
    registry.update(_sim.QUERIES)
    registry.update(_sk.QUERIES)
    registry.update(_mm.QUERIES)
    return registry


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (omitted for
    non-SQL-expressible ops → driver records a rows-only check)."""
    oracles: dict[str, str] = {}
    oracles.update(_q.ORACLE_SQL)
    oracles.update(_qx.ORACLE_SQL)
    oracles.update(_charts.ORACLE_SQL)
    oracles.update(_dedup.ORACLE_SQL)
    oracles.update(_text.ORACLE_SQL)
    oracles.update(_sim.ORACLE_SQL)
    oracles.update(_sk.ORACLE_SQL)
    oracles.update(_mm.ORACLE_SQL)
    return oracles
