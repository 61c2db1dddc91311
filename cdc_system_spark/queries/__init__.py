"""Driver-facing query registry.

Every implemented operator from SURVEY.md §2 (plus the LLM-pipeline
surface) is registered here as a named :class:`Query` with a PySpark
implementation and, where SQL-expressible, a DuckDB oracle SQL twin.
``__spark_entry__.py`` adapts this registry to the driver contract.
"""

from cdc_system_spark.queries.base import QUERY_REGISTRY, Query, register

# importing the modules populates the registry
from cdc_system_spark.queries import cdc_queries  # noqa: E402,F401
from cdc_system_spark.queries import analytics  # noqa: E402,F401
from cdc_system_spark.queries import tpch_extra  # noqa: E402,F401
from cdc_system_spark.queries import windows  # noqa: E402,F401
from cdc_system_spark.queries import llm  # noqa: E402,F401
from cdc_system_spark.queries import multimodal  # noqa: E402,F401
from cdc_system_spark.queries import temporal  # noqa: E402,F401
from cdc_system_spark.queries import conflicts  # noqa: E402,F401
from cdc_system_spark.queries import events  # noqa: E402,F401

__all__ = ["QUERY_REGISTRY", "Query", "register"]
