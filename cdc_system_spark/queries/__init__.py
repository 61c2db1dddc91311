"""Driver-facing query registry.

Every implemented operator from SURVEY.md §2 (plus the LLM-pipeline
surface) is registered here as a named :class:`Query` with a PySpark
implementation and, where SQL-expressible, a DuckDB oracle SQL twin.
``__spark_entry__.py`` adapts this registry to the driver contract.
"""

from cdc_system_spark.queries.base import QUERY_REGISTRY, Query, register

# Importing the modules populates the registry. ORDER MATTERS: the
# driver's oracle gate checks the first 50 registry entries. Round-3
# rotation: the windows / analytics / tpch_extra surface (43 queries —
# driver-green in r1 except the 4 round-2 tpch_extra additions, which
# have never had a driver CORRECTNESS row) leads, then the 7 brand-new
# round-3 curation queries — exactly 50 oracle-backed slots. The
# temporal / conflicts / events / LLM-pipeline / CDC-core / multimodal
# surface (driver-green in BOTH r1 and r2) trails, and every rows-only
# query (no oracle) sits after slot 50 so no strong-check slot is
# wasted. All queries remain locally verified each round via
# tools/verify_local.py (report committed as VERIFY_LOCAL_r{N}.txt).
# tests/test_plans.py pins this composition.
from cdc_system_spark.queries import windows  # noqa: E402,F401  (7)
from cdc_system_spark.queries import analytics  # noqa: E402,F401  (21)
from cdc_system_spark.queries import tpch_extra  # noqa: E402,F401  (15)
from cdc_system_spark.queries import curation  # noqa: E402,F401  (10, new in r3; first 7 in-window)
from cdc_system_spark.queries import temporal  # noqa: E402,F401  (2)
from cdc_system_spark.queries import conflicts  # noqa: E402,F401  (3)
from cdc_system_spark.queries import events  # noqa: E402,F401  (4)
from cdc_system_spark.queries import cdc_queries  # noqa: E402,F401  (11)
from cdc_system_spark.queries import llm  # noqa: E402,F401  (28, all oracle-backed)
from cdc_system_spark.queries import multimodal  # noqa: E402,F401  (5)
from cdc_system_spark.queries import llm_rowsonly  # noqa: E402,F401  (3, no oracle)

__all__ = ["QUERY_REGISTRY", "Query", "register"]
