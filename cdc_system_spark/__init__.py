"""cdc_system_spark — a PySpark-native CDC + analytics engine.

From-scratch re-expression of the capabilities of ``arya23923/cdc-system``
(reference: /root/reference/cdc_system.py) on top of the Spark DataFrame API.

The reference is a trigger-based CDC/replication system over SQLite; this
package provides the same conceptual surface — capture, change-log queries,
replication, monitoring — as declarative Spark programs, plus a full
analytics query layer and large-scale training-data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing).

Design stance (SURVEY.md §7.0): no SQL string building, no row loops, no
Python UDFs where a builtin exists. Everything is a Catalyst-optimizable
DataFrame program designed for 100 TB / 1000-executor scale, tested on
local mode.
"""

from cdc_system_spark.config import CDCConfig, DatabaseConfig
from cdc_system_spark.model import AUDIT_SCHEMA, ChangeOp
from cdc_system_spark.session import get_spark

__all__ = [
    "AUDIT_SCHEMA",
    "CDCConfig",
    "ChangeOp",
    "DatabaseConfig",
    "get_spark",
]

__version__ = "0.1.0"
