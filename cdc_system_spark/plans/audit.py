"""Physical-plan auditing: make the 100 TB posture checkable in CI.

The reference delegates all query planning to SQLite and never inspects
a plan (SURVEY §4.1); on Spark the plan IS the performance contract, so
this module turns ``df.explain("formatted")`` output into a feature
dict that tests assert on:

* no ``CartesianProduct`` / ``BroadcastNestedLoopJoin`` anywhere — the
  two shapes that mean "this query re-reads one side per row and dies at
  scale";
* dimension joins resolve to ``BroadcastHashJoin`` (no shuffle of the
  fact side for small dims);
* filters reach the parquet scan (``PushedFilters``), projections prune
  columns (``ReadSchema``);
* hot paths stay inside ``WholeStageCodegen`` spans.

Parsing the explain text (public API, stable across 3.x/4.x) rather than
walking private JVM plan objects keeps this pure-Python and
version-tolerant.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame

#: Operators that are always wrong at scale.
FORBIDDEN_NODES = ("CartesianProduct", "BroadcastNestedLoopJoin")


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The text of ``df.explain(mode)`` (which only prints to stdout)."""
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def plan_features(df: DataFrame, with_codegen: bool = False) -> dict:
    """Counts of the plan shapes that matter for scale review.

    ``with_codegen`` additionally compiles the plan in "codegen" explain
    mode to count WholeStageCodegen subtrees — under AQE those markers
    only exist post-compilation, not in the formatted pre-plan.
    """
    text = explain_str(df, "formatted")

    def n(pat: str) -> int:
        return len(re.findall(pat, text))

    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", text)
    codegen = 0
    if with_codegen:
        # physical planning is lazy, so toggling AQE off just for this
        # explain yields the concrete (non-adaptive) plan whose codegen
        # subtrees are countable pre-execution
        spark = df.sparkSession
        prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
        try:
            spark.conf.set("spark.sql.adaptive.enabled", "false")
            # select("*") forces a fresh QueryExecution — the original df
            # memoizes its physical plan on first explain, which would
            # ignore the AQE toggle
            m = re.search(
                r"Found (\d+) WholeStageCodegen",
                explain_str(df.select("*"), "codegen"),
            )
            codegen = int(m.group(1)) if m else 0
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", prev)
    return {
        "exchanges": n(r"\bExchange\b"),
        "broadcast_hash_joins": n(r"\bBroadcastHashJoin\b"),
        "sort_merge_joins": n(r"\bSortMergeJoin\b"),
        "shuffled_hash_joins": n(r"\bShuffledHashJoin\b"),
        "nested_loop_joins": n(r"\bBroadcastNestedLoopJoin\b"),
        "cartesian_products": n(r"\bCartesianProduct\b"),
        "codegen_spans": codegen,
        # ReadSchema appears exactly once per scan (details section);
        # "Scan parquet" matches twice (tree + details)
        "scans": n(r"ReadSchema:"),
        "scans_with_pushed_filters": sum(1 for p in pushed if p.strip()),
        "python_stages": n(r"\b(ArrowEvalPython|BatchEvalPython|MapInPandas|FlatMapGroupsInPandas)\b"),
        "text": text,
    }


def audit_plan(df: DataFrame, allow: tuple[str, ...] = ()) -> list[str]:
    """Scale-hazard findings for a plan (empty list = clean).

    ``allow`` suppresses named findings for queries where the shape is
    intentional (e.g. a deliberate tiny cross join).
    """
    text = explain_str(df, "formatted")
    findings = [
        f"forbidden node {node} in plan"
        for node in FORBIDDEN_NODES
        if node not in allow and re.search(rf"\b{node}\b", text)
    ]
    return findings
