"""Unresolved-expression introspection helpers.

Spark 4 classic Columns wrap a ColumnNode, not a catalyst Expression;
``referenced_columns`` converts one to the (still unresolved)
expression tree via the session's own converter and walks it for
UnresolvedAttribute leaves — no analysis runs, so nothing is raised
or logged. Shared by tx_lake's delete-condition pre-check and the
decontamination report's predicate-pushdown decision.
"""

from __future__ import annotations

from pyspark.sql import Column, SparkSession


def referenced_columns(condition: Column) -> set[str] | None:
    """Column names a still-UNRESOLVED Column expression references
    (UnresolvedAttribute leaves of its py4j expression tree). Returns
    None when the walk cannot be trusted (star expansion, walker
    failure) — callers must then treat the reference set as
    unknown."""
    try:
        jvm = SparkSession.getActiveSession()._jvm
        conv = getattr(
            getattr(
                jvm.org.apache.spark.sql.classic,
                "ColumnNodeToExpressionConverter$",
            ),
            "MODULE$",
        )
        stack = [conv.apply(condition._jc.node())]
        names: set[str] = set()
        while stack:
            e = stack.pop()
            cls = e.getClass().getName()
            if cls.endswith(".UnresolvedStar"):
                return None
            if cls.endswith("analysis.UnresolvedAttribute"):
                names.add(e.name())
                continue
            ch = e.children()
            for i in range(ch.size()):
                stack.append(ch.apply(i))
        return names
    except Exception:
        return None
