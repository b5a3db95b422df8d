"""Query catalog. Importing this package registers every query module.

The driver contract (__spark_entry__.py) exposes ``queries()`` /
``oracle_sql()`` straight from this registry.
"""

from mapreduce_implementation_spark.plans.registry import (
    Query,
    all_queries,
    headline_queries,
    oracle_sql,
    queries,
    register,
)

# Import for side effect: each module registers its queries.
from mapreduce_implementation_spark.plans import dedup_queries  # noqa: E402,F401
from mapreduce_implementation_spark.plans import events_queries  # noqa: E402,F401
from mapreduce_implementation_spark.plans import multimodal_queries  # noqa: E402,F401
from mapreduce_implementation_spark.plans import relational_queries  # noqa: E402,F401
from mapreduce_implementation_spark.plans import similarity_queries  # noqa: E402,F401
from mapreduce_implementation_spark.plans import streaming_queries  # noqa: E402,F401
from mapreduce_implementation_spark.plans import text_queries  # noqa: E402,F401
from mapreduce_implementation_spark.plans import textstats_queries  # noqa: E402,F401

__all__ = [
    "Query",
    "register",
    "queries",
    "oracle_sql",
    "all_queries",
    "headline_queries",
]
