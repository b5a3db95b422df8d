"""mapreduce_implementation_spark — a PySpark-native analytics engine.

A from-scratch, DataFrame-first rebuild of the *capabilities* of the
reference MapReduce framework (xxxandreaa/MapReduce_Implementation — a
C++/MPI/pthreads MapReduce engine, see /root/reference/hw4.cc:1-42), plus
the LLM-data-pipeline operator set (dedup, similarity search, text
analysis, multimodal columns) designed for 100 TB scale.

Design stance (SURVEY.md §7): declare logical plans with the DataFrame /
SQL API and let Catalyst + Tungsten pick physical strategy. The
reference's scheduler / shuffle / thread-pool machinery is subsumed by
Spark and deliberately NOT rebuilt (SURVEY.md §3-§4).

Layout:
    session        — SparkSession builder with scale-sane defaults
    sources/       — table catalog, keyed-text source, per-reducer sinks
    operators/     — map_reduce core, dedup, similarity, events, multimodal
    functions/     — column-expression libraries (text, vectors, textstats)
    plans/         — the query catalog (queries() + oracle_sql() registry)
    streaming/     — Structured Streaming variants
"""

from mapreduce_implementation_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["get_spark", "__version__"]
