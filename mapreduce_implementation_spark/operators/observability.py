"""In-flight pipeline telemetry via ``DataFrame.observe`` — data
quality metrics that ride the EXISTING action instead of costing a
second corpus pass.

The anti-pattern at 100 TB is ``df.count()`` / ``df.where(bad).count()``
sprinkled between pipeline stages: every such call is another full scan
(and with lineage, another full recompute of everything upstream).
``observe`` attaches named aggregate expressions to a plan node
(``CollectMetrics``); they are accumulated DURING whatever action the
caller was already running and surface

* batch: through ``pyspark.sql.Observation`` (blocking ``.get`` after
  the first action touches the node);
* streaming: per micro-batch in ``StreamingQueryProgress
  .observedMetrics`` — the feed a production monitor alarms on.

Only aggregates are allowed (Spark enforces: no distinct, no
nondeterminism), which is exactly the telemetry contract: metrics are
mergeable partials, so observation adds no shuffle and no barrier to
the observed plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from mapreduce_implementation_spark.functions.textstats import token_count


def corpus_quality_metrics(text_col: str = "text") -> list:
    """The standard corpus-health metric set: volume, null/empty text,
    token mass, and length extremes — the numbers every ingest monitor
    wants per batch, computable as mergeable aggregates."""
    t = F.col(text_col)
    return [
        F.count(F.lit(1)).alias("rows"),
        F.count_if(t.isNull()).alias("null_text"),
        F.count_if(F.length(t) == 0).alias("empty_text"),
        F.sum(F.coalesce(token_count(text_col), F.lit(0))).alias(
            "total_tokens"
        ),
        F.min(F.length(t)).alias("min_len"),
        F.max(F.length(t)).alias("max_len"),
    ]


def observe_corpus(
    df: DataFrame,
    name: str = "corpus_quality",
    text_col: str = "text",
    extra_metrics: list | None = None,
) -> tuple[DataFrame, Observation]:
    """Attach the corpus-health metrics to ``df``. Returns the observed
    frame (use it in place of ``df``) and the ``Observation`` —
    ``obs.get`` blocks until the first action over the returned frame
    completes, then yields the metric dict. ZERO extra jobs."""
    obs = Observation(name)
    metrics = corpus_quality_metrics(text_col) + (extra_metrics or [])
    return df.observe(obs, *metrics), obs


def observe_stream(
    df: DataFrame,
    name: str = "stream_quality",
    metrics: list | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Streaming variant: metrics land in every micro-batch's
    ``progress.observedMetrics[name]`` (Row). Streams cannot use
    ``Observation`` (one-shot by design); the string-named form is the
    per-batch feed."""
    ms = metrics if metrics is not None else corpus_quality_metrics(text_col)
    return df.observe(name, *ms)
