"""Native Python UDF surfaces beyond the mapInPandas/applyInPandas
family already under the hash gate: a scalar Arrow-batched pandas_udf
and a Spark-4 native Python UDTF (one row in → N rows out with lateral
join). Definitions live INSIDE the tests so cloudpickle ships them by
value (see operators/multimodal._ship_codecs_by_value for why)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from mapreduce_implementation_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def test_scalar_pandas_udf_matches_builtin(spark):
    """Arrow-batched scalar UDF: vectorized token count must equal the
    JVM-side expression (the hot path stays JVM; this proves the Arrow
    scalar surface works when Python is unavoidable)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def py_token_count(text: pd.Series) -> pd.Series:
        return text.str.split().map(len).astype("int64")

    from mapreduce_implementation_spark.functions.textstats import token_count

    docs = load_table(spark, SF, "documents").limit(50)
    rows = docs.select(
        token_count("text").alias("jvm"), py_token_count("text").alias("py")
    ).collect()
    assert rows and all(r.jvm == r.py for r in rows)


def test_native_python_udtf_lateral_explode(spark):
    """Spark-4 native UDTF: per input row, emit one row per token with
    its position — the table-function shape (LATERAL join)."""
    from pyspark.sql.functions import lit, udtf

    @udtf(returnType="word: string, pos: int")
    class TokenizeUdtf:
        def eval(self, text: str):
            for i, w in enumerate((text or "").split()):
                yield w, i

    spark.udtf.register("tokenize_udtf", TokenizeUdtf)
    out = spark.sql(
        "SELECT t.word, t.pos FROM (SELECT 'a bb ccc' AS s), "
        "LATERAL tokenize_udtf(s) t"
    ).collect()
    assert [(r.word, r.pos) for r in out] == [("a", 0), ("bb", 1), ("ccc", 2)]
    # also callable DataFrame-side
    got = TokenizeUdtf(lit("x y")).collect()
    assert [(r.word, r.pos) for r in got] == [("x", 0), ("y", 1)]
