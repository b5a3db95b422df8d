"""Benchmark decontamination — per-document n-gram overlap against an
eval/benchmark corpus, the check a training-data pipeline runs before a
corpus ships (eval questions leaking into training data silently
inflate downstream scores).

The standard construction (n-gram collision decontamination, as
published for the big public LM corpora): every document is flagged
with how many of its distinct word n-grams also appear in the
benchmark set; a threshold on the overlap fraction drives drop/keep.

Spark-first shape, sized for the real asymmetry of the problem — the
corpus is 100 TB but benchmarks are megabytes:

* the benchmark's distinct n-gram set is aggregated once and
  BROADCAST (eval sets are 1e3–1e6 grams; never a shuffle side);
* the corpus side is a scan-stage explode of distinct per-doc shingles
  followed by a broadcast left join — the only shuffle is the final
  per-doc groupBy, whose key is the doc id (uniform, skew-free);
* counting hits via LEFT join + ``count(flag)`` (not inner join) keeps
  zero-overlap documents in the result — the common case, and the one
  a drop-list must NOT lose.

The reference engine has no contamination surface (its only analysis
is word counting, /root/reference/Worker.cc:148-264); this module is
part of the LLM-pipeline extension set alongside dedup/sampling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mapreduce_implementation_spark.operators.dedup import shingles, spread


def ngram_contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Per-document benchmark overlap: DataFrame[id_col, n_ngrams,
    n_contaminated, contamination_frac].

    ``n_ngrams`` counts the document's DISTINCT word n-grams (distinct,
    not raw: a doc repeating one leaked gram 100 times is no more
    contaminated than one containing it once); ``n_contaminated`` is
    how many of those appear anywhere in ``benchmark``. Documents with
    fewer than ``n`` tokens have no n-grams and yield no row — they
    cannot be n-gram-contaminated by construction.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    # spread(): the shingle projection is HOF work outside whole-stage
    # codegen — a thin scan serializes it onto one core (measured 3x at
    # sf0.1); conditional no-op on wide scans, so free at corpus scale
    bench_grams = (
        spread(benchmark)
        .select(F.explode(shingles(bench_text_col, n)).alias("gram"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    doc_grams = spread(docs).select(
        F.col(id_col), F.explode(shingles(text_col, n)).alias("gram")
    )
    return (
        doc_grams.join(F.broadcast(bench_grams), "gram", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.count("_hit").alias("n_contaminated"),
        )
        .withColumn(
            "contamination_frac",
            F.col("n_contaminated") / F.col("n_ngrams"),
        )
    )


def duplicate_span_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 20,
) -> DataFrame:
    """Substring-level SELF-duplication: per document, the fraction of
    its distinct word-``n``-grams that appear verbatim in at least one
    OTHER document — the long-span signal behind substring-dedup
    results in the public training-data literature (docs sharing long
    verbatim spans — licenses, boilerplate, mirrored passages — that
    document-level near-dup misses when the rest of the text differs).
    Returns DataFrame[id_col, n_spans, n_dup_spans, dup_span_frac];
    docs shorter than ``n`` tokens have no spans and yield no row.

    Scale shape (the self-corpus twist on ngram_contamination — here
    NEITHER side is broadcastable):

    * explode distinct per-doc spans, hash each span to 64-bit
      (xxhash64 — the span STRING never enters a shuffle; 20-word
      spans are hundreds of bytes, the hash is 8);
    * holder count per span as a WINDOW count over the span hash — ONE
      shuffle and ONE tokenize/explode pass. The tempting
      groupBy(h)+join-back is NOT a second option here: Catalyst
      prunes doc_id out of the count branch, the two subplans stop
      being identical, no ReusedExchange is planned, and the corpus is
      tokenized and exploded TWICE (verified on the physical plan,
      tests/test_contamination.py pins the single-scan shape). A hot
      span (boilerplate held by millions of docs) makes one spilling
      window group — the same bounded failure mode as cap_buckets'
      bucket-count window, and far cheaper than a second corpus pass;
    * final skew-free groupBy on the doc id.

    Collision note: a 64-bit hash pairs unrelated spans with ~n²/2⁶⁵
    probability — at 10¹² spans that is a handful of FALSE dup marks,
    the right trade against shuffling span strings (tighten to the
    md5 hex the other miners use if exactness ever matters)."""
    if n < 2:
        raise ValueError(f"n must be >= 2 for span stats, got {n}")
    from pyspark.sql.window import Window

    spans = spread(docs).select(
        F.col(id_col), F.explode(shingles(text_col, n)).alias("span")
    ).select(F.col(id_col), F.xxhash64("span").alias("h"))
    counted = spans.withColumn(
        "n_docs", F.count(F.lit(1)).over(Window.partitionBy("h"))
    )
    return (
        counted.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.count(F.when(F.col("n_docs") > 1, 1)).alias("n_dup_spans"),
        )
        .withColumn("dup_span_frac", F.col("n_dup_spans") / F.col("n_spans"))
    )
