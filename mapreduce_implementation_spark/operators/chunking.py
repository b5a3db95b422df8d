"""Document chunking — fixed-token-budget windows with overlap, the
prep step for context-bounded training and retrieval corpora.

Pure Column expressions end-to-end: tokenize → compute the chunk-start
sequence → slice per start → explode. Map-only (the explode is a
scan-stage generator, no shuffle), whole-stage-codegen-able, and the
fan-out per document is ceil(n_tokens/step) — bounded and predictable,
so a 100 TB corpus chunks in one pass at scan parallelism with zero
exchange. No Python touches the hot path.

The reference has no chunking surface (its unit of work is the whole
input chunk, /root/reference/Worker.cc:123-141); this is part of the
LLM-pipeline extension set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mapreduce_implementation_spark.functions.text import tokens


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 512,
    overlap: int = 0,
    mode: str = "simple",
) -> DataFrame:
    """One row per chunk: (id_col, chunk_idx, n_tokens, chunk_text).

    Chunks are ``chunk_tokens`` tokens wide and start every
    ``chunk_tokens - overlap`` tokens (0-based ``chunk_idx``), so
    consecutive chunks share ``overlap`` tokens of context. The final
    chunk is the (possibly shorter) tail; a chunk that would contribute
    only already-covered tokens is not emitted. Empty documents yield
    no rows. Token order within a chunk is preserved (slice, not set).
    """
    if chunk_tokens <= 0:
        raise ValueError(f"chunk_tokens must be positive, got {chunk_tokens}")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"overlap must be in [0, chunk_tokens), got {overlap}"
        )
    step = chunk_tokens - overlap
    toks = tokens(text_col, mode=mode)
    # starts: 0, step, 2*step, ... while start < n_tokens AND the chunk
    # adds at least one new token (start + overlap < n_tokens covers
    # both: the previous chunk ended at start + overlap).
    n = F.size(toks)
    # greatest(1, ...): a non-empty doc shorter than the overlap still
    # yields its one (tail) chunk — ceil((n-overlap)/step) alone would
    # round to <= 0 there.
    n_chunks = F.when(n <= F.lit(0), F.lit(0)).otherwise(
        F.greatest(
            F.lit(1), F.ceil((n - F.lit(overlap)) / F.lit(step)).cast("int")
        )
    )
    out = (
        df.select(
            F.col(id_col),
            toks.alias("_toks"),
            n_chunks.alias("_nc"),
        )
        .where(F.col("_nc") > 0)
        .select(
            F.col(id_col),
            F.col("_toks"),
            F.explode(
                F.sequence(F.lit(0), F.col("_nc") - 1)
            ).alias("chunk_idx"),
        )
        .select(
            F.col(id_col),
            F.col("chunk_idx"),
            # slice() is 1-based; each chunk is at most chunk_tokens wide
            F.slice(
                F.col("_toks"),
                F.col("chunk_idx") * step + 1,
                chunk_tokens,
            ).alias("_chunk_toks"),
        )
        .select(
            F.col(id_col),
            F.col("chunk_idx"),
            F.size("_chunk_toks").alias("n_tokens"),
            F.array_join("_chunk_toks", " ").alias("chunk_text"),
        )
    )
    return out


def keyed_chunks(
    chunks: DataFrame,
    id_col: str = "doc_id",
    key_stride: int = 1 << 32,
    keep_text: bool = True,
) -> DataFrame:
    """Attach the collision-free pack key: ``chunk_key = id *
    key_stride + chunk_idx`` — THE one shared encoding (batch pipeline,
    streaming pipeline, bench all route through here so the key
    identity cannot drift between faces).

    The arithmetic is only collision-free when ``0 <= id <
    2^63/key_stride`` (2^31 at the default stride) and ``chunk_idx <
    key_stride``; outside that range it overflows — an ANSI runtime
    error at best, silent wraparound collisions at worst. Both bounds
    are enforced PER ROW with a codegen comparison that raises loudly
    either way. Ids from a 64-bit hash (xxhash64) exceed the bound by
    construction — dense surrogate ids are the supported encoding for
    string-keyed corpora."""
    max_id = (1 << 63) // key_stride
    id_ok = F.col(id_col).between(0, max_id - 1) & (
        F.col("chunk_idx") < F.lit(key_stride)
    )
    guarded_id = F.when(id_ok, F.col(id_col)).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    f"chunk_key encoding needs 0 <= {id_col} < {max_id} "
                    f"and chunk_idx < {key_stride}; got ({id_col}="
                ),
                F.col(id_col).cast("string"),
                F.lit(", chunk_idx="),
                F.col("chunk_idx").cast("string"),
                F.lit(
                    "). Map string/hashed ids to dense longs first — a "
                    "raw 64-bit hash overflows this encoding."
                ),
            )
        )
    )
    cols = [
        (guarded_id * F.lit(key_stride) + F.col("chunk_idx")).alias(
            "chunk_key"
        ),
        F.col(id_col),
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
    ]
    if keep_text:
        cols.append(F.col("chunk_text"))
    return chunks.select(*cols)
