"""Batch model inference over a document corpus — the mapInPandas
plumbing a 100 TB embedding/scoring pass needs, with the MODEL part
stubbed (this container has no encoder weights; like
operators/multimodal.py, the Spark-side machinery — schema, Arrow
batching, partition-scoped model lifecycle — is the real, tested
product and the stub is swappable for a real loader).

The canonical shape, and why each piece matters at scale:

* ``mapInPandas`` (narrow, no shuffle): the corpus streams through as
  Arrow batches bounded by
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` — batch size is the
  GPU/memory knob, NOT partition size;
* the model loads ONCE PER PARTITION (inside the generator fn, before
  the batch loop) — per-batch loading re-pays model init dozens of
  times per task, per-ROW loading is the classic 1000× inference bug;
  the load-count contract is pytest-pinned with an accumulator;
* only (id, text) enter the operator and only (id, embedding) leave —
  payload columns never ride through Python;
* output embeddings are float32 arrays matching the ``embeddings``
  table schema, so everything downstream (similarity search, SRP-LSH
  dedup, IVF indexing) composes directly.

The default stub "model" is DETERMINISTIC (md5 token projections,
mean-pooled and L2-normalized): same text → same vector on any
executor, so exactly-once sinks stay idempotent under retries and the
test suite can replay vectors in pure Python. A real sentence encoder
drops in via ``model_loader`` without touching the dataflow.
"""

from __future__ import annotations

import math
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    LongType,
    StructField,
    StructType,
)


def _stub_model(dim: int) -> Callable[[list[str]], list[list[float]]]:
    """Deterministic hash-projection 'encoder': each lowercase token
    maps to a fixed pseudo-random unit-range vector (md5-seeded), a
    document is the L2-normalized mean of its token vectors (the
    classic bag-of-embeddings baseline). Zero-token docs embed as the
    zero vector. Pure stdlib — ships by value to executors."""
    import functools
    import hashlib

    # memoized per model instance (= per partition): a token's vector
    # is recomputed once per DISTINCT token, not once per occurrence —
    # the same economy a real tokenizer's vocab table gives
    @functools.lru_cache(maxsize=1 << 16)
    def token_vec(tok: str) -> tuple[float, ...]:
        out = []
        for i in range(dim):
            h = hashlib.md5(f"{tok}:{i}".encode()).hexdigest()[:8]
            out.append(int(h, 16) / 0xFFFFFFFF * 2.0 - 1.0)
        return tuple(out)

    def encode(texts: list[str]) -> list[list[float]]:
        vecs = []
        for text in texts:
            toks = [t for t in (text or "").lower().split() if t]
            if not toks:
                vecs.append([0.0] * dim)
                continue
            acc = [0.0] * dim
            for t in toks:
                tv = token_vec(t)
                for i in range(dim):
                    acc[i] += tv[i]
            n = math.sqrt(sum(x * x for x in acc))
            vecs.append([x / n for x in acc] if n > 0 else acc)
        return vecs

    return encode


def embed_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 16,
    model_loader: Callable[[], Callable[[list[str]], list[list[float]]]] | None = None,
    load_counter=None,
) -> DataFrame:
    """Embed every document: DataFrame[id_col long, embedding
    array<float>] (module docstring for the scale contract).

    ``model_loader``: zero-arg callable returning the encoder
    ``list[str] -> list[list[float]]``; called once per PARTITION on
    the executor (swap in the real model load here). Default: the
    deterministic stub at ``dim``.

    ``load_counter``: optional Spark accumulator incremented on each
    model load — the per-partition-lifecycle contract made observable
    (tests pin loads == partitions, not batches)."""
    import pandas as pd

    # executor closures referencing this module (the default
    # model_loader closes over _stub_model) must pickle BY VALUE: the
    # driver contract hands us an arbitrary SparkSession whose Python
    # workers may not have this package on sys.path (they don't when
    # the driver's cwd isn't the repo root — the same contract as
    # operators/multimodal._ship_codecs_by_value)
    from pyspark import cloudpickle

    import mapreduce_implementation_spark.operators.inference as _self

    cloudpickle.register_pickle_by_value(_self)

    if model_loader is None:
        _dim = dim

        def model_loader() -> Callable[[list[str]], list[list[float]]]:
            return _stub_model(_dim)

    loader = model_loader
    counter = load_counter
    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("embedding", ArrayType(FloatType())),
        ]
    )

    def batches(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # ONE model load per partition, before the batch loop — the
        # whole point of the iterator-of-batches API
        model = loader()
        if counter is not None:
            counter.add(1)
        for pdf in pdfs:
            vecs = model(list(pdf[text_col]))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype("int64"),
                    "embedding": [[float(x) for x in v] for v in vecs],
                }
            )

    # spread(): Python inference is the textbook expression-heavy stage
    # a thin scan would serialize onto a few cores (operators/dedup)
    from mapreduce_implementation_spark.operators.dedup import spread

    return spread(docs.select(id_col, text_col)).mapInPandas(batches, schema)
