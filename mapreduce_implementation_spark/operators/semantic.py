"""SemDeDup-style semantic deduplication over embedding columns.

Public technique (Abbas et al. 2023, "SemDeDup: Data-efficient
learning at web-scale through semantic deduplication",
arXiv:2303.09540): cluster document embeddings with k-means, then
within each cluster drop all but one member of every group of
semantically near-identical vectors — catching paraphrases and
re-renders that token-level MinHash/SimHash miss because the surface
strings differ.

Engine shape (and why it survives 100 TB):

* Clustering reuses the IVF machinery (operators.similarity.
  train_centroids — integer-exact spherical k-means, deterministic
  md5-ordered init) so the cluster assignment is ONE map-only pass
  over the vectors against driver-held k x d centroid literals: no
  crossJoin explosion, no per-vector window shuffle.
* The candidate join is an EQUI self-join on ``centroid_id`` — the
  cluster plays the role the LSH band plays in the token miners, so
  the pair count is bounded by per-cluster size, never all-pairs.
  Scale ``k`` with the corpus (SemDeDup uses ~sqrt(N)-to-N/1000
  clusters) so expected cluster size stays bounded.
* ``max_cluster`` is the skew guard, same spirit as the miners'
  ``max_bucket`` (operators/dedup.py:250): a degenerate mega-cluster
  (all-identical boilerplate embeddings) would square. Oversized
  clusters are never silently squared; what happens to them is the
  ``exempt_strategy`` choice. ``"slice"`` (default) MINES them at
  bounded cost: sort the cluster by a deterministic pseudo-random
  projection, assign positions with the no-global-sort contiguous-id
  machinery (operators/ids.py — one range exchange, never a window
  over the mega-cluster's single partition key), cut the order into
  ``max_cluster``-sized slices with a one-row overlap, and self-join
  WITHIN slices: per-slice cost ≤ (max_cluster+1)², total O(n ·
  max_cluster), parallel across slices. Near-identical vectors have
  near-identical projections, so they sort adjacent and land in the
  same slice; an identical run spanning slices is caught as a CHAIN
  through the overlap row (each slice's first row is also compared
  against the previous slice), so a clique of boilerplate collapses
  to its min id exactly as the unguarded rule would. The restriction
  to same-slice pairs is the recall trade — the same banding-style
  trade every capped miner makes. ``"keep"`` is the round-9 behavior:
  oversized clusters exempted wholesale, every member kept (the
  conservative failure — measured at 41–46% of the adversarial Zipf
  corpus, which is why slice is now the default). Either way the
  output stays a total function of the input: one row per vector.
  Cluster sizes are computed with a groupBy (partial agg, k rows) and
  broadcast back, not a window, so the size count itself has no
  single-task ceiling.
* Keep rule: within a cluster, drop ``v`` iff some ``u`` with
  ``u < v`` (by id) is within ``threshold`` cosine — the
  deterministic min-id-exemplar rule, applied PAIRWISE (the same
  rule build_drop_list documents for near-dup pairs). This is a
  superset of SemDeDup's one-per-epsilon-group: chains 1~2~3 with
  1!~3 drop both 2 and 3. Cosine is quantized to DECIMAL(10,4)
  before the comparison so the keep/drop decision is
  engine-portable (cross-checked against the DuckDB twin).

The reference engine (a WordCount MapReduce, /root/reference/hw4.cc)
has no embedding surface; this operator belongs to the
LLM-training-data extension set, built on the brief's similarity
stack.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mapreduce_implementation_spark.caching import track_cache
from mapreduce_implementation_spark.operators import similarity as sim
from mapreduce_implementation_spark.operators.dedup import DEFAULT_MAX_BUCKET


def _slice_projection(emb):
    """Deterministic pseudo-random 1-D projection of an embedding —
    the sort key that makes mega-cluster slicing work: near-identical
    vectors project to near-identical scalars, so they sort adjacent.
    Weight ``w_j = xxhash64("semslice", j) % 1_000_001 / 1e6`` ∈
    (-1, 1) is a pure expression (no driver-side d×1 literal needed —
    the dimensionality never has to be known up front), one O(d) fold
    per row, map-side."""
    idx = F.sequence(F.lit(0), F.size(emb) - F.lit(1))
    return F.aggregate(
        idx,
        F.lit(0.0),
        lambda acc, j: acc
        + F.get(emb, j).cast("double")
        * ((F.xxhash64(F.lit("semslice"), j) % 1_000_001) / 1_000_000.0),
    )


def _blas_screen(id_col: str, emb_col: str, threshold: float):
    """Per-group pairwise cosine screen as ONE numpy matmul — the
    Arrow-batched replacement for enumerating (c²/2) join rows each
    carrying two float arrays through a per-pair HOF dot fold. Groups
    are bounded by construction (≤ max_cluster+1 rows: small clusters
    or slices), so the (c, d) @ (d, c) Gram matrix is a few MB and the
    whole screen is BLAS, not row enumeration — the round-11 negative
    result showed the join's pair ENUMERATION, not the dot arithmetic,
    is the binding cost, so the fix is to stop enumerating.

    Parity with the join screen is EXACT: ``_vn`` (Spark's left-fold
    L2 norm) rides in, so denominators are bit-identical; the dot's
    summation ORDER differs (BLAS vs left fold) only inside a ~1e-15
    band, and similarity.np_quantize_q4 recomputes every boundary-
    adjacent score through Spark's exact left fold and quantizes it
    with shortest-repr HALF_UP — the JVM double→DECIMAL(10,4) cast's
    own semantics (round-12's sign·floor(|c|·10⁴+0.5) alone missed
    the shortest-repr edge — ADVICE r12). Gated hash-equal by the
    demoted slice-parity oracle (tests/test_demoted_oracles.py) and
    the planted-twin pytests."""
    from decimal import ROUND_HALF_UP, Decimal

    from mapreduce_implementation_spark.operators.similarity import (
        np_quantize_q4,
        ship_module_by_value,
    )

    ship_module_by_value()

    thr_i = int(
        Decimal(repr(float(threshold)))
        .quantize(Decimal("0.0001"), rounding=ROUND_HALF_UP)
        .scaleb(4)
    )

    def screen(pdf):
        import numpy as np
        import pandas as pd

        pdf = pdf[pdf[emb_col].notna() & pdf["_vn"].notna()]
        if len(pdf) < 2:
            return pd.DataFrame({"_dropped_id": pdf[id_col].iloc[0:0]})
        pdf = pdf.sort_values(id_col)
        m = np.stack(pdf[emb_col].to_numpy()).astype(np.float64)
        vn = pdf["_vn"].to_numpy(dtype=np.float64)
        denom = np.outer(vn, vn)
        with np.errstate(divide="ignore", invalid="ignore"):
            cos = np.where(denom != 0.0, (m @ m.T) / denom, -np.inf)
        n = len(pdf)

        def exact_at(flat_ix: int) -> float:
            i, j = divmod(flat_ix, n)
            acc = 0.0
            for a, b in zip(m[i], m[j]):
                acc += a * b
            return acc / (vn[i] * vn[j])

        qi = np_quantize_q4(cos, exact_at)
        # drop j iff ANY i < j (id order) qualifies — the pairwise
        # min-id rule, same strict-upper-triangle the join's
        # a.id < b.id condition walks
        hit = np.triu(qi >= thr_i, k=1)
        return pd.DataFrame(
            {"_dropped_id": pdf[id_col].to_numpy()[hit.any(axis=0)]}
        )

    return screen


def semantic_dedup(
    vectors: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    *,
    centroids: DataFrame | None = None,
    assignment: DataFrame | None = None,
    k: int = 8,
    iters: int = 3,
    threshold: float = 0.9,
    max_cluster: int | None = DEFAULT_MAX_BUCKET,
    exempt_strategy: str = "slice",
    exemption_observation=None,
    pair_screen: str = "auto",
    assign_impl: str = "arrow",
) -> DataFrame:
    """Semantic dedup: k-means clusters + within-cluster cosine screen.

    Returns exactly one row per input vector:
    ``DataFrame[id_col, centroid_id int, keep int]`` — ``keep = 0``
    iff a same-cluster vector with a smaller id is within
    ``threshold`` cosine (and the cluster is not ``max_cluster``
    -exempt). Pass ``centroids`` (DataFrame[centroid_id,
    centroid_emb]) to reuse a trained set; otherwise ``k``/``iters``
    spherical k-means is trained here. For cluster counts beyond the
    flat-scoring budget (k ≳ 10³ — SemDeDup at corpus scale), pass
    ``assignment`` instead: a precomputed DataFrame[id_col, emb_col,
    centroid_id] (e.g. similarity.assign_two_level over a
    train_two_level_centroids hierarchy — per-row cost
    O((k₁+k₂)·d) instead of O(k·d)); ``vectors``/``centroids``/``k``
    are then ignored.

    ``max_cluster=None`` opts out of the skew guard (oracle parity
    runs do this); the default keeps a degenerate mega-cluster from
    squaring in the self-join. ``exempt_strategy`` picks what happens
    to oversized clusters (module docstring): ``"slice"`` (default)
    mines them through projection-sorted ``max_cluster``-sized slices
    with a one-row overlap — bounded O(n · max_cluster) cost, chains
    collapse identical runs, only pairs >1 apart in projection order
    across a slice boundary are missed; ``"keep"`` exempts them
    wholesale — every member kept, zero dedup over exactly the
    densest near-dup mass (the round-10 telemetry measured 41–46% on
    the adversarial Zipf corpus). With an ``exemption_observation``,
    ``"keep"`` reports ``exempted_rows``/``exempted_clusters`` and
    ``"slice"`` reports those as 0 plus ``sliced_rows``/
    ``sliced_clusters`` (the oversized mass that was mined with the
    slice-restricted candidate set).

    Laziness: under ``"slice"`` with a finite ``max_cluster`` this
    builder runs ONE eager probe job at call time (a ``take(1)`` over
    the k-row cluster-size agg) and skips the entire slice subtree —
    positioning barrier included — when no cluster is oversized, the
    common case. ``"keep"`` and ``max_cluster=None`` build fully lazy
    plans. CONTRACT (ADVICE r12): the probe's answer is baked into
    the returned plan, so the builder must be RE-INVOKED whenever the
    underlying data changes (a frame built once and re-executed per
    micro-batch would mine a late-arriving mega-cluster un-sliced);
    the input should be deterministic between build and action —
    callers composing plans they may never execute, or over moving
    inputs, should pass ``exempt_strategy="keep"`` or a precomputed
    ``assignment``.

    ``pair_screen`` picks how within-group pairs are screened when
    ``max_cluster`` is finite (groups then bounded at max_cluster+1
    rows): ``"auto"`` (default, round 13) reads the cluster-size
    stats the probe job already computes and picks by mean surviving
    group size vs the measured crossover
    (dedup.choose_pair_screen — bounded clusters are few and large,
    so natural corpora resolve to "blas"); ``"blas"`` runs one Gram
    matmul per group via applyInPandas — no pair enumeration,
    Arrow-batched, the round-12 fix for the join screen's binding
    cost; ``"join"`` is the
    enumerate-and-fold self-join (the A/B arm, and the only legal
    screen under ``max_cluster=None``, where a group is an unbounded
    whole cluster). Results are parity-gated equal (demoted slice
    oracle + planted twins).

    ``assign_impl`` picks the assignment kernel
    (similarity.assign_inverted_lists): ``"arrow"`` (default) is the
    round-13 mapInPandas matmul — the round-12 decomposition showed
    the assignment's HOF folds dominating the whole operator;
    ``"expr"`` is the all-expression A/B arm. Parity-gated identical.
    """
    if not 0.0 <= threshold <= 1.0:
        raise ValueError(f"threshold must be in [0, 1], got {threshold}")
    if exempt_strategy not in ("slice", "keep"):
        raise ValueError(
            f"exempt_strategy must be 'slice' or 'keep', got "
            f"{exempt_strategy!r}"
        )
    if pair_screen not in ("blas", "join", "auto"):
        raise ValueError(
            f"pair_screen must be 'blas', 'join' or 'auto', got {pair_screen!r}"
        )
    if max_cluster is None and exemption_observation is not None:
        raise ValueError(
            "exemption observation requires a finite max_cluster "
            "(max_cluster=None never attaches the metrics)"
        )
    from mapreduce_implementation_spark.functions.vectors import dot, norm
    from mapreduce_implementation_spark.operators.dedup import spread

    # `_vn` (the L2 norm) is computed ONCE per vector instead of twice
    # per candidate PAIR: the pair score then costs one dot fold
    # instead of three — numerically identical (same sqrt(left-fold)
    # bits, same denominator product) but ~3x less HOF work in the hot
    # join. Cached: the self-join reads the assignment twice and the
    # assignment chain (k x d literal fold per row) is the expensive
    # part. Session-scale cache, released by the registry sweep; a
    # persistent pipeline should materialize via sources/materialize
    # (the IVF index row shows the pattern).
    if assignment is not None:
        assigned = track_cache(
            spread(assignment).withColumn("_vn", norm(F.col(emb_col)))
        )
    else:
        # Widen THIN sources up front: Catalyst fuses the pair score
        # into the (broadcast) self-join condition, so the expensive
        # dot folds run wherever the PROBE side's partitions are — a
        # single-file bench/test scan would serialize them onto one
        # core. Corpus-scale inputs (many files) pass through spread
        # untouched.
        vectors = spread(vectors)
        if centroids is None:
            centroids = sim.train_centroids(
                vectors, k=k, iters=iters, id_col=id_col, emb_col=emb_col
            )
        # One map-only pass: nearest centroid per vector (quantized
        # cosine, ties -> smaller centroid_id), embedding carried
        # through for the pair screen.
        assigned = track_cache(
            sim.assign_inverted_lists(
                vectors, centroids, 1, id_col=id_col, emb_col=emb_col,
                keep_cols=(emb_col,), impl=assign_impl,
            ).withColumn("_vn", norm(F.col(emb_col)))
        )
    if max_cluster is not None:
        # k rows after the partial agg -> broadcast back; no window.
        sizes = assigned.groupBy("centroid_id").agg(
            F.count(F.lit(1)).alias("_csize")
        )

        if exemption_observation is not None:
            # Exemption telemetry (round-9 verdict item): the recall
            # cost of the mega-cluster guard. Delivered via an eager
            # materialization of the k-row sizes frame — lazy
            # CollectMetrics inside a broadcast subtree is unreliable
            # under AQE replanning (see dedup.cap_buckets); the eager
            # action is one partial agg over the cached assignment,
            # paid only when telemetry is requested. Under "slice"
            # the oversized mass is MINED, not exempted, so
            # exempted_* report 0 and the mass moves to sliced_*.
            oversized_mass = F.coalesce(
                F.sum(
                    F.when(F.col("_csize") > max_cluster, F.col("_csize"))
                ),
                F.lit(0),
            )
            oversized_cnt = F.count_if(F.col("_csize") > max_cluster)
            if exempt_strategy == "slice":
                metrics = [
                    F.coalesce(F.sum(F.lit(0)), F.lit(0)).alias(
                        "exempted_rows"
                    ),
                    F.coalesce(F.sum(F.lit(0)), F.lit(0)).alias(
                        "exempted_clusters"
                    ),
                    oversized_mass.alias("sliced_rows"),
                    oversized_cnt.alias("sliced_clusters"),
                ]
            else:
                metrics = [
                    oversized_mass.alias("exempted_rows"),
                    oversized_cnt.alias("exempted_clusters"),
                ]
            sizes = sizes.observe(
                exemption_observation, *metrics
            ).localCheckpoint(eager=True)
        mineable = (
            assigned.join(F.broadcast(sizes), "centroid_id")
            .where(F.col("_csize") <= max_cluster)
            .drop("_csize")
        )
        # Cluster-size stats probe — ONE eager job serving two
        # decisions (round-11 verdict item 1 + round-13 item 2): the
        # any-oversized gate on the slice subtree (its positioning
        # barrier / cmin agg / union / second self-join previously
        # executed even when NO cluster was oversized — the common
        # case — costing the sf0.1 warm bench 2.76×) and the
        # pair_screen="auto" regime pick. `sizes` is ≤ k rows after
        # the partial agg; the scan the probe triggers populates the
        # track_cache'd assignment the final action needs anyway, so
        # end-to-end work is unchanged — but callers that never act
        # on the result pay one assignment pass (see the laziness
        # CONTRACT in the docstring). Pinned pair_screen +
        # exempt_strategy="keep" (or max_cluster=None) stays fully
        # lazy. With telemetry on, `sizes` is already checkpointed
        # and the probe reads the k cached rows.
        size_stats = None
        if pair_screen == "auto" or exempt_strategy == "slice":
            size_stats = sizes.select(
                F.coalesce(
                    F.sum(
                        F.when(
                            F.col("_csize") <= max_cluster, F.col("_csize")
                        )
                    ),
                    F.lit(0),
                ).alias("small_rows"),
                F.count_if(F.col("_csize") <= max_cluster).alias(
                    "small_groups"
                ),
                F.coalesce(
                    F.sum(
                        F.when(
                            F.col("_csize") > max_cluster, F.col("_csize")
                        )
                    ),
                    F.lit(0),
                ).alias("big_rows"),
            ).first()
        if pair_screen == "auto":
            from mapreduce_implementation_spark.operators.dedup import (
                choose_pair_screen,
            )

            pair_screen = choose_pair_screen(
                int(size_stats.small_rows),
                int(size_stats.small_groups),
                int(size_stats.big_rows),
                max_cluster,
                exempt_strategy == "slice",
            )
    else:
        mineable = assigned
        if pair_screen == "auto":
            # unbounded clusters: the join screen is the only legal
            # form (a mega-cluster group would not fit a Python worker)
            pair_screen = "join"
    slice_members = None
    if (
        max_cluster is not None
        and exempt_strategy == "slice"
        and int(size_stats.big_rows) > 0
    ):
        # Mega-cluster mining (round-10 verdict item 1): the oversized
        # clusters hold exactly the densest near-dup mass — mine them
        # at bounded cost instead of keeping them wholesale. Sort each
        # oversized cluster by a deterministic projection, assign
        # global positions WITHOUT a window over the cluster key (a
        # mega-cluster is by definition one enormous partition key —
        # assign_contiguous_ids range-partitions on (cluster, proj,
        # id) instead, so the sort parallelizes across the cluster),
        # then cut into max_cluster-sized slices. The one-row overlap
        # (each slice's first row is re-compared against the previous
        # slice) turns identical runs into drop CHAINS across slice
        # boundaries, so a boilerplate clique collapses to its min id
        # end to end. Self-join key is (centroid_id, _slice): bounded
        # per-key population, parallel across slices.
        from mapreduce_implementation_spark.operators.ids import (
            assign_contiguous_ids,
        )

        exempt = (
            assigned.join(F.broadcast(sizes), "centroid_id")
            .where(F.col("_csize") > max_cluster)
            .drop("_csize")
        )
        positioned = assign_contiguous_ids(
            exempt.withColumn("_proj", _slice_projection(F.col(emb_col))),
            ["centroid_id", "_proj", id_col],
            "_gpos",
        )
        # per-cluster base position: ≤ k rows after the partial agg,
        # broadcast back — same no-window shape as the sizes frame
        cmin = positioned.groupBy("centroid_id").agg(
            F.min("_gpos").alias("_cmin")
        )
        base = (
            positioned.join(F.broadcast(cmin), "centroid_id")
            .withColumn("_rel", F.col("_gpos") - F.col("_cmin"))
            .withColumn("_slice", F.floor(F.col("_rel") / max_cluster))
        )
        overlap = base.where(
            (F.col("_rel") % max_cluster == 0) & (F.col("_slice") > 0)
        ).withColumn("_slice", F.col("_slice") - 1)
        slice_members = base.unionByName(overlap).select(
            id_col, emb_col, "_vn", "centroid_id", "_slice"
        )
    if pair_screen == "blas" and max_cluster is not None:
        # Bounded-group regime: every screen group is ≤ max_cluster+1
        # rows (a small cluster, or a slice of an oversized one), so
        # the pairwise screen collapses into one Gram matmul per group
        # via applyInPandas (_blas_screen) — one exchange on
        # (centroid_id, _slice), the same data movement the self-join's
        # sort-merge exchange paid, with ZERO pair enumeration.
        # max_cluster=None keeps the join screen: a group is then a
        # whole cluster, unbounded by construction, and a mega-cluster
        # group would not fit a Python worker.
        from pyspark.sql import types as T

        members = mineable.select(
            id_col, emb_col, "_vn", "centroid_id",
            F.lit(0).cast("long").alias("_slice"),
        )
        if slice_members is not None:
            members = members.unionByName(slice_members)
        out_schema = T.StructType(
            [T.StructField("_dropped_id", assigned.schema[id_col].dataType)]
        )
        dropped = (
            members.groupBy("centroid_id", "_slice")
            .applyInPandas(
                _blas_screen(id_col, emb_col, threshold), out_schema
            )
            .distinct()
        )
    else:
        # The score predicate below is deliberately a plain .where():
        # Catalyst pushes it into the self-join condition, fusing
        # scoring with pair generation — zero extra exchange, and
        # parallelism comes from the (spread) probe side, per the note
        # above.
        a, b = mineable.alias("a"), mineable.alias("b")
        cand = a.join(
            b,
            (F.col("a.centroid_id") == F.col("b.centroid_id"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        ).select(
            F.col(f"b.{id_col}").alias("_dropped_id"),
            F.col(f"a.{emb_col}").alias("_ea"),
            F.col(f"b.{emb_col}").alias("_eb"),
            (F.col("a._vn") * F.col("b._vn")).alias("_denom"),
        )
        if slice_members is not None:
            sa, sb = slice_members.alias("a"), slice_members.alias("b")
            slice_cand = sa.join(
                sb,
                (F.col("a.centroid_id") == F.col("b.centroid_id"))
                & (F.col("a._slice") == F.col("b._slice"))
                & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
            ).select(
                F.col(f"b.{id_col}").alias("_dropped_id"),
                F.col(f"a.{emb_col}").alias("_ea"),
                F.col(f"b.{emb_col}").alias("_eb"),
                (F.col("a._vn") * F.col("b._vn")).alias("_denom"),
            )
            cand = cand.unionByName(slice_cand)
        score = F.when(
            F.col("_denom") != 0,
            dot(F.col("_ea"), F.col("_eb")) / F.col("_denom"),
        ).cast(sim.COS_Q)
        dropped = (
            cand.where(score >= F.lit(threshold).cast(sim.COS_Q))
            .select("_dropped_id")
            .distinct()
        )
    return (
        assigned.select(id_col, "centroid_id")
        .join(
            dropped, F.col(id_col) == F.col("_dropped_id"), "left"
        )
        .select(
            F.col(id_col),
            F.col("centroid_id"),
            F.when(F.col("_dropped_id").isNull(), F.lit(1))
            .otherwise(F.lit(0))
            .cast("int")
            .alias("keep"),
        )
    )


def _blas_pair_screen(id_col: str, emb_col: str, threshold: float):
    """Per-group PAIR emitter, the pairs-output sibling of
    :func:`_blas_screen`: one Gram matmul per bounded group, then the
    strict-upper-triangle mask indices become (id_a, id_b, cos_sim)
    rows directly — no candidate enumeration, only qualifying pairs
    materialize. Quantization identical to _blas_screen (exact-fold
    replay at decimal boundaries via similarity.np_quantize_q4);
    emitted ``cos_sim`` is the quantized value (qi / 10⁴), the same
    double the join path's DECIMAL(10,4)→double cast yields."""
    from decimal import ROUND_HALF_UP, Decimal

    from mapreduce_implementation_spark.operators.similarity import (
        np_quantize_q4,
        ship_module_by_value,
    )

    ship_module_by_value()

    thr_i = int(
        Decimal(repr(float(threshold)))
        .quantize(Decimal("0.0001"), rounding=ROUND_HALF_UP)
        .scaleb(4)
    )

    def screen(pdf):
        import numpy as np
        import pandas as pd

        pdf = pdf[pdf[emb_col].notna() & pdf["_vn"].notna()]
        if len(pdf) < 2:
            return pd.DataFrame(
                {
                    "id_a": pdf[id_col].iloc[0:0],
                    "id_b": pdf[id_col].iloc[0:0],
                    "cos_sim": pd.Series([], dtype="float64"),
                }
            )
        pdf = pdf.sort_values(id_col)
        m = np.stack(pdf[emb_col].to_numpy()).astype(np.float64)
        vn = pdf["_vn"].to_numpy(dtype=np.float64)
        denom = np.outer(vn, vn)
        with np.errstate(divide="ignore", invalid="ignore"):
            cos = np.where(denom != 0.0, (m @ m.T) / denom, -np.inf)
        nrow = len(pdf)

        def exact_at(flat_ix: int) -> float:
            i, j = divmod(flat_ix, nrow)
            acc = 0.0
            for a, b in zip(m[i], m[j]):
                acc += a * b
            return acc / (vn[i] * vn[j])

        qi = np_quantize_q4(cos, exact_at)
        ia, ib = np.nonzero(np.triu(qi >= thr_i, k=1))
        ids = pdf[id_col].to_numpy()
        return pd.DataFrame(
            {
                "id_a": ids[ia],
                "id_b": ids[ib],
                "cos_sim": qi[ia, ib] / 10_000.0,
            }
        )

    return screen


def srp_near_dup_pairs(
    vectors: DataFrame,
    planes: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    *,
    threshold: float = 0.9,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
    cap_observation=None,
    cap_strategy: str = "window",
    pair_screen: str = "auto",
) -> DataFrame:
    """Embedding-cosine near-dup PAIRS blocked by an SRP-LSH bucket —
    the corpus-scale face of semantic dedup (promoted in round 9 from
    the inline registry code in plans/dedup_queries.py so it carries
    the same ``max_bucket`` cohort guard as every other pair miner).

    ``planes`` is DataFrame[plane_id, plane_emb] — P hyperplanes,
    driver-small, inlined as literals: bucketing is ONE scan-side
    projection (P sign-of-dot bits per row), the candidate join is an
    EQUI-join on the P-bit bucket string, and the expected bucket
    population is N / 2^P. At 100 TB you scale P ~ log2(N / target)
    (cheap: per-row cost is O(P * d), no shuffle) where k-means
    assignment cost O(N * k * d) forces ``semantic_dedup``'s k to stay
    moderate — use THIS miner when the cluster count the corpus needs
    would dwarf the centroid budget, and `semantic_dedup` when you
    want the cluster structure itself (SemDeDup's quality screen).

    Returns DataFrame[id_a, id_b, cos_sim double] with ``id_a <
    id_b`` and quantized ``cos_sim >= threshold``.

    ``pair_screen="auto"`` (default, round 13) measures the bucket
    size distribution with one bounded partial agg at build time and
    picks the regime-correct screen (dedup.choose_pair_screen — mean
    surviving bucket size vs the measured crossover; SRP buckets run
    ~N/2^P members, so natural corpora resolve to "blas").
    ``"blas"`` (requires a finite ``max_bucket``): groups are bounded
    after the cap (every surviving bucket ≤ max_bucket rows; under
    "slice", every (bucket, _slice) ≤ max_bucket+1), so qualifying
    pairs are emitted straight from one Gram matmul per group
    (:func:`_blas_pair_screen`) — no per-pair enumeration, no
    per-pair HOF dot. ``"join"`` is the enumerate-and-fold A/B arm,
    and the only legal screen under ``max_bucket=None`` (unbounded
    buckets — the oracle-parity path, which therefore stays
    oracle-gated on the join form; auto resolves to it there).
    """
    if not 0.0 <= threshold <= 1.0:
        raise ValueError(f"threshold must be in [0, 1], got {threshold}")
    if pair_screen not in ("blas", "join", "auto"):
        raise ValueError(
            f"pair_screen must be 'blas', 'join' or 'auto', got {pair_screen!r}"
        )
    from mapreduce_implementation_spark.functions.vectors import dot, norm
    from mapreduce_implementation_spark.operators.dedup import (
        _counts_with_stats,
        cap_buckets,
        choose_pair_screen,
        spread,
    )

    # Norm computed once per VECTOR (map-side), not twice per pair —
    # same bits (sqrt of the same left fold, same denominator
    # product), one dot fold per candidate instead of three.
    bucketed = sim._with_buckets(
        spread(vectors), planes, id_col, emb_col, keep_emb=True
    ).withColumn("_vn", norm(F.col(emb_col)))
    counts = None
    has_oversized = None
    if pair_screen == "auto":
        if max_bucket is None:
            pair_screen = "join"
        else:
            # ONE corpus-scale counts job (round-14 verdict item 1):
            # the checkpointed (bucket, count) frame answers the screen
            # decision here AND feeds the cap/slice detection below —
            # previously the decision agg and the cap/slice stage each
            # re-scanned the bucketed corpus.
            counts, (sr, sg, br) = _counts_with_stats(
                bucketed.select("bucket"), ("bucket",), max_bucket
            )
            has_oversized = br > 0
            pair_screen = choose_pair_screen(
                sr, sg, br, max_bucket, cap_strategy == "slice"
            )
    # cap ONCE and alias both sides (same shape as the minhash miner):
    # with an observation the oversized list is eagerly materialized,
    # so the shared subtree is AQE-safe, and without one the two sides
    # stay sameResult for exchange reuse. cap_strategy="slice" mines
    # oversized buckets within max_bucket-sized slices instead of
    # dropping them (dedup.slice_buckets) — here ordered by the same
    # deterministic projection semantic_dedup's slice arm uses, so
    # near-identical vectors sort adjacent within their bucket.
    if cap_strategy == "slice":
        from mapreduce_implementation_spark.operators.dedup import (
            slice_buckets,
        )

        bucketed = slice_buckets(
            bucketed.withColumn(
                "_proj", _slice_projection(F.col(emb_col))
            ),
            ("bucket",),
            max_bucket,
            id_col,
            cap_observation,
            order_cols=("_proj",),
            counts=counts,
            has_oversized=has_oversized,
        ).drop("_proj")
        slice_eq = F.col("a._slice") == F.col("b._slice")
    else:
        bucketed = cap_buckets(
            bucketed, ("bucket",), max_bucket, cap_observation,
            strategy=cap_strategy,
            counts=counts if cap_strategy != "representative" else None,
            keys_nonnull=True,  # SRP buckets are bit strings, never NULL
        )
        slice_eq = F.lit(True)
    if pair_screen == "blas" and max_bucket is not None:
        from pyspark.sql import types as T

        group_cols = (
            ["bucket", "_slice"] if cap_strategy == "slice" else ["bucket"]
        )
        id_type = bucketed.schema[id_col].dataType
        out_schema = T.StructType(
            [
                T.StructField("id_a", id_type),
                T.StructField("id_b", id_type),
                T.StructField("cos_sim", T.DoubleType()),
            ]
        )
        return (
            bucketed.select(id_col, emb_col, "_vn", *group_cols)
            .groupBy(*group_cols)
            .applyInPandas(
                _blas_pair_screen(id_col, emb_col, threshold), out_schema
            )
        )
    a, b = bucketed.alias("a"), bucketed.alias("b")
    cand = a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        & slice_eq,
    ).select(
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"),
        F.col(f"a.{emb_col}").alias("_ea"),
        F.col(f"b.{emb_col}").alias("_eb"),
        (F.col("a._vn") * F.col("b._vn")).alias("_denom"),
    )
    cos_q = F.when(
        F.col("_denom") != 0, dot(F.col("_ea"), F.col("_eb")) / F.col("_denom")
    ).cast(sim.COS_Q)
    # Plain .where(): Catalyst fuses the score into the bucket join's
    # condition, so scoring parallelism follows the (spread) input —
    # see semantic_dedup for the fusion note.
    return (
        cand.select("id_a", "id_b", cos_q.alias("cos_sim"))
        .where(F.col("cos_sim") >= F.lit(threshold).cast(sim.COS_Q))
        .withColumn("cos_sim", F.col("cos_sim").cast("double"))
    )


def srp_bucketed_frame(
    vectors: DataFrame,
    planes: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """The COMMITTED-side SRP artifact: ``DataFrame[id_col, emb_col,
    _vn, bucket]`` — bucket bits and the L2 norm precomputed once per
    corpus snapshot instead of once per probing micro-batch.

    Written as a bucketed catalog table on ``bucket``
    (sources/bucketed.write_bucketed_table), every later
    ``srp_cross_near_dup(..., ref_bucketed=spark.table(name))`` probe
    joins the committed side with ZERO exchanges — the same
    build-once/probe-many layout as minhash_banded_frame. The planes
    are the index contract: store them with the table and bucket every
    probe batch with the SAME planes."""
    from mapreduce_implementation_spark.functions.vectors import norm
    from mapreduce_implementation_spark.operators.dedup import spread

    return sim._with_buckets(
        spread(vectors), planes, id_col, emb_col, keep_emb=True
    ).withColumn("_vn", norm(F.col(emb_col)))


def srp_cross_near_dup(
    new_vectors: DataFrame,
    ref_vectors: DataFrame | None = None,
    planes: DataFrame | None = None,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    *,
    threshold: float = 0.9,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
    cap_observation=None,
    ref_bucketed: DataFrame | None = None,
    cap_strategy: str = "representative",
    n_representatives: int = 1,
) -> DataFrame:
    """Embedding near-dup pairs BETWEEN two vector sets — the
    incremental-ingest face of ``srp_near_dup_pairs``, completing the
    cross-set family (MinHash / SimHash / embedding; see
    operators/dedup.py:919,973): which NEW vectors are semantic
    near-twins of the COMMITTED corpus.

    Same SRP bucketing as the in-set miner, but new × reference
    instead of a self-join: candidate volume scales with |new batch| ×
    bucket occupancy, never the corpus square. Both sides must be
    bucketed with the SAME ``planes`` (store them with the corpus
    snapshot — they are the index contract, like the IVF centroids).
    ``max_bucket`` caps REFERENCE bucket size (a degenerate committed
    cohort would multiply every matching new vector by the whole
    cohort). Each vector lives in exactly one bucket, so pairs are
    naturally distinct — no dedup pass.

    Returns DataFrame[new_id, ref_id, cos_sim double] with quantized
    ``cos_sim >= threshold``; a new vector with NO qualifying row is
    genuinely novel.

    ``ref_bucketed`` (instead of ``ref_vectors``): a precomputed
    :func:`srp_bucketed_frame` — normally a BUCKETED catalog table on
    ``bucket``. The recurring-probe configuration: the committed side
    contributes zero exchanges per batch (bucket join and the
    ``max_bucket`` detection groupBy both ride the table's bucketing)
    and its norms are read, not recomputed. Plan-gated in
    tests/test_streaming_pipeline.py. An SQ8-committed table
    (``commit_srp_reference(quantize="int8")``) is sniffed by its
    code column and scored DIRECTLY — cosine is scale-invariant and
    the table's ``_vn`` is the code norm, so the probe reads ~4× fewer
    reference bytes with no dequantization step; flag parity vs the
    float layout is bounded by the quantization noise (pinned in
    tests/test_streaming_pipeline.py).
    """
    if not 0.0 <= threshold <= 1.0:
        raise ValueError(f"threshold must be in [0, 1], got {threshold}")
    if (ref_vectors is None) == (ref_bucketed is None):
        raise ValueError("pass exactly one of ref_vectors / ref_bucketed")
    if planes is None:
        # always needed: the NEW batch is bucketed here even when the
        # committed side comes precomputed
        raise ValueError("planes are required (they bucket the new batch)")
    from mapreduce_implementation_spark.functions.vectors import dot, norm
    from mapreduce_implementation_spark.operators.dedup import (
        _validate_rep_params,
        cap_buckets,
        spread,
    )

    _validate_rep_params(cap_strategy, n_representatives)

    def rename(df: DataFrame, out_id: str) -> DataFrame:
        # layout sniff (round 14): an SQ8-committed reference carries
        # codes instead of floats; its _vn is already the code norm
        vec = sim.SQ8_CODE_COL if sim.SQ8_CODE_COL in df.columns else emb_col
        return df.select(
            F.col(id_col).alias(out_id),
            F.col(vec).alias(f"_e_{out_id}"),
            F.col("_vn").alias(f"_vn_{out_id}"),
            "bucket",
        )

    def bucketed(df: DataFrame, out_id: str) -> DataFrame:
        return rename(srp_bucketed_frame(df, planes, id_col, emb_col), out_id)

    bn = bucketed(new_vectors, "new_id")
    br = cap_buckets(
        rename(ref_bucketed, "ref_id")
        if ref_bucketed is not None
        else bucketed(ref_vectors, "ref_id"),
        ("bucket",),
        max_bucket,
        cap_observation,
        strategy=cap_strategy,
        **(
            {
                "rep_id_col": "ref_id",
                "n_representatives": n_representatives,
                "rep_stratum_col": "_e_ref_id",
            }
            if cap_strategy == "representative"
            else {}
        ),
    )
    cand = bn.join(br, "bucket").select(
        "new_id",
        "ref_id",
        (F.col("_vn_new_id") * F.col("_vn_ref_id")).alias("_denom"),
        "_e_new_id",
        "_e_ref_id",
    )
    cos_q = F.when(
        F.col("_denom") != 0,
        dot(F.col("_e_new_id"), F.col("_e_ref_id")) / F.col("_denom"),
    ).cast(sim.COS_Q)
    return (
        cand.select("new_id", "ref_id", cos_q.alias("cos_sim"))
        .where(F.col("cos_sim") >= F.lit(threshold).cast(sim.COS_Q))
        .withColumn("cos_sim", F.col("cos_sim").cast("double"))
    )


def planes_fingerprint(planes: DataFrame) -> str:
    """Deterministic md5 over the (plane_id, values) set — the SRP
    index-contract check: a committed reference table stores this
    fingerprint (commit_srp_reference), and every probe that buckets
    with DIFFERENT planes would silently match nothing, so the ingest
    starter compares fingerprints up front and refuses loudly."""
    import hashlib

    rows = sorted(
        (
            (int(r.plane_id), [float(x) for x in r.plane_emb])
            for r in planes.select("plane_id", "plane_emb").collect()
        ),
        key=lambda t: t[0],
    )
    return hashlib.md5(repr(rows).encode()).hexdigest()
