"""One-call corpus pre-flight calibrator (round-13 verdict item 8):
compose the measurement tools — ``profile.skew_report``,
``dedup.miner_recall_probe``, ``dedup.cross_miner_recall_probe``,
``textstats.quality_threshold_for_retention`` — into a single
``calibrate_corpus(df)`` that a new 100 TB corpus runs BEFORE the
first full dedup/filter pass, returning the recommended knobs WITH
their measured recall/retention instead of four manual calls.

Cost envelope (deliberate): one full-corpus t-digest pass for the
quality floor, one banded partial-agg pass for the bucket-skew top-N,
and three bounded TakeOrdered samples (the probes' frozen samples) —
everything else is sample-sized. No collect is unbounded.

The reference engine (a WordCount MapReduce) has no calibration
surface; this belongs to the LLM-training-data extension set
(SURVEY.md §2c), built from the probes rounds 10-12 measured
one-by-one (BASELINE.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mapreduce_implementation_spark.operators.dedup import (
    DEFAULT_MAX_BUCKET,
    cross_miner_recall_probe,
    miner_recall_probe,
    minhash_cross_near_dup,
    minhash_near_dup_pairs,
    minhash_signatures,
)


def calibrate_corpus(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_fraction: float = 0.7,
    threshold: float = 0.5,
    shingle_n: int = 3,
    k: int = 16,
    bands: int = 4,
    rows: int = 4,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
    cap_strategy: str = "window",
    sig_hash: str = "md5",
    shingle_impl: str = "string",
    n_sample: int = 300,
    skew_top_n: int = 5,
    recall_floor: float = 0.8,
) -> dict:
    """Measure the production dedup/quality knobs on ``docs`` and
    return them as recommendations WITH their evidence::

        {
          "quality": {"floor", "keep_fraction", "sample_retention"},
          "minhash": {"k", "bands", "rows", "shingle_n", "threshold",
                       "pair_screen", "mean_bucket_size",
                       "recall", "precision", ...probe fields},
          "cross":   {"recall", "flag_recall", "precision", ...},
          "buckets": {"max_bucket", "top": [(band_id, band_hash,
                       n_rows, share), ...], "cap_bites"},
          "warnings": [...],
        }

    * quality floor: ``quality_threshold_for_retention`` (one t-digest
      corpus pass) targeting ``keep_fraction``; realized retention is
      re-measured on the bounded probe sample (``sample_retention``) so
      the number is evidence, not a promise.
    * in-set near-dup recall: ``miner_recall_probe`` running the REAL
      production miner (``minhash_near_dup_pairs`` at the given
      k/bands/rows/cap) against exact shingle-Jaccard truth on a
      frozen ``n_sample`` sample — recall folds blocking loss, cap
      loss and signature estimation error together (round-10 protocol,
      measured 0.918 on the Zipf rehearsal corpus).
    * cross-set ingest recall: ``cross_miner_recall_probe`` through the
      production chain (signatures → ``minhash_cross_near_dup`` with
      the representative cap) — ``flag_recall`` is the ingest decision
      metric (round-11: representative keeps it 1.0 where drop
      strategies lose entire cohorts).
    * bucket skew + screen regime: ONE (band key, count) pass over the
      banded frame, checkpointed, feeds both the top-N skew rows
      (``skew_report``'s output shape) and the ``pair_screen="auto"``
      decision with its evidence — ``cap_bites`` says whether any real
      bucket exceeds ``max_bucket`` (then the cap/slice strategy choice
      actually matters on THIS corpus), ``oversized_rows`` how much
      mass that policy decides over. ``cap_strategy`` (ADVICE r13) is
      the strategy the DEPLOYED miner will use — under ``"slice"`` the
      oversized mass is folded back into ~max_bucket-sized screen
      groups, which can flip the join/blas decision, so the report's
      ``pair_screen`` matches what ``minhash_near_dup_pairs`` at the
      same strategy actually picks. The raw distribution moments ride
      along as ``minhash.screen_stats`` so a miner handed this report
      (``calibration=``) re-derives the decision for ANY strategy with
      zero Spark jobs.

    ``warnings`` flags recall under ``recall_floor`` (raise ``k``),
    empty-truth samples (corpus too sparse to probe — synthesize or
    plant, as the round-10 note records), and a biting cap. The
    returned knob values are the measured production defaults; pytest
    pins them against the hand-derived round-10/11 values on the
    rehearsal corpus (tests/test_corpus_api.py)."""
    from mapreduce_implementation_spark.functions.textstats import (
        quality_score,
        quality_threshold_for_retention,
    )
    from mapreduce_implementation_spark.operators.dedup import (
        _group_size_stats,
        _minhash_banded,
        choose_pair_screen,
    )
    if not 0.0 < keep_fraction <= 1.0:
        raise ValueError(f"keep_fraction must be in (0, 1], got {keep_fraction}")
    if cap_strategy not in ("window", "antijoin", "representative", "slice"):
        raise ValueError(f"unknown cap strategy {cap_strategy!r}")
    warnings: list[str] = []

    # 1) quality floor from the retention target (t-digest corpus pass)
    floor = quality_threshold_for_retention(
        docs, keep_fraction, text_col=text_col
    )
    sample = (
        docs.where(F.col(text_col).isNotNull())
        .select(F.col(id_col), F.col(text_col))
        .orderBy(F.xxhash64(F.col(id_col), F.lit("calibrate")), F.col(id_col))
        .limit(n_sample)
        .localCheckpoint(eager=True)
    )
    srow = sample.select(
        F.count(F.lit(1)).alias("n"),
        F.count_if(quality_score(text_col) >= floor).alias("kept"),
    ).first()
    retention = (srow.kept / srow.n) if srow.n else None

    # 2) in-set miner recall at the production knobs
    def miner(s: DataFrame) -> DataFrame:
        return minhash_near_dup_pairs(
            s, id_col, text_col, shingle_n=shingle_n, k=k, bands=bands,
            rows=rows, threshold=threshold, max_bucket=max_bucket,
            sig_hash=sig_hash, shingle_impl=shingle_impl,
        )

    inset = miner_recall_probe(
        docs, miner, id_col=id_col, text_col=text_col, n_sample=n_sample,
        threshold=threshold, shingle_n=shingle_n,
    )

    # 3) cross-set ingest recall through the production chain
    def cross(new: DataFrame, ref: DataFrame) -> DataFrame:
        new_sigs = minhash_signatures(
            new, id_col, text_col, shingle_n=shingle_n, k=k,
            hash=sig_hash, shingle_impl=shingle_impl,
        )
        ref_sigs = minhash_signatures(
            ref, id_col, text_col, shingle_n=shingle_n, k=k,
            hash=sig_hash, shingle_impl=shingle_impl,
        )
        return minhash_cross_near_dup(
            new_sigs, ref_sigs, k=k, bands=bands, rows=rows,
            threshold=threshold, max_bucket=max_bucket,
            cap_strategy="representative",
        )

    crossr = cross_miner_recall_probe(
        docs, cross, id_col=id_col, text_col=text_col, n_sample=n_sample,
        threshold=threshold, shingle_n=shingle_n,
    )

    # 4+5) band-bucket skew AND the screen regime from ONE counts pass
    # (review r13b: the corpus-scale md5/shingle/band chain is the
    # dominant cost here — count the buckets once, checkpoint the
    # (key, count) frame on the executors, and derive both the top-N
    # skew rows and the pair_screen="auto" decision from it)
    banded = _minhash_banded(
        minhash_signatures(
            docs, id_col, text_col, shingle_n=shingle_n, k=k,
            hash=sig_hash, shingle_impl=shingle_impl,
        ),
        "doc_id", bands, rows,
    )
    counts = (
        banded.groupBy("band_id", "band_hash")
        .agg(F.count(F.lit(1)).alias("_n"))
        .localCheckpoint(eager=True)
    )
    total_rows = counts.agg(F.sum("_n")).first()[0] or 0
    top = [
        (int(r.band_id), str(r.band_hash), int(r._n), float(r._n) / total_rows)
        for r in counts.orderBy(
            F.col("_n").desc(), "band_id", "band_hash"
        ).limit(skew_top_n).collect()
    ]
    cap_bites = bool(
        max_bucket is not None and top and top[0][2] > max_bucket
    )

    # screen regime: the pair_screen="auto" decision plus its evidence
    # (mean surviving bucket size vs the measured AUTO_SCREEN_MIN_MEAN
    # crossover; oversized_rows = the mass the cap/slice policy decides
    # over) — tiny aggs over the checkpointed counts, no second corpus
    # pass
    if max_bucket is not None:
        small_rows, small_groups, big_rows = _group_size_stats(
            banded, ("band_id", "band_hash"), max_bucket, counts=counts
        )
        screen = choose_pair_screen(
            small_rows, small_groups, big_rows, max_bucket,
            cap_strategy == "slice",
        )
        mean_bucket = (
            round(small_rows / small_groups, 2) if small_groups else None
        )
        screen_stats = {
            "small_rows": int(small_rows),
            "small_groups": int(small_groups),
            "big_rows": int(big_rows),
        }
    else:
        screen, mean_bucket, big_rows = "join", None, 0
        screen_stats = None

    if inset["true_pairs"] == 0:
        warnings.append(
            "in-set probe sampled ZERO true pairs — the corpus's "
            "near-dups are too sparse for a bounded sample (round-10 "
            "note); probe a planted/synthetic corpus for the recall "
            "number"
        )
    elif inset["recall"] is not None and inset["recall"] < recall_floor:
        warnings.append(
            f"in-set recall {inset['recall']:.3f} < {recall_floor}: "
            f"signature estimation too coarse at threshold "
            f"{threshold} — raise k (linear signature cost)"
        )
    if crossr["true_pairs"] and (
        crossr.get("flag_recall") is not None
        and crossr["flag_recall"] < recall_floor
    ):
        warnings.append(
            f"cross-set flag recall {crossr['flag_recall']:.3f} < "
            f"{recall_floor}: raise n_representatives on the ingest cap"
        )
    if cap_bites:
        warnings.append(
            f"max_bucket={max_bucket} BITES (top bucket "
            f"{top[0][2]} rows): choose the oversized-mass policy "
            "deliberately — slice mines it, window/antijoin drop it, "
            "representative keeps one row (telemetry prices each)"
        )

    return {
        "quality": {
            "floor": floor,
            "keep_fraction": keep_fraction,
            "sample_retention": retention,
        },
        "minhash": {
            "k": k, "bands": bands, "rows": rows,
            "shingle_n": shingle_n, "threshold": threshold,
            # the signature FAMILY the distribution was measured under
            # (ADVICE r14): a build at a different sig_hash/shingle_impl
            # has different band-bucket counts, so the miner's knob
            # check raises on mismatch like the structural knobs
            "sig_hash": sig_hash, "shingle_impl": shingle_impl,
            "max_bucket": max_bucket, "cap_strategy": cap_strategy,
            "pair_screen": screen, "mean_bucket_size": mean_bucket,
            "oversized_rows": int(big_rows),
            "screen_stats": screen_stats,
            **inset,
        },
        "cross": {"cap_strategy": "representative", **crossr},
        "buckets": {
            "max_bucket": max_bucket, "top": top, "cap_bites": cap_bites,
        },
        "warnings": warnings,
    }
