"""Text-analysis expressions: token counting, quality scoring, language
ID, document fingerprinting.

These are the training-data-pipeline primitives (BASELINE.json north
star). Everything is a Column expression — the 100 TB path is a single
scan-stage projection per document, no shuffle, no Python.

Design notes for oracle parity (the driver hash-compares against DuckDB):
* hashes use md5 (identical hex output in Spark and DuckDB);
* ratios use integer counts divided as doubles (same rounding both
  sides); no float accumulation order dependence anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from mapreduce_implementation_spark.functions.text import tokens, word_ngrams

# Tiny embedded stopword lists — enough for a deterministic n-gram/stopword
# language heuristic; NOT a linguistic claim. Keep sorted & lowercase.
STOPWORDS = {
    "en": ("a", "and", "are", "as", "at", "be", "but", "by", "for", "if",
           "in", "is", "it", "not", "of", "on", "or", "the", "to", "with"),
    "de": ("aber", "als", "auch", "auf", "aus", "bei", "das", "der", "die",
           "ein", "eine", "für", "ist", "mit", "nicht", "sich", "sie",
           "und", "von", "zu"),
    "fr": ("au", "avec", "ce", "dans", "de", "des", "du", "elle", "en",
           "est", "et", "il", "la", "le", "les", "ne", "pas", "pour",
           "que", "un"),
    "es": ("al", "como", "con", "de", "del", "el", "en", "es", "la", "las",
           "lo", "los", "no", "para", "por", "que", "se", "un", "una", "y"),
}


def _lower_tokens(text: Column | str) -> Column:
    col = F.col(text) if isinstance(text, str) else text
    return tokens(F.lower(col), mode="simple")


def token_count(text: Column | str) -> Column:
    """Whitespace token count (long)."""
    return F.size(_lower_tokens(text)).cast("long")


def bpe_ish_token_count(text: Column | str) -> Column:
    """BPE-flavored token estimate: count of letter-runs, digits, and
    punctuation marks — the granularity a byte-pair tokenizer roughly
    lands at for Latin text. Pure regexp count (long)."""
    col = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(col, F.lit(r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]")).cast("long")


def stopword_hits(text: Column | str, lang: str = "en") -> Column:
    """Number of tokens that are stopwords of ``lang`` (long)."""
    stops = [F.lit(s) for s in STOPWORDS[lang]]
    return F.size(
        F.filter(_lower_tokens(text), lambda t: t.isin(*[s for s in STOPWORDS[lang]]))
    ).cast("long")


def top_token_count(toks: Column) -> Column:
    """Occurrence count of the single most frequent token — the core
    repetition signal (Gopher-style repetition rules threshold on its
    fraction). Computed as the longest run of a SORTED copy via one
    ``aggregate`` fold: O(n log n) per document, where the obvious
    distinct×filter formulation is O(n·d) — quadratic on the repetitive
    documents this signal exists to catch. The DuckDB twin deliberately
    uses that quadratic distinct-count form: an independent formulation
    of the same number is a stronger oracle than a replay."""
    acc0 = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
    )

    def step(acc: Column, t: Column) -> Column:
        # NULL prev (first element) compares NULL -> otherwise -> run=1
        run = F.when(t == acc["prev"], acc["run"] + 1).otherwise(
            F.lit(1).cast("long")
        )
        return F.struct(
            t.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    return F.aggregate(F.array_sort(toks), acc0, step, lambda a: a["best"])


def quality_features(
    text: Column | str, toks: Column | None = None
) -> dict[str, Column]:
    """The standard cheap quality signals as named expressions.

    Pass ``toks`` (a pre-projected token-array COLUMN) on hot paths:
    Catalyst does not common-subexpression-eliminate the split+filter
    when it is inlined into several output columns, so without it the
    tokenizer reruns once per feature (~8× per row here). A two-step
    projection — ``withColumn("_toks", …)`` then features over
    ``F.col("_toks")`` — evaluates it once (CollapseProject keeps the
    projections separate when the alias has multiple references)."""
    col = F.col(text) if isinstance(text, str) else text
    n_chars = F.length(col).cast("long")
    if toks is None:
        toks = _lower_tokens(col)
    n_tokens = F.size(toks).cast("long")
    n_alpha = F.regexp_count(col, F.lit(r"[A-Za-z]")).cast("long")
    n_punct = F.regexp_count(col, F.lit(r"[^A-Za-z0-9\s]")).cast("long")
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS["en"]))).cast("long")
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "alpha_ratio": (n_alpha.cast("double") / F.greatest(n_chars, F.lit(1))),
        "punct_ratio": (n_punct.cast("double") / F.greatest(n_chars, F.lit(1))),
        "stopword_ratio": (n_stop.cast("double") / F.greatest(n_tokens, F.lit(1))),
        "mean_token_len": (
            F.aggregate(toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)).cast("double")
            / F.greatest(n_tokens, F.lit(1))
        ),
        # Repetition signals (Gopher-style). Reported, not folded into
        # quality_score: the score's weights are pinned by downstream
        # oracles (pipeline quality floor); repetition thresholds are
        # the caller's drop policy.
        "distinct_token_ratio": (
            F.size(F.array_distinct(toks)).cast("double")
            / F.greatest(n_tokens, F.lit(1))
        ),
        "top_token_frac": (
            top_token_count(toks).cast("double")
            / F.greatest(n_tokens, F.lit(1))
        ),
    }


def quality_score_from(f: dict[str, Column]) -> Column:
    """The composite-score WEIGHTS, defined once over a feature
    mapping (needs n_tokens, mean_token_len, punct_ratio,
    stopword_ratio). Callers that already PROJECT the features as
    columns should pass ``{k: F.col(k) …}`` — a projection layer whose
    score reads the feature COLUMNS evaluates each feature once, where
    inlining quality_score next to the feature outputs re-evaluates
    the four shared expressions per row (no CSE across output columns;
    measured 1.12 s → 0.85 s on doc_quality at sf0.1)."""
    length_ok = (f["n_tokens"] >= 5) & (f["n_tokens"] <= 100000)
    mean_len_ok = (f["mean_token_len"] >= 2.0) & (f["mean_token_len"] <= 12.0)
    return (
        F.when(length_ok, F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when(mean_len_ok, F.lit(0.25)).otherwise(F.lit(0.0))
        + F.lit(0.25) * (F.lit(1.0) - F.least(f["punct_ratio"] * 4, F.lit(1.0)))
        + F.lit(0.25) * F.least(f["stopword_ratio"] * 4, F.lit(1.0))
    )


def quality_score(text: Column | str, toks: Column | None = None) -> Column:
    """Composite [0,1]-ish quality score (deterministic, documented
    weights; thresholds follow the usual Gopher-rules shape). Single-
    expression form; when the features are also being projected, use
    ``quality_score_from`` over the feature columns instead (see its
    docstring)."""
    return quality_score_from(quality_features(text, toks))


def langid(text: Column | str, toks: Column | None = None) -> Column:
    """Stopword-vote language guess over STOPWORDS languages.

    Per-language hit counts; argmax with deterministic tie-break on
    language code order ('de' < 'en' < 'es' < 'fr'); 'und' (undetermined)
    when no stopword hits at all. Pass a pre-projected ``toks`` column
    on hot paths (see quality_features)."""
    if toks is None:
        toks = _lower_tokens(text)

    def _hit_count(stops: tuple[str, ...]) -> Column:
        return F.size(F.filter(toks, lambda t: t.isin(*stops)))

    hits = {lang: _hit_count(stops) for lang, stops in STOPWORDS.items()}
    # struct(hits, negated-lang) max trick would invert codes; do explicit
    # greatest + first-match CASE for a deterministic, readable argmax.
    best = F.greatest(*hits.values())
    out = F.lit("und")
    for lang in sorted(STOPWORDS, reverse=True):
        out = F.when(hits[lang] == best, F.lit(lang)).otherwise(out)
    return F.when(best > 0, out).otherwise(F.lit("und"))


def content_hash(text: Column | str) -> Column:
    """md5 of whitespace-normalized lowercase text (exact-dedup key;
    identical semantics in DuckDB: md5(...)"""
    col = F.col(text) if isinstance(text, str) else text
    return F.md5(F.concat_ws(" ", _lower_tokens(col)).cast("binary"))


def doc_fingerprint(
    text: Column | str, shingle: int = 3, toks: Column | None = None
) -> Column:
    """Winnowing-style fingerprint: min md5 over word-``shingle``-grams.

    Documents sharing any minimal shingle hash collide — a cheap
    near-dup prefilter. Falls back to content_hash for short docs.
    Pass a pre-projected ``toks`` column on hot paths (see
    quality_features)."""
    if toks is None:
        toks = _lower_tokens(text)
    grams = word_ngrams(toks, shingle)
    min_md5 = F.array_min(F.transform(grams, lambda g: F.md5(g.cast("binary"))))
    return F.coalesce(min_md5, F.md5(F.concat_ws(" ", toks).cast("binary")))


def quality_gate(
    df,
    text_col: str = "text",
    min_quality: float | None = None,
    max_top_token_frac: float | None = None,
):
    """Scan-stage quality gating of a document DataFrame: drop NULL
    texts, apply the quality_score floor and the Gopher-style
    repetition cap. Lives HERE, next to its expression primitives, so
    both pipeline faces (operators/pipeline.build_training_corpus and
    streaming/pipeline.streaming_quality_gate) import the one
    definition without the batch face dragging in the full pipeline
    module. Pure stateless Column work — zero shuffle, streams as-is.

    The token array is projected ONCE and fed to every feature via the
    ``toks`` parameter (Catalyst does not CSE the inlined tokenizer —
    see quality_features; without the staging the regex split reruns
    ~8x per row, on the scan stage of a 100 TB corpus)."""
    if max_top_token_frac is not None and not 0.0 < max_top_token_frac <= 1.0:
        raise ValueError(
            f"max_top_token_frac must be in (0, 1], got {max_top_token_frac}"
        )
    out = df.where(F.col(text_col).isNotNull())
    if min_quality is None and max_top_token_frac is None:
        return out
    staged = out.withColumn("_qg_toks", _lower_tokens(text_col))
    toks = F.col("_qg_toks")
    keep = F.lit(True)
    if min_quality is not None:
        keep = keep & (quality_score(text_col, toks=toks) >= min_quality)
    if max_top_token_frac is not None:
        # empty docs have repetition frac 0 and pass (length policy
        # belongs to min_quality)
        keep = keep & (
            top_token_count(toks).cast("double")
            / F.greatest(F.size(toks).cast("long"), F.lit(1))
            <= max_top_token_frac
        )
    return staged.where(keep).drop("_qg_toks")


def frequent_tokens(df, text_col: str = "text", support: float = 0.01):
    """Approximate heavy-hitter tokens: every token whose corpus
    frequency exceeds ``support`` (fraction of all token occurrences),
    possibly with false positives — the one-sided guarantee of Spark's
    built-in misra-gries-style ``freqItems`` sketch (Karp et al.'s
    streaming frequent-items algorithm, public literature).

    Scale shape: ONE corpus pass, ZERO shuffles — each task folds its
    partition into an O(1/support) candidate map and the driver merges
    the per-task maps (classic mergeable-summary heavy hitters). The
    exact alternative (groupBy token → count → filter) shuffles every
    distinct token; use it only when exact counts are needed
    (plans/text_queries wordcount) — this is the profiling/monitoring
    path ("which tokens dominate this 100 TB corpus?").

    Returns DataFrame[token string] (collected sketch result as a
    local relation — size is O(1/support), tiny by construction).
    Verification contract (pytest): result ⊇ {tokens with frequency
    > support}; callers needing NO false positives re-count just the
    candidates (a filtered second pass, still cheaper than a full
    groupBy)."""
    if not 1e-4 <= support < 1:
        # Spark's freqItems itself rejects support < 1e-4 (sketch size
        # blows up as 1/support) — surface the bound here as a clean
        # ValueError instead of a raw JVM IllegalArgumentException
        raise ValueError(f"support must be in [1e-4, 1), got {support}")
    toks = df.select(
        F.explode(_lower_tokens(text_col)).alias("token")
    )
    hits = toks.freqItems(["token"], support).collect()[0][0]
    return df.sparkSession.createDataFrame(
        [(t,) for t in sorted(hits)], "token string"
    )


def token_stats_arrow(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    stop_lang: str = "en",
):
    """Fused per-document token-stat kernel (r17, guide §4.2): ONE
    mapInArrow pass computes every integer doc_quality feature input —
    ``n_chars, n_tokens, n_stop, tok_chars, n_distinct, top_cnt,
    n_alpha, n_punct`` — so the interpreted higher-order-function
    chain (tokenize split+filter, stopword filter, mean-token-len
    fold, array_distinct, array_sort + longest-run fold) never runs on
    the JVM. That chain is evaluated OUTSIDE whole-stage codegen and
    was both the dominant cost of doc_quality at scale and the
    JIT-lottery surface (BASELINE.md r15): measured interleaved
    min-of-3 at 1M synthetic docs, expr 24.24 s vs this kernel 1.97 s
    (12.3×); a wash at sf0.1 where the row is overhead-bound.

    Only integers cross the Python boundary back — the ratio/score
    arithmetic stays in the SAME JVM expressions as the expr form, so
    the float surface is untouched. Integer parity is replayed
    exactly, term by term:

    * tokenization: Spark ``split(lower(text), '\\s+')`` + drop-empties.
      Java ``\\s`` is ASCII-only ``[ \\t\\n\\x0B\\f\\r]`` — the RE2/
      Python patterns spell that class out (RE2's own ``\\s`` lacks
      ``\\x0B``).
    * lowercase: ``pc.ascii_lower`` on all-ASCII rows (bit-identical
      to UTF8String.toLowerCase's ASCII fast path); rows containing
      any non-ASCII byte take a per-row Python ``str.lower()``
      fallback — the same full Unicode case mapping Java
      ``toLowerCase`` applies on the non-locale-sensitive domain
      (pinned in tests/test_textstats_kernel.py on accented/sigma
      inputs).
    * ``n_chars``/``tok_chars`` count CODE POINTS (``pc.utf8_length``
      / Python ``len``) — Spark ``length()`` semantics.
    * ``n_alpha``/``n_punct``: vectorized RE2 ``count_substring_regex``
      with ``[A-Za-z]`` / ``[^A-Za-z0-9 \\t\\n\\x0B\\f\\r]`` (the
      Java ``[^A-Za-z0-9\\s]`` class, expanded).
    * ``n_distinct``/``top_cnt``: dictionary-encode the batch's token
      values, lexsort (code within doc) and run-length the segments —
      the vectorized equivalent of array_distinct size and the sorted
      longest-run fold.
    * NULL text → every stat NULL (the expr chain's NULL propagation);
      empty/whitespace-only text → 0 tokens, top_cnt 0 (the fold's
      acc0) — both pinned in the kernel test.

    Mixed batches scatter: ASCII rows ride the vectorized path,
    non-ASCII rows the exact fallback — a rare unicode doc cannot
    de-vectorize its whole batch. Returns DataFrame[id_col, n_chars,
    n_tokens, n_stop, tok_chars, n_distinct, top_cnt, n_alpha,
    n_punct] (all long)."""
    from pyspark.sql import types as T

    stop_words = tuple(STOPWORDS[stop_lang])
    # Java \s is ASCII [ \t\n\x0B\f\r]; spell it out for RE2 and re
    ws_class = " \\t\\n\\x0b\\f\\r"
    ws_re2 = f"[{ws_class}]+"
    punct_re2 = f"[^A-Za-z0-9{ws_class}]"

    in_df = df.select(F.col(id_col), F.col(text_col).alias("text"))
    id_field = in_df.schema[id_col]
    out_schema = T.StructType(
        [id_field]
        + [
            T.StructField(c, T.LongType(), True)
            for c in (
                "n_chars", "n_tokens", "n_stop", "tok_chars",
                "n_distinct", "top_cnt", "n_alpha", "n_punct",
            )
        ]
    )

    def gen(batches):
        import re

        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        ws_py = re.compile("[ \t\n\x0b\f\r]+")
        stop_arr = pa.array(list(stop_words), type=pa.string())
        stop_set = frozenset(stop_words)

        def slow_row(s):
            # exact per-row fallback for non-ASCII text: Python
            # str.lower == Java toLowerCase on the non-locale domain
            from collections import Counter

            toks = [t for t in ws_py.split(s.lower()) if t]
            c = Counter(toks)
            return (
                len(toks),
                sum(c[w] for w in stop_set if w in c),
                sum(map(len, toks)),
                len(c),
                max(c.values()) if c else 0,
            )

        for rb in batches:
            nrows = rb.num_rows
            if nrows == 0:
                continue
            ids = rb.column(0)
            texts = rb.column(1)
            valid = np.asarray(pc.is_valid(texts))
            # whole-column vectorized counters (RE2, code points)
            n_chars = pc.utf8_length(texts).cast(pa.int64())
            n_alpha = pc.count_substring_regex(
                texts, pattern="[A-Za-z]"
            ).cast(pa.int64())
            n_punct = pc.count_substring_regex(
                texts, pattern=punct_re2
            ).cast(pa.int64())

            n_tok = np.zeros(nrows, dtype=np.int64)
            n_stop = np.zeros(nrows, dtype=np.int64)
            tok_chars = np.zeros(nrows, dtype=np.int64)
            n_dist = np.zeros(nrows, dtype=np.int64)
            top = np.zeros(nrows, dtype=np.int64)

            is_ascii = np.asarray(pc.string_is_ascii(pc.fill_null(texts, "")))
            fast_ix = np.flatnonzero(valid & is_ascii)
            slow_ix = np.flatnonzero(valid & ~is_ascii)

            if len(fast_ix):
                sub = texts.take(pa.array(fast_ix))
                m = len(fast_ix)
                toks = pc.split_pattern_regex(
                    pc.ascii_lower(sub), pattern=ws_re2
                )
                lens = np.asarray(pc.list_value_length(toks)).astype(np.int64)
                flat = pc.list_flatten(toks)
                fl = np.asarray(pc.utf8_length(flat)).astype(np.int64)
                row_ids = np.repeat(np.arange(m, dtype=np.int64), lens)
                keep = fl > 0
                r = row_ids[keep]
                n_tok[fast_ix] = np.bincount(r, minlength=m)
                # float64 weights are exact for lengths < 2^53
                tok_chars[fast_ix] = np.bincount(
                    r, weights=fl[keep], minlength=m
                ).astype(np.int64)
                stop_mask = np.asarray(pc.is_in(flat, value_set=stop_arr))
                n_stop[fast_ix] = np.bincount(
                    row_ids[stop_mask & keep], minlength=m
                )
                if len(r):
                    codes = np.asarray(
                        pc.dictionary_encode(flat).indices
                    ).astype(np.int64)[keep]
                    order = np.lexsort((codes, r))
                    rs = r[order]
                    cs = codes[order]
                    starts = np.flatnonzero(
                        np.r_[True, (rs[1:] != rs[:-1]) | (cs[1:] != cs[:-1])]
                    )
                    run_len = np.diff(np.r_[starts, len(rs)])
                    run_row = rs[starts]
                    n_dist[fast_ix] = np.bincount(run_row, minlength=m)
                    row_starts = np.flatnonzero(
                        np.r_[True, run_row[1:] != run_row[:-1]]
                    )
                    tops = np.zeros(m, dtype=np.int64)
                    tops[run_row[row_starts]] = np.maximum.reduceat(
                        run_len, row_starts
                    )
                    top[fast_ix] = tops
            if len(slow_ix):
                sub = texts.take(pa.array(slow_ix)).to_pylist()
                for pos, i in enumerate(slow_ix):
                    (
                        n_tok[i], n_stop[i], tok_chars[i],
                        n_dist[i], top[i],
                    ) = slow_row(sub[pos])

            nulls = ~valid
            yield pa.RecordBatch.from_arrays(
                [
                    ids,
                    n_chars,
                    pa.Array.from_pandas(n_tok, mask=nulls, type=pa.int64()),
                    pa.Array.from_pandas(n_stop, mask=nulls, type=pa.int64()),
                    pa.Array.from_pandas(
                        tok_chars, mask=nulls, type=pa.int64()
                    ),
                    pa.Array.from_pandas(n_dist, mask=nulls, type=pa.int64()),
                    pa.Array.from_pandas(top, mask=nulls, type=pa.int64()),
                    n_alpha,
                    n_punct,
                ],
                names=[
                    id_col, "n_chars", "n_tokens", "n_stop", "tok_chars",
                    "n_distinct", "top_cnt", "n_alpha", "n_punct",
                ],
            )

    return in_df.mapInArrow(gen, out_schema)


def quality_threshold_for_retention(
    df,
    keep_fraction: float,
    text_col: str = "text",
    accuracy: int = 10_000,
) -> float:
    """Calibrate a ``quality_gate`` floor from a RETENTION target —
    the way production corpus specs are actually written ("keep the
    best 70%"), where a hand-picked absolute score floor drifts with
    every corpus mix change.

    One distributed pass: ``percentile_approx`` over the quality score
    (t-digest sketch — mergeable partials, bounded memory per
    partition, no sort, no collect of scores), returning the score at
    the (1 - keep_fraction) quantile. Feed it straight back:
    ``quality_gate(df, min_quality=threshold)`` keeps ≈ keep_fraction
    of non-NULL documents (approximation error bounded by the sketch
    ``accuracy``; ties at the threshold keep slightly more, never
    less, because the gate is >=). At 100 TB this is exactly one scan
    with a partial-agg shuffle of sketch partials — the naive
    alternative (global sort + row_number cutoff) is a corpus-wide
    sort."""
    if not 0.0 < keep_fraction <= 1.0:
        raise ValueError(
            f"keep_fraction must be in (0, 1], got {keep_fraction}"
        )
    staged = df.where(F.col(text_col).isNotNull()).withColumn(
        "_qt_toks", _lower_tokens(text_col)
    )
    row = staged.select(
        F.percentile_approx(
            quality_score(text_col, toks=F.col("_qt_toks")),
            F.lit(1.0 - keep_fraction),
            F.lit(accuracy),
        ).alias("t")
    ).collect()[0]
    return float(row["t"]) if row["t"] is not None else 0.0
