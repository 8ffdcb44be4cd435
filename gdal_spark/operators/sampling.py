"""Deterministic corpus sampling / mixture weighting.

Training-data pipelines assemble corpora as weighted mixtures — "keep
30% of language X, 2.7 epochs of source Y" (GPT-3 appendix A tables,
The Pile, Gopher's MassiveText mixing). At 10^12 documents the sample
decision must be a pure function of the ROW, never of partitioning,
ordering, or an RNG stream: this module derives a uniform in [0, 1)
from ``xxhash64(id, seed)`` entirely in whole-stage codegen, so the
same row is kept (or repeated) in every run, on any cluster layout —
and a different ``seed`` draws an independent sample.

Spark's built-in ``DataFrame.sample`` is NOT that: it is seeded
per-partition, so a repartition changes which rows survive.

Scale shape: zero shuffles. ``weighted_sample`` is a filter;
``weighted_mixture`` adds one JVM ``explode(sequence(...))`` for
epoch upsampling (a row with weight 2.7 emits 2 or 3 copies — exactly
2 + Bernoulli(0.7), decided by the same hash). Both stay inside one
codegen stage over the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _unit(id_col, seed: int):
    """Deterministic uniform in [0, 1) per row: top 53 bits of
    xxhash64(id, seed-salted) — same construction as the fixture
    generator (testdata._unit), JVM-side."""
    h = F.xxhash64(F.col(id_col), F.lit(int(seed)))
    return (
        F.shiftrightunsigned(h, 11).cast("double") / float(1 << 53)
    )


def _md5_key(id_col, seed: int):
    """13 lowercase hex digits of md5(id ':' seed): a fixed-width
    string whose LEXICOGRAPHIC order equals its numeric order, and
    which every engine with a standard md5() reproduces bit-for-bit
    (the cross-engine hash — DuckDB, Trino, Spark all agree), so the
    driver's SQL oracle can verify the sample decision value-exactly."""
    return F.substring(
        F.md5(F.concat(F.col(id_col).cast("string"),
                       F.lit(f":{int(seed)}"))), 1, 13
    )


def _hex_threshold(rate: float) -> str:
    """rate in [0,1] → the 13-hex-digit cut so that
    P(md5_key < cut) = rate exactly over uniform keys. rate=1.0 maps
    above every key ('g' > 'f' lexicographically)."""
    if rate >= 1.0:
        return "g"
    return format(int(rate * (16 ** 13)), "013x")


def _rate_expr(rates: dict, key_col: str, default: float):
    expr = F.lit(float(default))
    for k, v in rates.items():
        expr = F.when(F.col(key_col) == k, F.lit(float(v))).otherwise(expr)
    return expr


def weighted_sample(
    df: DataFrame,
    rates: dict,
    key_col: str = "lang",
    id_col: str = "url",
    seed: int = 0,
    default_rate: float = 0.0,
    hash: str = "xxhash64",
) -> DataFrame:
    """Keep each row iff its deterministic uniform < its group's rate
    (all rates in [0, 1]). Rows whose key is absent from ``rates``
    use ``default_rate`` (0 = drop unlisted groups).

    ``hash='xxhash64'`` (default) is the scale path; ``hash='md5'``
    derives the decision from standard md5 hex so any SQL engine
    reproduces it (the oracle-checkable variant — same semantics,
    slower hash).

    Pure codegen filter — no shuffle, no RNG state, repartition-proof.
    """
    for k, v in rates.items():
        if not 0.0 <= float(v) <= 1.0:
            raise ValueError(f"rate for {k!r} must be in [0,1], got {v}")
    if hash == "xxhash64":
        return df.filter(
            _unit(id_col, seed) < _rate_expr(rates, key_col, default_rate)
        )
    if hash != "md5":
        raise ValueError(f"hash must be 'xxhash64' or 'md5', got {hash!r}")
    key = _md5_key(id_col, seed)
    cond = key < F.lit(_hex_threshold(float(default_rate)))
    for k, v in rates.items():
        cond = F.when(
            F.col(key_col) == k, key < F.lit(_hex_threshold(float(v)))
        ).otherwise(cond)
    return df.filter(cond)


def weighted_mixture(
    df: DataFrame,
    weights: dict,
    key_col: str = "lang",
    id_col: str = "url",
    seed: int = 0,
    default_weight: float = 0.0,
    epoch_col: str = "epoch",
    hash: str = "xxhash64",
) -> DataFrame:
    """Mixture with epoch upsampling: weight w emits ``floor(w)``
    copies of every row plus one more with probability ``w - floor(w)``
    (decided by the row's deterministic uniform), i.e. E[copies] = w
    and the count per row is exact, not sampled, for integer w — the
    '2.7 epochs of Wikipedia' mixing rule. Copies are numbered in
    ``epoch_col`` (0-based) so downstream shuffles can decorrelate
    them. ``hash`` as in :func:`weighted_sample`.

    One ``explode(sequence(...))`` in codegen; no shuffle."""
    for k, v in weights.items():
        if float(v) < 0.0:
            raise ValueError(f"weight for {k!r} must be >= 0, got {v}")
    w = _rate_expr(weights, key_col, default_weight)
    if hash == "xxhash64":
        extra = F.when(
            _unit(id_col, seed) < (w - F.floor(w)), F.lit(1)
        ).otherwise(F.lit(0))
    elif hash == "md5":
        key = _md5_key(id_col, seed)

        def frac_hit(weight: float):
            return key < F.lit(_hex_threshold(weight - int(weight)))

        extra_cond = frac_hit(float(default_weight))
        for k, v in weights.items():
            extra_cond = F.when(
                F.col(key_col) == k, frac_hit(float(v))
            ).otherwise(extra_cond)
        extra = F.when(extra_cond, F.lit(1)).otherwise(F.lit(0))
    else:
        raise ValueError(f"hash must be 'xxhash64' or 'md5', got {hash!r}")
    copies = F.floor(w).cast("long") + extra
    return (
        df.withColumn("__n_copies", copies)
        .filter(F.col("__n_copies") > 0)
        .withColumn(
            epoch_col,
            F.explode(F.sequence(F.lit(0), F.col("__n_copies") - 1)),
        )
        .drop("__n_copies")
    )


def sample_by_rate(
    df: DataFrame,
    rate_col,
    id_col: str = "doc_id",
    seed: int = 0,
    max_rate: float = 1.0,
) -> DataFrame:
    """Per-ROW acceptance sampling: keep each row with probability
    ``rate_col / max_rate`` (a Column or column name computed
    upstream), decided by the same repartition-proof hash uniform as
    :func:`weighted_sample`.

    This is the IMPORTANCE-RESAMPLING primitive (DSIR, Xie et al.
    2023: weight = target-LM likelihood / source-LM likelihood;
    CCNet's perplexity-bucket subsampling): compose
    ``operators.lm.score_perplexity*`` into a weight column, then
    one codegen filter draws the reweighted corpus — zero shuffles,
    deterministic under any layout, seed-swappable for independent
    draws. Rows with NULL or non-positive rate drop."""
    rate = F.col(rate_col) if isinstance(rate_col, str) else rate_col
    u = _unit(id_col, seed)
    return df.filter(
        rate.isNotNull() & (rate > 0)
        & (u < rate / F.lit(float(max_rate)))
    )
