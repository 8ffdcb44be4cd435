"""N-gram language-model quality scoring — the CCNet-style
perplexity filter (Wenzek et al. 2020 trains KenLM and buckets web
pages by perplexity; the GPT-3 pipeline uses the same shape with a
quality classifier).

Model: interpolated "stupid backoff" (Brants et al. 2007 — "Large
Language Models in Machine Translation", built explicitly FOR
web-scale MapReduce counting): score(w | ctx) = count(ctx, w) /
count(ctx) when seen, else alpha * score(w | shorter ctx), ending at
the unigram MLE with add-one smoothing. No discounting state, so
TRAINING IS PURE COUNTING — the distributed-friendly property the
paper was designed around.

Two scoring paths, chosen by model size:
* :func:`score_perplexity_join` — the 100 TB path: documents explode
  to (doc_id, ngram) rows and JOIN the count tables on hashed gram
  keys; every stage is a co-partitioned shuffle, nothing ships to
  the driver or the closure, model size is unbounded.
* :func:`score_perplexity` — broadcast path for bounded models
  (top-``max_ngrams`` by count, like the BPE/median-cut caps): one
  Arrow kernel, zero joins.

Both paths produce identical log10 scores on the same model rows
(pinned in tests).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bpe import PRETOKEN_RE

ALPHA = 0.4  # Brants et al.'s backoff constant
SEP = "\u001f"  # gram-string joiner (unit separator)


def _tok_col(text_col: str, lowercase: bool = True):
    src = f"lower({text_col})" if lowercase else text_col
    sql_re = PRETOKEN_RE.replace("\\", "\\\\")
    return F.expr(f"regexp_extract_all({src}, '{sql_re}', 0)")


def ngram_counts(
    docs: DataFrame, n: int, text_col: str = "text"
) -> DataFrame:
    """(gram string, cnt) for order n — tokens joined by unit
    separator. Pure codegen: tokenize once, slide with
    transform/slice, explode, one map-side-combined groupBy."""
    toks = _tok_col(text_col)
    grams = F.expr(
        "transform("
        f"  sequence(1, greatest(size(__toks) - {n - 1}, 0)),"
        f"  i -> array_join(slice(__toks, i, {n}), '{SEP}')"
        ")"
    )
    return (
        docs.select(toks.alias("__toks"))
        .select(F.explode(grams).alias("gram"))
        .groupBy("gram")
        .agg(F.count("*").alias("cnt"))
    )


def train_ngram_lm(
    docs: DataFrame, order: int = 3, text_col: str = "text"
) -> dict[int, DataFrame]:
    """{n: counts DataFrame} for 1..order — training is counting
    (stupid backoff's defining property), one groupBy per order."""
    return {
        n: ngram_counts(docs, n, text_col) for n in range(1, order + 1)
    }


def _collect_model(
    model: dict[int, DataFrame], max_ngrams: int
) -> tuple[dict[int, dict[str, int]], int]:
    tables: dict[int, dict[str, int]] = {}
    for n, df in model.items():
        rows = (
            df.orderBy(F.desc("cnt"), "gram").limit(max_ngrams).collect()
        )
        tables[n] = {r["gram"]: int(r["cnt"]) for r in rows}
    total = sum(tables[1].values())
    return tables, total


def _score_tokens(
    toks: list[str],
    tables: dict[int, dict[str, int]],
    total: int,
    order: int,
) -> tuple[float, int]:
    """Sum of log10 stupid-backoff scores + token count."""
    v1 = len(tables[1]) + 1
    lp = 0.0
    for i in range(len(toks)):
        score = None
        mult = 1.0
        # iterate from the top order down even when the position has
        # a shorter context -- a missing context is a failed level
        # and costs an ALPHA, exactly like the join path's NULL gram
        for n in range(order, 1, -1):
            if i + 1 >= n:
                gram = SEP.join(toks[i - n + 1 : i + 1])
                ctx = SEP.join(toks[i - n + 1 : i])
                c = tables[n].get(gram)
                cc = tables[n - 1].get(ctx)
                if c and cc:
                    score = mult * c / cc
                    break
            mult *= ALPHA
        if score is None:
            c1 = tables[1].get(toks[i], 0)
            score = mult * (c1 + 1) / (total + v1)
        lp += math.log10(score)
    return lp, len(toks)


def score_perplexity(
    docs: DataFrame,
    model: dict[int, DataFrame],
    text_col: str = "text",
    id_col: str = "doc_id",
    max_ngrams: int = 1_000_000,
) -> DataFrame:
    """Broadcast path: collect the (capped) count tables once, score
    each document in an Arrow kernel ->
    (id, n_tokens, log10_prob, perplexity)."""
    order = max(model)
    tables, total = _collect_model(model, max_ngrams)
    import re

    pat = re.compile(PRETOKEN_RE)

    def gen(batches):
        for pdf in batches:
            ids, nt, lps, ppl = [], [], [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                toks = pat.findall((text or "").lower())
                lp, n = _score_tokens(toks, tables, total, order)
                ids.append(did)
                nt.append(n)
                lps.append(lp)
                ppl.append(10 ** (-lp / n) if n else None)
            yield pd.DataFrame(
                {
                    id_col: ids, "n_tokens": nt,
                    "log10_prob": lps, "perplexity": ppl,
                }
            )

    return docs.select(id_col, text_col).mapInPandas(
        gen,
        f"{id_col} long, n_tokens long, log10_prob double, "
        "perplexity double",
    )


def score_perplexity_join(
    docs: DataFrame,
    model: dict[int, DataFrame],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The 100 TB path: no driver-side model, no closure shipping.

    Documents explode once to (doc, position, the full backoff
    LADDER of gram strings for that position); each order's count
    table LEFT-joins on its gram key (co-partitioned shuffles —
    Catalyst plans plain hash joins, AQE handles skewed grams); one
    aggregation folds the per-position stupid-backoff scores back to
    per-document log10_prob/perplexity. Model size is unbounded —
    the tables stay DataFrames end to end."""
    order = max(model)
    toks = _tok_col(text_col)
    base = docs.select(
        F.col(id_col), toks.alias("__toks")
    ).withColumn("n_tokens", F.size("__toks"))

    # one row per token position with every gram/ctx string it needs
    pos_df = base.select(
        F.col(id_col), "n_tokens", "__toks",
        F.posexplode("__toks").alias("pos", "tok"),
    )
    for n in range(2, order + 1):
        gram = F.when(
            F.col("pos") >= n - 1,
            F.array_join(
                F.slice(
                    F.col("__toks"), F.col("pos") - (n - 2), n
                ),
                SEP,
            ),
        )
        ctx = F.when(
            F.col("pos") >= n - 1,
            F.array_join(
                F.slice(
                    F.col("__toks"), F.col("pos") - (n - 2), n - 1
                ),
                SEP,
            ),
        )
        pos_df = pos_df.withColumn(f"g{n}", gram).withColumn(
            f"c{n}", ctx
        )
    pos_df = pos_df.drop("__toks")

    # join each order's counts (gram and context)
    for n in range(2, order + 1):
        cn = model[n].select(
            F.col("gram").alias(f"g{n}"),
            F.col("cnt").alias(f"gcnt{n}"),
        )
        cc = model[n - 1].select(
            F.col("gram").alias(f"c{n}"),
            F.col("cnt").alias(f"ccnt{n}"),
        )
        pos_df = pos_df.join(cn, f"g{n}", "left").join(
            cc, f"c{n}", "left"
        )
    uni = model[1].select(
        F.col("gram").alias("tok"), F.col("cnt").alias("ucnt")
    )
    pos_df = pos_df.join(uni, "tok", "left")
    v1_total = model[1].agg(
        F.count("*").alias("v"), F.sum("cnt").alias("t")
    ).collect()[0]
    v1, total = int(v1_total["v"]) + 1, int(v1_total["t"])

    # stupid-backoff fold as a codegen CASE ladder
    score = None
    mult = 1.0
    for n in range(order, 1, -1):
        cond = (
            F.col(f"gcnt{n}").isNotNull()
            & F.col(f"ccnt{n}").isNotNull()
        )
        val = F.lit(mult) * F.col(f"gcnt{n}") / F.col(f"ccnt{n}")
        score = (
            F.when(cond, val) if score is None
            else score.when(cond, val)
        )
        mult *= ALPHA
    uni_val = (
        F.lit(mult)
        * (F.coalesce(F.col("ucnt"), F.lit(0)) + 1)
        / F.lit(total + v1)
    )
    score = score.otherwise(uni_val) if score is not None else uni_val

    scored = (
        pos_df.select(
            id_col, "n_tokens", F.log10(score).alias("lp")
        )
        .groupBy(id_col, "n_tokens")
        .agg(F.sum("lp").alias("log10_prob"))
    )
    # posexplode emits no rows for zero-token documents, which would
    # make them vanish here while the broadcast twin emits
    # (n_tokens=0, log10_prob=0, perplexity=NULL) — left-join the
    # scores back onto the full doc list so both paths agree.
    return (
        base.select(id_col, "n_tokens")
        .join(scored.drop("n_tokens"), id_col, "left")
        .select(
            id_col, "n_tokens",
            F.coalesce(
                F.col("log10_prob"), F.lit(0.0)
            ).alias("log10_prob"),
            F.when(
                F.col("n_tokens") > 0,
                F.pow(
                    F.lit(10.0),
                    -F.coalesce(F.col("log10_prob"), F.lit(0.0))
                    / F.col("n_tokens"),
                ),
            ).alias("perplexity"),
        )
    )
