"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline (JVM higher-order
functions: zip_with + aggregate — no Python in the inner product), and
an LSH-bucketed variant (random-hyperplane signs) as the scale path:
bucket equi-join prunes candidates, exact cosine re-ranks survivors.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qvec",
) -> DataFrame:
    """Exact brute-force cosine top-k: broadcast the (small) query set
    against the full vector table; rank per query.

    Output: (qid, rnk, vec_id). Self-matches excluded by id."""
    q = queries.select(F.col(qid_col), F.col(qvec_col))
    joined = vectors.crossJoin(F.broadcast(q)).filter(
        F.col(id_col) != F.col(qid_col)
    )
    cos = _dot(F.col(vec_col), F.col(qvec_col)) / (
        _norm(F.col(vec_col)) * _norm(F.col(qvec_col))
    )
    w = Window.partitionBy(qid_col).orderBy(
        F.col("__cos").desc(), F.col(id_col).asc()
    )
    return (
        joined.withColumn("__cos", cos)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(qid_col, "rnk", F.col(id_col))
    )


def hyperplane_signature(vec_col, dim: int, n_planes: int = 16):
    """Deterministic random-hyperplane LSH signature as a JVM
    expression.  Plane p's weight for dimension d is the fixed
    arithmetic hash w[p,d] = +1 if ((d+1)*2654435761 + p*40503) mod 97
    < 48 else -1 — reproducible with no stored plane matrix. The
    weights are evaluated HERE (plain Python ints) and embedded as
    literal ±1 arrays, so each plane compiles to one zip_with multiply
    + fold instead of a per-element hash expression — same values,
    a fraction of the codegen-compile cost (the old per-element tree
    dominated wall time on small inputs)."""
    bits = []
    for p in range(n_planes):
        w = [
            1.0 if ((d + 1) * 2654435761 + p * 40503) % 97 < 48
            else -1.0
            for d in range(dim)
        ]
        s = F.aggregate(
            F.zip_with(
                vec_col,
                F.array(*[F.lit(v) for v in w]),
                lambda x, wv: x.cast("double") * wv,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(s > 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0)))
    sig = bits[0]
    for b in bits[1:]:
        sig = sig + b
    return sig


def ivf_assign(
    vectors: DataFrame,
    centroids_bc,
    vec_col: str = "embedding",
    n_probe: int = 1,
):
    """Assign each vector to its n_probe nearest coarse centroids
    (inverted-file / IVF partitioning) via a vectorized pandas UDF.

    ``centroids_bc`` broadcasts a (C, dim) float64 matrix; the UDF does
    one (batch x C) matmul per Arrow batch — the scale path stores the
    cluster id as a partition/sort key so searches prune to n_probe
    inverted lists instead of scanning the table."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<int>")
    def assign(vecs: pd.Series) -> pd.Series:
        cents = centroids_bc.value  # (C, dim), rows L2-normalized
        m = np.stack(vecs.to_numpy())  # (B, dim)
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        sims = (m / norms) @ cents.T  # cosine to each centroid
        order = np.argsort(-sims, axis=1, kind="stable")[:, :n_probe]
        return pd.Series(list(order.astype(np.int32)))

    return vectors.withColumn("__lists", assign(F.col(vec_col)))


def build_centroids(vectors_pdf, vec_col: str = "embedding", n_cells: int = 8):
    """Deterministic coarse quantizer: k-means-lite with fixed seeds —
    the first ``n_cells`` vectors are the centroids after one Lloyd
    refinement pass (enough structure for IVF pruning; reproducible
    with no RNG state)."""
    m = np.stack(vectors_pdf[vec_col].to_numpy()).astype(np.float64)
    cents = m[:n_cells].copy()

    def normalize(x):
        n = np.linalg.norm(x, axis=1, keepdims=True)
        n[n == 0] = 1.0
        return x / n

    cents = normalize(cents)
    sims = normalize(m) @ cents.T
    assign = np.argmax(sims, axis=1)
    for c in range(n_cells):
        members = m[assign == c]
        if len(members):
            cents[c] = members.mean(axis=0)
    return normalize(cents)


def ann_ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    centroids,
    k: int = 3,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qvec",
) -> DataFrame:
    """IVF approximate top-k: vectors live in their single nearest
    inverted list; queries probe their ``n_probe`` nearest lists; exact
    cosine re-ranks the survivors. The candidate join is a broadcast
    equi-join on list id — at scale the vector side is
    partitioned/sorted by ``__list`` so each probe reads only its
    lists (partition pruning), the IVF analog of the cell-cover
    spatial prefilter."""
    spark = vectors.sparkSession
    cents_bc = spark.sparkContext.broadcast(centroids)
    v = (
        ivf_assign(vectors, cents_bc, vec_col, n_probe=1)
        .withColumn("__list", F.col("__lists")[0])
        .drop("__lists")
    )
    q = (
        ivf_assign(queries, cents_bc, qvec_col, n_probe=n_probe)
        .withColumn("__list", F.explode("__lists"))
        .drop("__lists")
    )
    joined = v.join(F.broadcast(q), "__list").filter(
        F.col(id_col) != F.col(qid_col)
    )
    cos = _dot(F.col(vec_col), F.col(qvec_col)) / (
        _norm(F.col(vec_col)) * _norm(F.col(qvec_col))
    )
    w = Window.partitionBy(qid_col).orderBy(
        F.col("__cos").desc(), F.col(id_col).asc()
    )
    return (
        joined.withColumn("__cos", cos)
        .dropDuplicates([qid_col, id_col])
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(qid_col, "rnk", F.col(id_col))
    )


def ann_lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 3,
    n_planes: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qvec",
) -> DataFrame:
    """Approximate top-k: candidates share the hyperplane-sign bucket
    (equi-join on signature — at scale this prunes the cross join to
    ~n/2^planes per query), exact cosine re-rank on survivors."""
    vsig = vectors.withColumn("__sig", hyperplane_signature(F.col(vec_col), dim, n_planes))
    qsig = queries.withColumn("__sig", hyperplane_signature(F.col(qvec_col), dim, n_planes))
    joined = vsig.join(F.broadcast(qsig), "__sig").filter(
        F.col(id_col) != F.col(qid_col)
    )
    cos = _dot(F.col(vec_col), F.col(qvec_col)) / (
        _norm(F.col(vec_col)) * _norm(F.col(qvec_col))
    )
    w = Window.partitionBy(qid_col).orderBy(
        F.col("__cos").desc(), F.col(id_col).asc()
    )
    return (
        joined.withColumn("__cos", cos)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(qid_col, "rnk", F.col(id_col))
    )
