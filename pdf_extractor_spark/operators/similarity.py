"""Similarity search over embedding columns (array<float>).

  - cosine_topk: brute-force cosine top-k against a query vector —
    the exactness baseline. All math in JVM expressions (zip_with +
    aggregate over doubles): no Python, broadcastable query side.
  - lsh_buckets / neardup_lsh: random-hyperplane LSH — signs derived
    from md5 so the scheme is deterministic and oracle-reproducible.
    Candidate pairs come from an equality join on the bucket key; the
    exact cosine then filters. This is the 100 TB path: shuffle by
    16-bit bucket, never all-pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _as_double(col) -> F.Column:
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(a) -> F.Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_topk(
    emb: DataFrame, query_vec_id: int, k: int = 10, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Exact top-k by cosine against the embedding of ``query_vec_id``."""
    q = emb.filter(F.col(id_col) == query_vec_id).select(
        _as_double(F.col(vec_col)).alias("qv")
    )
    cand = emb.filter(F.col(id_col) != query_vec_id).select(
        F.col(id_col), _as_double(F.col(vec_col)).alias("v")
    )
    scored = cand.crossJoin(F.broadcast(q)).select(
        id_col,
        F.round(_dot(F.col("v"), F.col("qv")) / (_norm(F.col("v")) * _norm(F.col("qv"))), 6).alias(
            "cosine"
        ),
    )
    return scored.orderBy(F.desc("cosine"), F.asc(id_col)).limit(k)


def lsh_buckets(
    emb: DataFrame, n_bits: int = 16, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Random-hyperplane signature: bit j = sign(Σ_i v[i]·s(j,i)) where
    s(j,i) ∈ {−1,+1} comes from md5(j||'_'||i) parity — deterministic,
    data-independent, identical in the SQL oracle."""
    dims = emb.select(F.size(vec_col).alias("d")).first()["d"]
    planes = [
        (j, i, 1 if int(_md5_parity(j, i)) else -1) for j in range(n_bits) for i in range(dims)
    ]
    spark = emb.sparkSession
    plane_df = F.broadcast(
        spark.createDataFrame(planes, schema="j int, i int, s int")
    )
    elems = emb.select(
        F.col(id_col),
        F.posexplode(_as_double(F.col(vec_col))).alias("i", "x"),
    )
    proj = (
        elems.join(plane_df, "i")
        .groupBy(id_col, "j")
        .agg(F.sum(F.col("x") * F.col("s")).alias("p"))
    )
    return proj.groupBy(id_col).agg(
        F.sum(
            F.when(F.col("p") > 0, F.pow(F.lit(2.0), F.col("j")).cast("bigint")).otherwise(0)
        ).alias("bucket")
    )


def _md5_parity(j: int, i: int) -> int:
    import hashlib

    return int(hashlib.md5(f"{j}_{i}".encode()).hexdigest()[:8], 16) % 2


def neardup_lsh(
    emb: DataFrame,
    threshold: float = 0.9,
    n_bits: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate pairs: LSH-bucket equality join → exact cosine
    filter. Output (a, b, cosine) with a < b."""
    b = lsh_buckets(emb, n_bits, id_col, vec_col)
    withb = emb.join(b, id_col).select(
        F.col(id_col), _as_double(F.col(vec_col)).alias("v"), "bucket"
    )
    l = withb.select(F.col(id_col).alias("a"), F.col("v").alias("va"), "bucket")
    r = withb.select(F.col(id_col).alias("b"), F.col("v").alias("vb"), "bucket")
    pairs = l.join(r, "bucket").filter(F.col("a") < F.col("b"))
    return (
        pairs.select(
            "a",
            "b",
            F.round(
                _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb"))), 6
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
        .distinct()
    )


# ------------------------------------------------------------- IVF-Flat
def ivf_cells(
    emb: DataFrame, n_cells: int = 16, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Coarse quantizer assignment (IVF): each vector goes to the cell
    of its highest-cosine centroid. Centroids are the first ``n_cells``
    vectors (deterministic sampled seeding — the offline analogue of a
    trained coarse codebook; swap in k-means centroids at deploy time
    without touching the plan shape). Broadcast join + JVM array math:
    one narrow pass over the corpus, no shuffle until the groupBy."""
    from pyspark.sql import Window as W

    cents = emb.filter(F.col(id_col) < n_cells).select(
        F.col(id_col).alias("cell_id"), _as_double(F.col(vec_col)).alias("cv")
    )
    cand = emb.select(F.col(id_col), _as_double(F.col(vec_col)).alias("v"))
    scored = cand.join(F.broadcast(cents)).select(
        id_col,
        "cell_id",
        (_dot(F.col("v"), F.col("cv")) / (_norm(F.col("v")) * _norm(F.col("cv")))).alias("sim"),
    )
    w = W.partitionBy(id_col).orderBy(F.desc("sim"), F.asc("cell_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w)).filter("rn = 1").select(id_col, "cell_id")
    )


def ivf_topk(
    emb: DataFrame,
    query_vec_id: int,
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-Flat search: probe the query's ``nprobe`` nearest cells and
    run exact cosine only inside them — the 10^12-vector scale path
    (search cost drops by ~n_cells/nprobe; at scale the cell id is
    also the partition key, so a probe touches nprobe partitions).
    Same output schema as cosine_topk; recall < 1.0 by construction."""
    cells = ivf_cells(emb, n_cells, id_col, vec_col)
    cents = emb.filter(F.col(id_col) < n_cells).select(
        F.col(id_col).alias("cell_id"), _as_double(F.col(vec_col)).alias("cv")
    )
    q = emb.filter(F.col(id_col) == query_vec_id).select(
        _as_double(F.col(vec_col)).alias("qv")
    )
    qcells = (
        cents.crossJoin(F.broadcast(q))
        .select(
            "cell_id",
            (_dot(F.col("cv"), F.col("qv")) / (_norm(F.col("cv")) * _norm(F.col("qv")))).alias("sim"),
        )
        .orderBy(F.desc("sim"), F.asc("cell_id"))
        .limit(nprobe)
        .select("cell_id")
    )
    cand = (
        emb.join(cells, id_col)
        .join(F.broadcast(qcells), "cell_id")
        .filter(F.col(id_col) != query_vec_id)
        .select(F.col(id_col), _as_double(F.col(vec_col)).alias("v"))
    )
    return (
        cand.crossJoin(F.broadcast(q))
        .select(
            id_col,
            F.round(
                _dot(F.col("v"), F.col("qv")) / (_norm(F.col("v")) * _norm(F.col("qv"))), 6
            ).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )
