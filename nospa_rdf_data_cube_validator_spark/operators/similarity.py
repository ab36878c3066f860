"""Similarity search over embedding columns (array<float>).

- brute_force_topk: exact cosine top-k against query vectors — the baseline.
  Dot products run as zip_with/aggregate higher-order expressions inside
  whole-stage codegen; the only shuffle is the final top-k (a window over
  query id, or global sort for a single query).
- ivf_topk: the scale path — a deterministic coarse quantizer (k-means-lite:
  centroid per hash-assigned seed group, one refinement pass) partitions
  vectors into nlist cells; queries probe the nprobe nearest cells only, so
  the scan is |data| * nprobe / nlist instead of |data|. At 100 TB the cell
  id becomes the partition key of the at-rest layout (partition pruning does
  the probe selection).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * y),"
    " cast(0.0 as double), (acc, x) -> acc + x)"
)
_NORM = "sqrt(aggregate({a}, cast(0.0 as double), (acc, x) -> acc + cast(x as double) * x))"


def cosine_col(a: str, b: str) -> F.Column:
    return F.expr(_DOT.format(a=a, b=b)) / (
        F.expr(_NORM.format(a=a)) * F.expr(_NORM.format(a=b))
    )


def brute_force_topk(
    data: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> DataFrame:
    """(q_id, vec_id, cosine, rank): exact top-k neighbors per query.

    Queries are broadcast (query sets are small); ties break by vec_id so
    results are deterministic across parallelism levels.

    Norms are computed ONCE per data row / per query row before the
    crossJoin instead of per (data, query) pair — with Q queries that
    removes Q-1 of the Q interpreted-lambda norm evaluations per vector
    (guide §1.2 per-task work). Same expression over the same doubles in
    the same order, so cosine is bit-identical to the fused form."""
    from ..session import spread

    # spread BEFORE the norm projection so a single-partition scan does
    # not compute every norm (and then every pair score) on one task
    data_n = spread(data).select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("_dvec"),
        F.expr(_NORM.format(a=vec_col)).alias("_dnorm"),
    )
    queries_n = queries.select(
        F.col(q_id_col).alias("q_id"),
        F.col(q_vec_col).alias("_qvec"),
        F.expr(_NORM.format(a=q_vec_col)).alias("_qnorm"),
    )
    joined = data_n.crossJoin(F.broadcast(queries_n))
    scored = joined.select(
        "q_id",
        "vec_id",
        F.round(
            F.expr(_DOT.format(a="_dvec", b="_qvec")) / (F.col("_dnorm") * F.col("_qnorm")),
            6,
        ).alias("cosine"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def assign_cells(
    data: DataFrame, nlist: int = 16, vec_col: str = "embedding", id_col: str = "vec_id"
) -> tuple[DataFrame, DataFrame]:
    """Deterministic IVF coarse quantizer.

    Seed assignment: cell = xxhash64(id) % nlist; centroids = per-cell mean;
    one Lloyd refinement (reassign to nearest centroid). Deterministic, no
    RNG, two shuffles total. Returns (assignments(id, cell), centroids(cell,
    centroid))."""
    seeded = data.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("vec"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(nlist)).alias("cell"),
    )

    def per_cell_means(assigned: DataFrame) -> DataFrame:
        return (
            assigned.select("cell", F.posexplode("vec").alias("i", "v"))
            .groupBy("cell", "i")
            .agg(F.avg("v").alias("m"))
            .groupBy("cell")
            .agg(F.array_sort(F.collect_list(F.struct("i", "m"))).alias("im"))
            .select("cell", F.expr("transform(im, x -> x.m)").alias("centroid"))
        )

    def nearest_cell(vectors: DataFrame, cents: DataFrame) -> DataFrame:
        """Map-side argmin against driver-collected centroids: nlist rows of
        metadata collect to the driver, ride to executors in the Arrow UDF
        closure, and each vector finds its cell in one numpy matmul — no
        crossJoin row blowup and no full-data window shuffle (the previous
        crossJoin+row_number form shuffled the whole corpus once per pass).
        Ties break toward the lowest cell id (np.argmax keeps the first
        maximum), matching a deterministic (sim DESC, cell ASC) ordering."""
        import numpy as np
        import pandas as pd

        rows = sorted(cents.collect(), key=lambda r: r["cell"])
        cell_ids = np.asarray([r["cell"] for r in rows], dtype=np.int64)
        C = np.asarray([r["centroid"] for r in rows], dtype=np.float64)
        Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-300)

        def gen(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    yield pd.DataFrame({"vec_id": [], "cell": [], "vec": []})
                    continue
                V = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf["vec"]])
                Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-300)
                best_idx = np.argmax(Vn @ Cn.T, axis=1)
                yield pd.DataFrame(
                    {
                        "vec_id": pdf["vec_id"].values,
                        "cell": cell_ids[best_idx],
                        "vec": pdf["vec"].values,
                    }
                )

        # vec rides through the kernel so the refinement's centroid recompute
        # needs no vec_id join (which would be a second full-data shuffle).
        return vectors.select("vec_id", "vec").mapInPandas(
            gen, schema="vec_id long, cell long, vec array<double>"
        )

    dim_mean = per_cell_means(seeded)
    # one refinement pass: reassign each vector to its nearest centroid
    reassigned = nearest_cell(seeded, dim_mean)
    best = reassigned.select("vec_id", "cell")
    final_cents = per_cell_means(reassigned)
    return best, final_cents


def ivf_topk(
    data: DataFrame,
    queries: DataFrame,
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> DataFrame:
    """Approximate top-k: probe only the nprobe nearest cells per query."""
    assign, cents = assign_cells(data, nlist, vec_col, id_col)
    probes = (
        queries.crossJoin(F.broadcast(cents))
        .withColumn("sim", cosine_col(q_vec_col, "centroid"))
        .withColumn(
            "rn", F.row_number().over(Window.partitionBy(q_id_col).orderBy(F.desc("sim"), "cell"))
        )
        .where(F.col("rn") <= nprobe)
        .select(q_id_col, q_vec_col, "cell")
    )
    cand = data.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec")
    ).join(assign, "vec_id").join(F.broadcast(probes), "cell")
    scored = cand.select(
        F.col(q_id_col).alias("q_id"),
        "vec_id",
        F.round(cosine_col("vec", q_vec_col), 6).alias("cosine"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


# ---------------------------------------------------------------------------
# Cross-engine-exact IVF (integer-quantized L2)
# ---------------------------------------------------------------------------
def _floordiv(num: str, den: str) -> str:
    """SQL floor division over bigints that evaluates identically in Spark
    and DuckDB: both engines' % is C-style (sign of dividend), so
    num - ((num % den + den) % den) is exactly divisible by den, and the
    final division uses Spark's integral `div` (the DuckDB oracle's replica
    uses `//`) — all-int64 end to end, no 2^53 double-precision ceiling."""
    return f"(({num} - ((({num} % {den}) + {den}) % {den})) div {den})"


def ivf_topk_exact(
    data: DataFrame,
    queries: DataFrame,
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    scale: int = 1_000_000,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> DataFrame:
    """IVF top-k whose EVERY intermediate is int64 — bit-identical across
    engines, unlike :func:`ivf_topk` whose float centroid means are
    sum-order-dependent. This is the VERIFICATION twin (pytest runs it
    against a DuckDB replica and compares rows exactly); ivf_topk's numpy
    argmin remains the production scale path.

    Recipe (all integer arithmetic): quantize vectors to
    round(x * scale); seed cell = vec_id % nlist; centroid = per-dim
    floor-div mean (exact: int64 sums are order-independent); ONE
    refinement pass reassigning by min squared-L2 distance (ties -> lowest
    cell); queries probe the nprobe nearest centroids (dist ASC, cell
    ASC); final top-k by (dist ASC, vec_id ASC). Metric is L2 like FAISS
    IVF-Flat, not cosine. Long (exploded) form keeps everything in plain
    relational ops — fine at verification scale; at data scale the
    mapInPandas argmin path wins."""
    qdata = data.select(
        F.col(id_col).alias("vec_id"),
        F.expr(
            f"transform({vec_col}, x -> cast(round(cast(x as double) * {scale}) as bigint))"
        ).alias("qv"),
    )
    long_v = qdata.select(
        "vec_id", (F.col("vec_id") % nlist).alias("cell"), F.posexplode("qv").alias("i", "v")
    )

    def centroids_of(assigned_long: DataFrame) -> DataFrame:
        return (
            assigned_long.groupBy("cell", "i")
            .agg(F.sum("v").alias("s"), F.count("*").alias("n"))
            .select("cell", "i", F.expr(_floordiv("s", "n")).alias("m"))
        )

    def reassign(cents: DataFrame) -> DataFrame:
        d = (
            long_v.drop("cell")
            .join(F.broadcast(cents), "i")
            .groupBy("vec_id", "cell")
            .agg(F.sum((F.col("v") - F.col("m")) * (F.col("v") - F.col("m"))).alias("dist"))
        )
        w = Window.partitionBy("vec_id").orderBy(F.asc("dist"), F.asc("cell"))
        return d.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1).select(
            "vec_id", "cell"
        )

    assign = reassign(centroids_of(long_v))
    final_cents = centroids_of(
        long_v.drop("cell").join(assign, "vec_id")
    )

    q_long = queries.select(
        F.col(q_id_col).alias("q_id"),
        F.posexplode(
            F.expr(
                f"transform({q_vec_col}, x -> cast(round(cast(x as double) * {scale}) as bigint))"
            )
        ).alias("i", "qv"),
    )
    probe_d = (
        q_long.join(F.broadcast(final_cents), "i")
        .groupBy("q_id", "cell")
        .agg(F.sum((F.col("qv") - F.col("m")) * (F.col("qv") - F.col("m"))).alias("dist"))
    )
    wp = Window.partitionBy("q_id").orderBy(F.asc("dist"), F.asc("cell"))
    probes = probe_d.withColumn("rn", F.row_number().over(wp)).where(
        F.col("rn") <= nprobe
    ).select("q_id", "cell")

    cand = (
        long_v.select("vec_id", "i", "v")
        .join(assign, "vec_id")
        .join(F.broadcast(probes), "cell")
    )
    scored = (
        cand.join(q_long.withColumnRenamed("qv", "qval"), ["q_id", "i"])
        .groupBy("q_id", "vec_id")
        .agg(F.sum((F.col("v") - F.col("qval")) * (F.col("v") - F.col("qval"))).alias("dist"))
    )
    wk = Window.partitionBy("q_id").orderBy(F.asc("dist"), F.asc("vec_id"))
    return scored.withColumn("rank", F.row_number().over(wk)).where(F.col("rank") <= k)
