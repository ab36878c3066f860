"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship KG-construction query on sf0.001.
``queries()`` — one entry per implemented operator family (SURVEY.md §2 +
the training-data operators), each runnable at any sf_dir.
``oracle_sql()`` — DuckDB-equivalent SQL per query. The KG oracles are
generated from the same entity/template constants the Spark pipeline uses
(functions/entities.py), so both sides agree bit-for-bit.

Column-name discipline: every computed column is aliased identically in the
Spark plan and the SQL (driver hash compares sorted columns by name).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from nospa_rdf_data_cube_validator_spark.functions import entities as E
from nospa_rdf_data_cube_validator_spark.functions.extraction import extract_mentions
from nospa_rdf_data_cube_validator_spark.functions.linking import (
    alias_edges,
    canonicalize,
    link_mentions,
    resolve_aliases,
    surface_dict,
)
from nospa_rdf_data_cube_validator_spark.operators import dedup, multimodal, similarity, textual
from nospa_rdf_data_cube_validator_spark.plans.closure import transitive_closure
from nospa_rdf_data_cube_validator_spark.sources.transcripts import transcripts_from_orders

N_CONVS = 997


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ===========================================================================
# Spark-side queries
# ===========================================================================
def q_ic1_exactly_one(spark, sf_dir):
    """A1 cardinality!=1 check (IC-1 analogue): customers with #orders != 1."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
        .where(F.col("n_orders") != 1)
    )


def q_ic12_duplicates(spark, sf_dir):
    """A2 duplicate detection (IC-12 analogue): lineitems duplicating
    (partkey, suppkey) within an order; all but the min linenumber.

    Two-phase groupBy + join-back (the r5 cube-ic12 shape, applied here
    in r6): the window form funnels each (order, part, supp) group
    through a sorted window partition; here ONE explicit hash exchange
    on the group key is shared (ReusedExchange) by the codegen
    HashAggregate (int min — no sort) and the join-back's probe side, so
    the plan is one scan + one shuffle + a co-partitioned join. Measured
    0.99 s cold / 0.55 s warm vs 2.33 / 0.59 for the window form at
    sf0.1. Row set identical — same (l_orderkey, l_linenumber) pairs,
    pinned by the unchanged DuckDB oracle and a null-key equivalence
    test (tests/test_skew.py)."""
    l = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"
    ).repartition(F.col("l_orderkey"), F.col("l_partkey"), F.col("l_suppkey"))
    groups = (
        l.groupBy("l_orderkey", "l_partkey", "l_suppkey")
        .agg(F.min("l_linenumber").alias("min_line"), F.count("*").alias("grp"))
        .where(F.col("grp") > 1)
        .select(
            F.col("l_orderkey").alias("g_ok"),
            F.col("l_partkey").alias("g_pk"),
            F.col("l_suppkey").alias("g_sk"),
            "min_line",
        )
    )
    # null-SAFE keys: a window partition groups NULL keys together, so the
    # join-back must too (<=> still plans as a hash join)
    cond = (
        F.col("l_orderkey").eqNullSafe(F.col("g_ok"))
        & F.col("l_partkey").eqNullSafe(F.col("g_pk"))
        & F.col("l_suppkey").eqNullSafe(F.col("g_sk"))
    )
    return (
        l.join(groups, cond, "inner")
        .where(F.col("l_linenumber") != F.col("min_line"))
        .select("l_orderkey", "l_linenumber")
    )


def q_anti_join(spark, sf_dir):
    """J8 anti-join (set difference): customers without orders."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return c.join(o, "c_custkey", "left_anti").select("c_custkey")


def q_semi_join(spark, sf_dir):
    """J9 semi-join (set intersection): customers with at least one open order."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "O")
    return c.join(
        o.select(F.col("o_custkey").alias("c_custkey")), "c_custkey", "left_semi"
    ).select("c_custkey")


def q_path_join(spark, sf_dir):
    """J1 k-hop path join: region -> nation -> customer -> orders counts."""
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


def q_star_join(spark, sf_dir):
    """J2 star/intersection join: customers having both 'O' and 'F' orders."""
    o = _t(spark, sf_dir, "orders")
    a = o.where(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("c_custkey"))
    b = o.where(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("c_custkey"))
    return a.distinct().join(b.distinct(), "c_custkey", "left_semi")


def q_count_distinct(spark, sf_dir):
    """A5 count-distinct per group: market segments per nation."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.countDistinct("c_mktsegment").alias("n_segments"))
    )


def q_window_top1(spark, sf_dir):
    """Window ranking: each customer's highest-value order."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey")
    )


def q_set_except(spark, sf_dir):
    """SO3 set difference: customers with orders but none in status 'F'."""
    o = _t(spark, sf_dir, "orders")
    has = o.select(F.col("o_custkey").alias("c_custkey")).distinct()
    f = o.where(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("c_custkey"))
    return has.join(f, "c_custkey", "left_anti")


def q_ic17_group_size(spark, sf_dir):
    """A4 group-size check (IC-17 analogue): customers whose order count != 3."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"))
        .where(F.col("n_orders") != 3)
    )


def q_closure(spark, sf_dir):
    """J7 transitive closure: doubling chains over orderkeys, seeds <= 32.

    The same driver-side iterative fixpoint used by IC-19/20/21; the DuckDB
    oracle is a recursive CTE."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey")
    edges = (
        o.select(F.col("o_orderkey").alias("src"), (F.col("o_orderkey") * 2).alias("dst"))
        .join(o.select(F.col("o_orderkey").alias("dst")), "dst", "left_semi")
    )
    seeds = o.where(F.col("o_orderkey") <= 32).select(F.col("o_orderkey").alias("node"))
    return transitive_closure(seeds, edges).select(F.col("node").alias("o_orderkey"))


# --- KG construction -------------------------------------------------------
def q_kg_transcripts(spark, sf_dir):
    """Deterministic transcript synthesis from orders (ts excluded: float/tz
    representations differ across engines; all integer-derived)."""
    return transcripts_from_orders(spark, sf_dir, N_CONVS).select(
        "conv_id", "turn_idx", "role", "text", "tool"
    )


def q_kg_mentions(spark, sf_dir):
    """Vectorized pandas-UDF mention extraction (the Arrow data-plane path)."""
    tr = transcripts_from_orders(spark, sf_dir, N_CONVS)
    return extract_mentions(tr)


def q_kg_triples(spark, sf_dir):
    """Full KG construction: extract -> link -> canonicalize -> (s, p, o, n)."""
    tr = transcripts_from_orders(spark, sf_dir, N_CONVS)
    mentions = extract_mentions(tr)
    linked = link_mentions(mentions, surface_dict(spark))
    canon = canonicalize(linked, resolve_aliases(alias_edges(spark)))
    return (
        canon.groupBy(
            F.col("subj_entity").alias("subj"),
            F.concat(F.lit(E.PRED_NS), F.col("rel")).alias("pred"),
            F.col("obj_entity").alias("obj"),
        )
        .agg(F.count("*").alias("n_mentions"))
    )


# --- dedup ------------------------------------------------------------------
def q_dedup_exact(spark, sf_dir):
    return dedup.exact_duplicates(_t(spark, sf_dir, "documents"))


def q_dedup_jaccard(spark, sf_dir):
    """Exact word-Jaccard over adjacent doc-id pairs (deterministic pair set)."""
    d = _t(spark, sf_dir, "documents")
    ids = d.select("doc_id")
    pairs = (
        ids.select(F.col("doc_id").alias("src"), (F.col("doc_id") + 1).alias("dst"))
        .join(ids.select(F.col("doc_id").alias("dst")), "dst", "left_semi")
    )
    return dedup.ngram_jaccard(pairs, d).select(
        "src", "dst", F.round("jaccard", 6).alias("jaccard")
    )


def _family_docs(spark, sf_dir):
    """Deterministic near-dup families derived from documents.doc_id: family
    f = doc_id // 3; each family's core is 40 pseudo-random words (arithmetic
    over a large prime, so families don't share word sets until f wraps at
    1000003). Members share ~94% of their char shingles (minhash path) and
    EXACTLY the same token multiset under case/punct normalization (simhash
    path), so the expected cluster structure is pure id arithmetic — the
    DuckDB oracle never has to reproduce the hash functions, only the
    family partition."""
    d = _t(spark, sf_dir, "documents").select("doc_id")
    return (
        d.withColumn("fam", F.floor(F.col("doc_id") / 3).cast("long"))
        .withColumn("member", (F.col("doc_id") % 3).cast("int"))
        .withColumn(
            "core",
            F.expr(
                "array_join(transform(sequence(0, 39),"
                " j -> concat('w', cast((fam * 31 + j * 17) % 1000003 as string))), ' ')"
            ),
        )
    )


def q_dedup_minhash(spark, sf_dir):
    """MinHash+LSH near-dup clustering over seeded families: members differ
    only in a tiny member suffix (true shingle Jaccard ~0.94, far above the
    0.7 estimate threshold), so clusters == families and the oracle is the
    id arithmetic. The full LSH pipeline (shingle -> sign -> band -> bucket
    join -> verify -> connected components) is exercised end to end."""
    fam = _family_docs(spark, sf_dir)
    docs = fam.select(
        "doc_id",
        F.concat(
            F.col("core"), F.lit(" "), F.col("core"), F.lit(" "), F.col("core"),
            F.lit(" m"), F.col("member").cast("string"),
        ).alias("text"),
    )
    return dedup.minhash_duplicates(docs)


def q_dedup_simhash(spark, sf_dir):
    """SimHash near-dup pairs over seeded families: members carry the SAME
    token multiset (case/punctuation variants only), so intra-family pairs
    have identical simhash (hamming 0) and the oracle is the id arithmetic;
    cross-family word sets differ in >75% of tokens (hamming >> 3)."""
    fam = _family_docs(spark, sf_dir)
    docs = fam.select(
        "doc_id",
        F.when(F.col("member") == 0, F.col("core"))
        .when(F.col("member") == 1, F.upper(F.col("core")))
        .otherwise(F.concat(F.col("core"), F.lit(" !!! ")))
        .alias("text"),
    )
    return dedup.simhash_duplicates(docs)


def q_embedding_near_pairs(spark, sf_dir):
    """Exact cosine near-dup pairs, src restricted to vec_id < 64 to bound
    the pair count at any scale factor."""
    e = _t(spark, sf_dir, "embeddings")
    a = e.where(F.col("vec_id") < 64).select(
        F.col("vec_id").alias("src"), F.col("embedding").alias("a_vec")
    )
    b = e.select(F.col("vec_id").alias("dst"), F.col("embedding").alias("b_vec"))
    return (
        a.join(b, a.src < b.dst)
        .withColumn("cosine", F.round(similarity.cosine_col("a_vec", "b_vec"), 6))
        .where(F.col("cosine") >= 0.2)
        .select("src", "dst", "cosine")
    )


def q_ann_topk(spark, sf_dir):
    """Brute-force cosine top-10 for query vectors vec_id < 5."""
    e = _t(spark, sf_dir, "embeddings")
    qs = e.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    data = e.where(F.col("vec_id") >= 5)
    return similarity.brute_force_topk(data, qs, k=10)


def q_ann_ivf(spark, sf_dir):
    """IVF-bucketed approximate top-10 via the cross-engine-exact
    integer-quantized variant (every intermediate int64, so the DuckDB
    oracle replicates the recipe bit-for-bit; the float-centroid
    production ivf_topk keeps its recall pytest instead — float means are
    sum-order-dependent and cannot be oracle-exact)."""
    e = _t(spark, sf_dir, "embeddings")
    qs = e.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    return similarity.ivf_topk_exact(e.where(F.col("vec_id") >= 5), qs, k=10)


# --- text analysis -----------------------------------------------------------
def q_text_lang(spark, sf_dir):
    return textual.language_id(_t(spark, sf_dir, "documents"))


def q_text_quality(spark, sf_dir):
    return textual.quality_scores(_t(spark, sf_dir, "documents"))


def q_text_tokens(spark, sf_dir):
    return textual.token_counts(_t(spark, sf_dir, "documents"))


def q_text_fingerprint(spark, sf_dir):
    """Rolling-hash fingerprint (no SQL oracle: 64-bit overflow arithmetic)."""
    return textual.fingerprint(_t(spark, sf_dir, "documents"))


def q_text_winnow(spark, sf_dir):
    """md5 min-shingle fingerprint — the cross-engine-reproducible variant,
    oracle-gated (both engines compute md5 over the same char 8-shingles)."""
    return textual.winnow_fingerprint(_t(spark, sf_dir, "documents"))


def q_multimodal(spark, sf_dir):
    """Binary-column media pipeline with REAL decode: docs become valid
    BMP/WAV payloads (video stays opaque), features come from byte-level
    header parsing inside the Arrow-batched mapInPandas kernel. The oracle
    predicts every decoded field from (doc_id, text-length) arithmetic;
    the payload md5 is pytest-pinned instead (a SQL oracle cannot rebuild
    the binary containers)."""
    media = multimodal.docs_as_media(_t(spark, sf_dir, "documents"))
    return multimodal.extract_features(media).select(
        "media_id", "kind", "n_bytes", "width", "height", "sample_rate", "duration_ms"
    )


def q_multimodal_frames(spark, sf_dir):
    """REAL frame index over the 'video' docs: the kernel walks each AVI's
    movi chunk list and emits (frame_idx, byte_offset, n_bytes) seek rows;
    the oracle recomputes the RIFF layout arithmetic. Only frame PIXEL
    decode stays stubbed (no codecs here)."""
    media = multimodal.docs_as_media(_t(spark, sf_dir, "documents"))
    return multimodal.frame_sample(media)


# --- events ------------------------------------------------------------------
def q_events_sessionize(spark, sf_dir):
    """Sessionization (30-min gap) — the batch shape of the streaming op."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("prev_ts", F.lag("ts").over(w))
        .withColumn(
            "new_sess",
            F.when(
                F.col("prev_ts").isNull()
                # Fractional-second epoch: events.ts carries microseconds, and
                # the DuckDB oracle compares epoch() doubles — unix_timestamp
                # truncates to whole seconds and mis-sessionizes gaps like
                # 1800.4s. TIMESTAMP_NTZ can't cast to double directly; the
                # tz-cast detour is safe because get_spark pins
                # spark.sql.session.timeZone=UTC (no DST, offsets cancel).
                | (
                    F.col("ts").cast("timestamp").cast("double")
                    - F.col("prev_ts").cast("timestamp").cast("double")
                    > 1800
                ),
                1,
            ).otherwise(0),
        )
        .groupBy("user_id")
        .agg(F.sum("new_sess").alias("n_sessions"))
    )


def q_events_latest(spark, sf_dir):
    """Latest event per (user, type) — dedup-keep-latest window pattern."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id")
    )


def q_events_stats(spark, sf_dir):
    """Order-independent per-type aggregates (no float-sum nondeterminism)."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(F.min("value"), 6).alias("min_value"),
        F.round(F.max("value"), 6).alias("max_value"),
    )



# --- the real CubeValidator under the DuckDB oracle gate --------------------
LI = "http://example.org/li#"
LI_DIMS = [LI + "dimPart", LI + "dimSupp", LI + "dimQty"]


def _lineitem_cube(spark, sf_dir):
    """Cube triples derived arithmetically from lineitem, with seeded
    violations the oracle can reproduce: rows where
    (l_orderkey*31 + l_linenumber) % 211 == 0 omit the supp dimension
    (IC-11), rows with l_orderkey % 997 == 1 and l_linenumber == 1 carry a
    second qb:dataSet (IC-1); duplicate (part, supp, qty) value-sets within
    a dataset arise naturally (IC-12)."""
    from nospa_rdf_data_cube_validator_spark import qb, terms

    # (l_orderkey, l_linenumber) is NOT unique in the synthetic testdata, so
    # the observation identity is the full distinct dim tuple — both engines
    # derive the same observation set.
    l = (
        _t(spark, sf_dir, "lineitem")
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_partkey",
            "l_suppkey",
            F.floor(F.col("l_quantity")).cast("int").alias("l_qty"),
        )
        .distinct()
    )
    obs = F.concat(
        F.lit(LI + "obs-"),
        F.col("l_orderkey").cast("string"),
        F.lit("-"),
        F.col("l_linenumber").cast("string"),
        F.lit("-"),
        F.col("l_partkey").cast("string"),
        F.lit("-"),
        F.col("l_suppkey").cast("string"),
        F.lit("-"),
        F.col("l_qty").cast("string"),
    )
    ds = F.concat(F.lit(LI + "ds-"), (F.col("l_orderkey") % 7).cast("string"))
    v_part = F.concat(F.lit("http://example.org/part#"), F.col("l_partkey").cast("string"))
    v_supp = F.concat(F.lit("http://example.org/supp#"), F.col("l_suppkey").cast("string"))
    v_qty = F.concat(F.lit("http://example.org/qty#"), F.col("l_qty").cast("string"))
    miss_supp = (F.col("l_orderkey") * 31 + F.col("l_linenumber")) % 211 == 0
    extra_ds = (F.col("l_orderkey") % 997 == 1) & (F.col("l_linenumber") == 1)
    miss_attr = (F.col("l_orderkey") * 17 + F.col("l_linenumber")) % 307 == 0
    miss_meas = (F.col("l_orderkey") * 13 + F.col("l_linenumber")) % 401 == 0

    def t(pred, obj_col):
        return F.struct(
            obs.alias("subj"),
            F.lit(pred).alias("pred"),
            obj_col.alias("obj"),
            F.lit("iri").alias("obj_kind"),
            F.lit(None).cast("string").alias("obj_datatype"),
            F.lit(None).cast("string").alias("obj_lang"),
        )

    arr = F.array_compact(
        F.array(
            t(qb.RDF_TYPE, F.lit(qb.QB_OBSERVATION)),
            t(qb.QB_DATASET_PROP, ds),
            t(LI_DIMS[0], v_part),
            F.when(~miss_supp, t(LI_DIMS[1], v_supp)),
            t(LI_DIMS[2], v_qty),
            F.when(extra_ds, t(qb.QB_DATASET_PROP, F.lit(LI + "ds-extra"))),
            F.when(~miss_attr, t(LI + "attrCurrency", F.lit("http://example.org/cur#USD"))),
            F.when(~miss_meas, t(LI + "price", F.concat(F.lit("http://example.org/p#"), F.col("l_qty").cast("string")))),
        )
    )
    data = l.select(F.explode(arr).alias("t")).select("t.*")

    schema_rows = []
    for k in range(7):
        dsk, dsdk = f"{LI}ds-{k}", f"{LI}dsd-{k}"
        schema_rows.append(terms.iri_row(dsk, qb.QB_STRUCTURE, dsdk))
        for i, dim in enumerate(LI_DIMS):
            spec = f"_:li-{k}-{i}"
            schema_rows.append(terms.bnode_row(dsdk, qb.QB_COMPONENT, spec))
            schema_rows.append(terms.iri_row(spec, qb.QB_COMPONENT_PROPERTY, dim))
    for k in range(7):
        dsdk = f"{LI}dsd-{k}"
        # required attribute component + measure component per DSD
        a_spec, m_spec = f"_:li-{k}-attr", f"_:li-{k}-meas"
        schema_rows.append(terms.bnode_row(dsdk, qb.QB_COMPONENT, a_spec))
        schema_rows.append(terms.iri_row(a_spec, qb.QB_COMPONENT_PROPERTY, LI + "attrCurrency"))
        schema_rows.append(
            terms.lit_row(a_spec, qb.QB_COMPONENT_REQUIRED, "true", datatype=qb.XSD_BOOLEAN)
        )
        schema_rows.append(terms.bnode_row(dsdk, qb.QB_COMPONENT, m_spec))
        schema_rows.append(terms.iri_row(m_spec, qb.QB_COMPONENT_PROPERTY, LI + "price"))
    for dim in LI_DIMS:
        schema_rows.append(terms.iri_row(dim, qb.RDF_TYPE, qb.QB_DIMENSION_PROPERTY))
    schema_rows.append(terms.iri_row(LI + "attrCurrency", qb.RDF_TYPE, qb.QB_ATTRIBUTE_PROPERTY))
    schema_rows.append(terms.iri_row(LI + "price", qb.RDF_TYPE, qb.QB_MEASURE_PROPERTY))
    schema = spark.createDataFrame(schema_rows, terms.TRIPLES_SCHEMA)
    return data.unionByName(schema)


def q_cube_ic1(spark, sf_dir):
    """CubeValidator.ic1 (exactly-one dataSet) over the lineitem cube."""
    from nospa_rdf_data_cube_validator_spark.operators.validate import CubeValidator
    from nospa_rdf_data_cube_validator_spark.plans.algebra import TripleStore

    return CubeValidator(TripleStore(_lineitem_cube(spark, sf_dir))).ic1().select(
        "obs", "n_datasets"
    )


def q_cube_ic11(spark, sf_dir):
    """CubeValidator.ic11 (missing dimensions) over the lineitem cube."""
    from nospa_rdf_data_cube_validator_spark.operators.validate import CubeValidator
    from nospa_rdf_data_cube_validator_spark.plans.algebra import TripleStore

    return CubeValidator(TripleStore(_lineitem_cube(spark, sf_dir))).ic11()


def q_cube_ic12(spark, sf_dir):
    """CubeValidator.ic12 (duplicate observations, NoSPA value-set key) over
    the lineitem cube."""
    from nospa_rdf_data_cube_validator_spark.operators.validate import CubeValidator
    from nospa_rdf_data_cube_validator_spark.plans.algebra import TripleStore

    return CubeValidator(TripleStore(_lineitem_cube(spark, sf_dir))).ic12()




def q_cube_ic13(spark, sf_dir):
    """CubeValidator.ic13 (required attributes) over the lineitem cube."""
    from nospa_rdf_data_cube_validator_spark.operators.validate import CubeValidator
    from nospa_rdf_data_cube_validator_spark.plans.algebra import TripleStore

    return CubeValidator(TripleStore(_lineitem_cube(spark, sf_dir))).ic13()


def q_cube_ic14(spark, sf_dir):
    """CubeValidator.ic14 (all measures present) over the lineitem cube."""
    from nospa_rdf_data_cube_validator_spark.operators.validate import CubeValidator
    from nospa_rdf_data_cube_validator_spark.plans.algebra import TripleStore

    return CubeValidator(TripleStore(_lineitem_cube(spark, sf_dir))).ic14()



def _orders_mt_cube(spark, sf_dir):
    """measureType cube from orders (o_orderkey is unique): dims = customer
    + qb:measureType, two measures. Seeds: o_orderkey % 89 == 0 puts the
    value on the WRONG measure (IC-15); o_orderkey % 97 == 0 carries two
    qb:measureType values (IC-16); per-(ds, customer) group sizes != 2
    violate IC-17 naturally."""
    from nospa_rdf_data_cube_validator_spark import qb, terms

    MT = "http://example.org/mt#"
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    obs = F.concat(F.lit(MT + "obs-"), F.col("o_orderkey").cast("string"))
    ds = F.concat(F.lit(MT + "ds-"), (F.col("o_orderkey") % 3).cast("string"))
    cust = F.concat(F.lit("http://example.org/cust#"), F.col("o_custkey").cast("string"))
    price_m, tax_m = MT + "priceM", MT + "taxM"
    chosen = F.when(F.col("o_orderkey") % 2 == 0, F.lit(price_m)).otherwise(F.lit(tax_m))
    other = F.when(F.col("o_orderkey") % 2 == 0, F.lit(tax_m)).otherwise(F.lit(price_m))
    seed15 = F.col("o_orderkey") % 89 == 0
    seed16 = F.col("o_orderkey") % 97 == 0
    value_pred = F.when(seed15, other).otherwise(chosen)

    def t(pred_col, obj_col):
        return F.struct(
            obs.alias("subj"),
            pred_col.alias("pred"),
            obj_col.alias("obj"),
            F.lit("iri").alias("obj_kind"),
            F.lit(None).cast("string").alias("obj_datatype"),
            F.lit(None).cast("string").alias("obj_lang"),
        )

    arr = F.array_compact(
        F.array(
            t(F.lit(qb.RDF_TYPE), F.lit(qb.QB_OBSERVATION)),
            t(F.lit(qb.QB_DATASET_PROP), ds),
            t(F.lit(MT + "dimCust"), cust),
            t(F.lit(qb.QB_MEASURE_TYPE), chosen),
            F.when(seed16, t(F.lit(qb.QB_MEASURE_TYPE), other)),
            t(value_pred, F.concat(F.lit("http://example.org/v#"), F.col("o_orderkey").cast("string"))),
        )
    )
    data = o.select(F.explode(arr).alias("t")).select("t.*")

    rows = []
    for k in range(3):
        dsk, dsdk = f"{MT}ds-{k}", f"{MT}dsd-{k}"
        rows.append(terms.iri_row(dsk, qb.QB_STRUCTURE, dsdk))
        for i, prop in enumerate([MT + "dimCust", qb.QB_MEASURE_TYPE, price_m, tax_m]):
            spec = f"_:mt-{k}-{i}"
            rows.append(terms.bnode_row(dsdk, qb.QB_COMPONENT, spec))
            rows.append(terms.iri_row(spec, qb.QB_COMPONENT_PROPERTY, prop))
    rows.append(terms.iri_row(MT + "dimCust", qb.RDF_TYPE, qb.QB_DIMENSION_PROPERTY))
    rows.append(terms.iri_row(price_m, qb.RDF_TYPE, qb.QB_MEASURE_PROPERTY))
    rows.append(terms.iri_row(tax_m, qb.RDF_TYPE, qb.QB_MEASURE_PROPERTY))
    schema = spark.createDataFrame(rows, terms.TRIPLES_SCHEMA)
    return data.unionByName(schema)


def q_cube_ic15(spark, sf_dir):
    """CubeValidator.ic15 over the orders measureType cube -> (obs, mt)."""
    from nospa_rdf_data_cube_validator_spark.operators.validate import CubeValidator
    from nospa_rdf_data_cube_validator_spark.plans.algebra import TripleStore

    v = CubeValidator(TripleStore(_orders_mt_cube(spark, sf_dir)))
    return v.ic15().select("obs", F.col("measure_types")[0].alias("mt"))


def q_cube_ic16(spark, sf_dir):
    """CubeValidator.ic16 over the orders measureType cube -> (obs, n_mt)."""
    from nospa_rdf_data_cube_validator_spark.operators.validate import CubeValidator
    from nospa_rdf_data_cube_validator_spark.plans.algebra import TripleStore

    v = CubeValidator(TripleStore(_orders_mt_cube(spark, sf_dir)))
    return v.ic16().select("obs", F.size("measure_types").alias("n_mt"))


def q_cube_ic17(spark, sf_dir):
    """CubeValidator.ic17 over the orders measureType cube -> (obs, n_unequal)."""
    from nospa_rdf_data_cube_validator_spark.operators.validate import CubeValidator
    from nospa_rdf_data_cube_validator_spark.plans.algebra import TripleStore

    return CubeValidator(TripleStore(_orders_mt_cube(spark, sf_dir))).ic17()



def _geo_cube(spark, sf_dir):
    """Code-list/hierarchy cube from region/nation/customer (IC-19/20/21).

    One dataset over observations = customers, with two code-listed dims:
    - dimNation (IC-19): ConceptScheme 'scheme-nations'; nations are typed
      skos:Concept and skos:inScheme EXCEPT seeds (n_nationkey % 5 == 0),
    - dimCust (IC-20/21): two HierarchicalCodeLists on the same dim —
      hier-0 roots at region-0 with a DIRECT pcp (hasSub edges region ->
      nation -> customer), hier-1 roots at region-1 with an INVERSE pcp
      (partOf edges customer -> nation -> region). A customer value is
      IC-20-reachable iff its region is 0 and IC-21-reachable iff 1.
    """
    from nospa_rdf_data_cube_validator_spark import qb, terms

    G = "http://example.org/geo#"
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = _t(spark, sf_dir, "region").select("r_regionkey")
    cust = F.concat(F.lit(G + "cust-"), F.col("c_custkey").cast("string"))
    nat_of_c = F.concat(F.lit(G + "nation-"), F.col("c_nationkey").cast("string"))
    obs = F.concat(F.lit(G + "obs-"), F.col("c_custkey").cast("string"))

    def t(pred, obj_col, subj_col=None):
        return F.struct(
            (subj_col if subj_col is not None else obs).alias("subj"),
            F.lit(pred).alias("pred"),
            obj_col.alias("obj"),
            F.lit("iri").alias("obj_kind"),
            F.lit(None).cast("string").alias("obj_datatype"),
            F.lit(None).cast("string").alias("obj_lang"),
        )

    obs_triples = c.select(
        F.explode(
            F.array(
                t(qb.RDF_TYPE, F.lit(qb.QB_OBSERVATION)),
                t(qb.QB_DATASET_PROP, F.lit(G + "ds")),
                t(G + "dimNation", nat_of_c),
                t(G + "dimCust", cust),
            )
        ).alias("t")
    ).select("t.*")

    nat = F.concat(F.lit(G + "nation-"), F.col("n_nationkey").cast("string"))
    reg = F.concat(F.lit(G + "region-"), F.col("n_regionkey").cast("string"))
    seeded = F.col("n_nationkey") % 5 == 0
    nation_triples = n.select(
        F.explode(
            F.array_compact(
                F.array(
                    F.when(~seeded, t(qb.RDF_TYPE, F.lit(qb.SKOS_CONCEPT), subj_col=nat)),
                    F.when(~seeded, t(qb.SKOS_IN_SCHEME, F.lit(G + "scheme-nations"), subj_col=nat)),
                    t(G + "hasSub", nat, subj_col=reg),       # direct edges region -> nation
                    t(G + "partOf", reg, subj_col=nat),        # inverse edges nation -> region
                )
            )
        ).alias("t")
    ).select("t.*")
    cust_edge_triples = c.select(
        F.explode(
            F.array(
                t(G + "hasSub", cust, subj_col=nat_of_c),      # nation -> customer
                t(G + "partOf", nat_of_c, subj_col=cust),      # customer -> nation
                t(qb.RDF_TYPE, F.lit(qb.SKOS_CONCEPT), subj_col=cust),
            )
        ).alias("t")
    ).select("t.*")

    rows = [
        terms.iri_row(G + "ds", qb.QB_STRUCTURE, G + "dsd"),
        terms.iri_row(G + "scheme-nations", qb.RDF_TYPE, qb.SKOS_CONCEPT_SCHEME),
        terms.iri_row(G + "dimNation", qb.RDF_TYPE, qb.QB_DIMENSION_PROPERTY),
        terms.iri_row(G + "dimNation", qb.QB_CODE_LIST, G + "scheme-nations"),
        terms.iri_row(G + "dimCust", qb.RDF_TYPE, qb.QB_DIMENSION_PROPERTY),
        terms.iri_row(G + "dimCust", qb.QB_CODE_LIST, G + "hier-0"),
        terms.iri_row(G + "dimCust", qb.QB_CODE_LIST, G + "hier-1"),
        terms.iri_row(G + "hier-0", qb.RDF_TYPE, qb.QB_HIERARCHICAL_CODE_LIST),
        terms.iri_row(G + "hier-0", qb.QB_HIERARCHY_ROOT, G + "region-0"),
        terms.iri_row(G + "hier-0", qb.QB_PARENT_CHILD_PROPERTY, G + "hasSub"),
        terms.iri_row(G + "hier-1", qb.RDF_TYPE, qb.QB_HIERARCHICAL_CODE_LIST),
        terms.iri_row(G + "hier-1", qb.QB_HIERARCHY_ROOT, G + "region-1"),
        terms.bnode_row(G + "hier-1", qb.QB_PARENT_CHILD_PROPERTY, "_:geo-inv"),
        terms.iri_row("_:geo-inv", qb.OWL_INVERSE_OF, G + "partOf"),
    ]
    for i, dim in enumerate([G + "dimNation", G + "dimCust"]):
        spec = f"_:geo-{i}"
        rows.append(terms.bnode_row(G + "dsd", qb.QB_COMPONENT, spec))
        rows.append(terms.iri_row(spec, qb.QB_COMPONENT_PROPERTY, dim))
    schema = spark.createDataFrame(rows, terms.TRIPLES_SCHEMA)
    return obs_triples.unionByName(nation_triples).unionByName(cust_edge_triples).unionByName(schema)


def q_cube_ic19(spark, sf_dir):
    """CubeValidator.ic19 (codes from code list) -> (value, cl)."""
    from nospa_rdf_data_cube_validator_spark.operators.validate import CubeValidator
    from nospa_rdf_data_cube_validator_spark.plans.algebra import TripleStore

    v = CubeValidator(TripleStore(_geo_cube(spark, sf_dir)))
    return v.ic19().select("value", F.col("code_lists")[0].alias("cl"))


def q_cube_ic20(spark, sf_dir):
    """CubeValidator.ic20 (direct hierarchy reachability) -> (value, n_lists)."""
    from nospa_rdf_data_cube_validator_spark.operators.validate import CubeValidator
    from nospa_rdf_data_cube_validator_spark.plans.algebra import TripleStore

    v = CubeValidator(TripleStore(_geo_cube(spark, sf_dir)))
    return v.ic20().select("value", F.size("code_lists").alias("n_lists"))


def q_cube_ic21(spark, sf_dir):
    """CubeValidator.ic21 (inverse hierarchy reachability) -> (value, n_lists)."""
    from nospa_rdf_data_cube_validator_spark.operators.validate import CubeValidator
    from nospa_rdf_data_cube_validator_spark.plans.algebra import TripleStore

    v = CubeValidator(TripleStore(_geo_cube(spark, sf_dir)))
    return v.ic21().select("value", F.size("code_lists").alias("n_lists"))


def _slice_cube(spark, sf_dir):
    """Slice-bearing metadata cube for IC-2..IC-10 and IC-18, derived from
    nation (25 keys k at every sf). One dataset/DSD/dim/sliceKey/slice
    family per k, with modular seeds (reference semantics per
    nonsparql/ValidatorIC2.java..ValidatorIC10.java, ValidatorIC18.java):

    - IC-2:  k%7==3 -> dataset has NO qb:structure (n=0);
             k%5==0 (and structured) -> a second structure to dsd-extra (n=2)
    - IC-3:  k%4==1 -> DSD declares no measure component
    - IC-4:  k%6==2 -> dimension has no rdfs:range
    - IC-5:  k%6==4 -> dimension ranges skos:Concept but has no qb:codeList
    - IC-6:  k%8==5 -> the optional (componentRequired false) component's
             property is the DIMENSION, not an attribute
    - IC-7:  k%9==6 -> slice key not attached to any DSD via qb:sliceKey
    - IC-8:  k%10==7 -> slice key carries an extra componentProperty
             (rogue-k) that its DSD never declares
    - IC-9:  k%11==3 -> slice has no qb:sliceStructure (n=0);
             k%11==8 -> a second structure to slicekey-extra (n=2)
    - IC-10: k%12==9 -> slice omits its dim value; the IC-8 rogue props and
             the IC-9 extra key's dim-extra are never valued on slices, so
             those seeds surface here too
    - IC-18: k%13==10 -> the slice's first observation declares qb:dataSet
             of the NEXT dataset instead of its own

    Metadata-scale by construction (the reference's slice checks all run on
    schema entities); built driver-side from the collected nation keys like
    the reference loads its model, oracle-replicated by mod arithmetic."""
    from nospa_rdf_data_cube_validator_spark import qb, terms

    SL = "http://example.org/sl#"
    ks = sorted(
        r[0] for r in _t(spark, sf_dir, "nation").select("n_nationkey").distinct().collect()
    )
    dsd_extra, key_extra, dim_extra = SL + "dsd-extra", SL + "slicekey-extra", SL + "dim-extra"
    attr, meas = SL + "attr", SL + "measure"
    rows = [
        terms.iri_row(attr, qb.RDF_TYPE, qb.QB_ATTRIBUTE_PROPERTY),
        terms.iri_row(meas, qb.RDF_TYPE, qb.QB_MEASURE_PROPERTY),
        terms.iri_row(dim_extra, qb.RDF_TYPE, qb.QB_DIMENSION_PROPERTY),
        terms.iri_row(dim_extra, qb.RDFS_RANGE, qb.XSD_STRING),
        terms.iri_row(key_extra, qb.RDF_TYPE, qb.QB_SLICE_KEY),
        terms.iri_row(key_extra, qb.QB_COMPONENT_PROPERTY, dim_extra),
    ]
    for k in ks:
        ds, dsd = f"{SL}ds-{k}", f"{SL}dsd-{k}"
        dim, key, slc = f"{SL}dim-{k}", f"{SL}slicekey-{k}", f"{SL}slice-{k}"
        rows.append(terms.iri_row(ds, qb.RDF_TYPE, qb.QB_DATASET))
        if k % 7 != 3:
            rows.append(terms.iri_row(ds, qb.QB_STRUCTURE, dsd))
            if k % 5 == 0:
                rows.append(terms.iri_row(ds, qb.QB_STRUCTURE, dsd_extra))
        rows.append(terms.iri_row(dsd, qb.RDF_TYPE, qb.QB_DSD))
        dspec = f"_:sl-dim-{k}"
        rows.append(terms.bnode_row(dsd, qb.QB_COMPONENT, dspec))
        rows.append(terms.iri_row(dspec, qb.QB_COMPONENT_PROPERTY, dim))
        if k % 4 != 1:
            mspec = f"_:sl-meas-{k}"
            rows.append(terms.bnode_row(dsd, qb.QB_COMPONENT, mspec))
            rows.append(terms.iri_row(mspec, qb.QB_COMPONENT_PROPERTY, meas))
        aspec = f"_:sl-attr-{k}"
        rows.append(terms.bnode_row(dsd, qb.QB_COMPONENT, aspec))
        rows.append(terms.lit_row(aspec, qb.QB_COMPONENT_REQUIRED, "false", qb.XSD_BOOLEAN))
        rows.append(
            terms.iri_row(aspec, qb.QB_COMPONENT_PROPERTY, dim if k % 8 == 5 else attr)
        )
        rows.append(terms.iri_row(dim, qb.RDF_TYPE, qb.QB_DIMENSION_PROPERTY))
        if k % 6 == 4:
            rows.append(terms.iri_row(dim, qb.RDFS_RANGE, qb.SKOS_CONCEPT))
        elif k % 6 != 2:
            rows.append(terms.iri_row(dim, qb.RDFS_RANGE, qb.XSD_STRING))
        rows.append(terms.iri_row(key, qb.RDF_TYPE, qb.QB_SLICE_KEY))
        rows.append(terms.iri_row(key, qb.QB_COMPONENT_PROPERTY, dim))
        if k % 10 == 7:
            rows.append(terms.iri_row(key, qb.QB_COMPONENT_PROPERTY, f"{SL}rogue-{k}"))
        if k % 9 != 6:
            rows.append(terms.iri_row(dsd, qb.QB_SLICE_KEY_PROP, key))
        rows.append(terms.iri_row(slc, qb.RDF_TYPE, qb.QB_SLICE))
        if k % 11 != 3:
            rows.append(terms.iri_row(slc, qb.QB_SLICE_STRUCTURE, key))
        if k % 11 == 8:
            rows.append(terms.iri_row(slc, qb.QB_SLICE_STRUCTURE, key_extra))
        if k % 12 != 9:
            rows.append(terms.iri_row(slc, dim, f"{SL}val-{k}"))
        rows.append(terms.iri_row(ds, qb.QB_SLICE_PROP, slc))
        for i in range(3):
            obs = f"{SL}obs-{k}-{i}"
            rows.append(terms.iri_row(slc, qb.QB_OBSERVATION_PROP, obs))
            tgt = f"{SL}ds-{(k + 1) % len(ks)}" if (k % 13 == 10 and i == 0) else ds
            rows.append(terms.iri_row(obs, qb.QB_DATASET_PROP, tgt))
    # attach the shared extra slice key to dsd-0 and declare its dim there,
    # so the extras themselves trip no constraint
    rows.append(terms.iri_row(f"{SL}dsd-0", qb.QB_SLICE_KEY_PROP, key_extra))
    rows.append(terms.bnode_row(f"{SL}dsd-0", qb.QB_COMPONENT, "_:sl-extra"))
    rows.append(terms.iri_row("_:sl-extra", qb.QB_COMPONENT_PROPERTY, dim_extra))
    return spark.createDataFrame(rows, terms.TRIPLES_SCHEMA)


def _slice_validator(spark, sf_dir):
    from nospa_rdf_data_cube_validator_spark.operators.validate import CubeValidator
    from nospa_rdf_data_cube_validator_spark.plans.algebra import TripleStore

    return CubeValidator(TripleStore(_slice_cube(spark, sf_dir)))


def _enc_lineitem_validator(spark, sf_dir):
    """The ENCODED engine over the same seeded lineitem cube: int64 term ids
    (order-preserving dictionary), validators unchanged, outputs decoded —
    proves the dictionary-encoded path hash-exact under the same oracles
    as the string engine."""
    from nospa_rdf_data_cube_validator_spark.operators.validate import CubeValidator
    from nospa_rdf_data_cube_validator_spark.plans.algebra import TripleStore
    from nospa_rdf_data_cube_validator_spark.plans.encoding import encode_store

    enc = encode_store(TripleStore(_lineitem_cube(spark, sf_dir)), parts=8)
    return CubeValidator(enc), enc


def q_enc_cube_ic1(spark, sf_dir):
    """Encoded CubeValidator.ic1 — same oracle as cube_ic1."""
    v, enc = _enc_lineitem_validator(spark, sf_dir)
    return enc.decode(v.ic1().select("obs", "n_datasets"), ["obs"]).select(
        "obs", "n_datasets"
    )


def q_enc_cube_ic11(spark, sf_dir):
    """Encoded CubeValidator.ic11 — same oracle as cube_ic11."""
    v, enc = _enc_lineitem_validator(spark, sf_dir)
    return enc.decode(v.ic11(), ["obs", "dim"]).select("obs", "dim")


def q_enc_cube_ic12(spark, sf_dir):
    """Encoded CubeValidator.ic12 — same oracle as cube_ic12 (the min-obs
    representative pick survives encoding via the order-preserving ids)."""
    v, enc = _enc_lineitem_validator(spark, sf_dir)
    return enc.decode(v.ic12(), ["obs"]).select("obs")


_GATE_CLEANUP_REGISTERED: set[str] = set()


def _gate_workdir_housekeeping(workdir: str) -> None:
    """Bound the pid-keyed gate workdirs: remove THIS process's dir at
    exit (after the gate's warm-resume window closes) and sweep sibling
    dirs whose owning pid is DEAD (the pid is plaintext in the dir name,
    so liveness is checkable — mtime age alone could reap the warm
    workdir of a >24 h driver mid-session; r5 ADVICE). Dirs in the old
    hash-only format keep the mtime-age rule."""
    import atexit
    import shutil
    import tempfile
    import time as _time

    if workdir not in _GATE_CLEANUP_REGISTERED:
        _GATE_CLEANUP_REGISTERED.add(workdir)
        atexit.register(shutil.rmtree, workdir, ignore_errors=True)
    tmp = tempfile.gettempdir()
    try:
        for name in os.listdir(tmp):
            if not name.startswith("nospa_gate_atrest_"):
                continue
            p = os.path.join(tmp, name)
            if p == workdir:
                continue
            pid_part = name[len("nospa_gate_atrest_"):].split("_", 1)[0]
            if pid_part.isdigit():
                try:
                    os.kill(int(pid_part), 0)
                    continue  # owner alive: never sweep, regardless of age
                except ProcessLookupError:
                    pass  # owner dead: sweep below
                except PermissionError:
                    continue  # alive under another uid
            elif _time.time() - os.path.getmtime(p) <= 86400:
                continue  # legacy hash-only name: keep the age rule
            shutil.rmtree(p, ignore_errors=True)
    except OSError:
        pass


def q_bucketed_cube_ic12(spark, sf_dir):
    """CubeValidator.ic12 off the AT-REST bucketed table — the default
    run_pipeline(bucketed=True) layout, end to end through
    StageRunner.run_table: the seeded lineitem cube is materialized as a
    subj-bucketed managed table (HashPartitioning(subj) at rest, no
    observation-scale Exchange in the validate plan) and the validator
    reads the TABLE, not the in-memory frame. Same oracle as cube_ic12."""
    import hashlib
    import tempfile

    from nospa_rdf_data_cube_validator_spark.operators.validate import CubeValidator
    from nospa_rdf_data_cube_validator_spark.pipeline import StageRunner
    from nospa_rdf_data_cube_validator_spark.plans.algebra import TripleStore

    # workdir keyed by (sf_dir, source-data fingerprint, pid): the
    # fingerprint invalidates the cache when testdata is regenerated (a
    # stale cube would spuriously fail the gate), and the pid keeps
    # concurrent driver processes from racing on a shared
    # DROP TABLE/rmtree/write of the same warehouse path. Warm resume
    # still works within a driver process (the gate's repeat runs).
    # Leak control: this process's dir is removed at exit, and stale
    # siblings from dead pids are swept opportunistically.
    src = os.path.join(sf_dir, "lineitem.parquet")
    st = os.stat(src)
    key = hashlib.md5(
        f"{sf_dir}|{st.st_mtime_ns}|{st.st_size}".encode()
    ).hexdigest()[:12]
    # pid in PLAINTEXT so the sweep can check owner liveness (r5 ADVICE)
    workdir = os.path.join(
        tempfile.gettempdir(), f"nospa_gate_atrest_{os.getpid()}_{key}"
    )
    _gate_workdir_housekeeping(workdir)
    runner = StageRunner(spark, workdir)
    cube = runner.run_table(
        "gate_cube_atrest", lambda: _lineitem_cube(spark, sf_dir), buckets=8
    )
    return CubeValidator(TripleStore(cube)).ic12()


def q_cube_ic2(spark, sf_dir):
    """CubeValidator.ic2 (unique DSD) -> (ds, n_dsds)."""
    return _slice_validator(spark, sf_dir).ic2().select("ds", "n_dsds")


def q_cube_ic3(spark, sf_dir):
    """CubeValidator.ic3 (DSD includes measure) -> (dsd)."""
    return _slice_validator(spark, sf_dir).ic3()


def q_cube_ic4(spark, sf_dir):
    """CubeValidator.ic4 (dimensions have range) -> (dim)."""
    return _slice_validator(spark, sf_dir).ic4()


def q_cube_ic5(spark, sf_dir):
    """CubeValidator.ic5 (concept dims have code lists) -> (dim)."""
    return _slice_validator(spark, sf_dir).ic5()


def q_cube_ic6(spark, sf_dir):
    """CubeValidator.ic6 (only attributes optional) -> (comp_prop)."""
    return _slice_validator(spark, sf_dir).ic6()


def q_cube_ic7(spark, sf_dir):
    """CubeValidator.ic7 (slice keys declared) -> (slice_key)."""
    return _slice_validator(spark, sf_dir).ic7()


def q_cube_ic8(spark, sf_dir):
    """CubeValidator.ic8 (slice keys consistent with DSD) -> (comp_prop)."""
    return _slice_validator(spark, sf_dir).ic8()


def q_cube_ic9(spark, sf_dir):
    """CubeValidator.ic9 (unique slice structure) -> (slice, n_structures)."""
    return _slice_validator(spark, sf_dir).ic9().select("slice", "n_structures")


def q_cube_ic10(spark, sf_dir):
    """CubeValidator.ic10 (slice dimensions complete) -> (slice, dim)."""
    return _slice_validator(spark, sf_dir).ic10()


def q_cube_ic18(spark, sf_dir):
    """CubeValidator.ic18 (consistent dataset links) -> (ds, obs)."""
    return _slice_validator(spark, sf_dir).ic18()


def q_events_window_agg(spark, sf_dir):
    """Tumbling event-time window counts (the batch shape of the streaming
    windowed aggregation): events per (5-minute bucket, type), bucket
    reported as epoch seconds so both engines emit integers."""
    ev = _t(spark, sf_dir, "events")
    bucket = (F.floor(F.unix_timestamp("ts") / 300) * 300).alias("bucket_s")
    return ev.groupBy(bucket, "event_type").agg(F.count("*").alias("n"))


def q_kg_turn_order(spark, sf_dir):
    """Per-conversation turn ordering invariant via window lag: emit
    (conv_id, turn_idx, prev_idx) for every non-initial turn; gaps and
    ordering are fully deterministic from the generator arithmetic."""
    tr = transcripts_from_orders(spark, sf_dir, N_CONVS)
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    return (
        tr.select("conv_id", "turn_idx")
        .withColumn("prev_idx", F.lag("turn_idx").over(w))
        .where(F.col("prev_idx").isNotNull())
    )


def q_streaming_ic12(spark, sf_dir):
    """Incremental IC-12 over a REAL two-micro-batch file stream
    (streaming/ingest.py::streaming_ic12_dup_check): observations derive
    from orders (obs = zero-padded orderkey, duplicate key = custkey),
    split even/odd-orderkey into two files with forced mtime order so the
    second batch delivers SMALLER obs ids that late-flag batch-1
    representatives through the applyInPandasWithState state. The
    CONVERGED flagged set is arrival-order independent — all but the
    minimum obs per (ds, custkey) — so a plain window oracle checks a
    genuinely stateful streaming computation."""
    import atexit
    import glob as _glob
    import shutil
    import tempfile
    import time as _time

    from nospa_rdf_data_cube_validator_spark.streaming.ingest import (
        streaming_ic12_dup_check,
    )

    orders = _t(spark, sf_dir, "orders").select(
        F.lit("d1").alias("ds"),
        F.concat(F.lit("o"), F.lpad(F.col("o_orderkey").cast("string"), 10, "0")).alias("obs"),
        F.col("o_custkey").cast("string").alias("dim_key"),
        (F.col("o_orderkey") % 2).alias("half"),
    )
    src = tempfile.mkdtemp(prefix="nospa_stream_ic12_")
    atexit.register(shutil.rmtree, src, ignore_errors=True)
    orders.where(F.col("half") == 0).drop("half").coalesce(1).write.mode("append").parquet(src)
    first_files = set(_glob.glob(os.path.join(src, "part-*")))
    orders.where(F.col("half") == 1).drop("half").coalesce(1).write.mode("append").parquet(src)
    now = _time.time()
    for f in _glob.glob(os.path.join(src, "part-*")):
        # force mod-time order: even-orderkey file is micro-batch 1
        os.utime(f, (now - 100, now - 100) if f in first_files else (now - 50, now - 50))
    stream = (
        spark.readStream.schema("ds string, obs string, dim_key string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    name = f"stream_ic12_{os.getpid()}_{int(_time.time() * 1000) % 1000000}"
    q = (
        streaming_ic12_dup_check(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError("streaming_ic12 gate query did not finish in 300s")
    return spark.table(name).select("ds", "dim_key", "obs")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full KG construction (extract -> link -> canonicalize) over
    transcripts derived from sf0.001 orders."""
    return q_kg_triples(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Order matters: the correctness driver gates the FIRST 50 entries. Rule:
    # every oracle-backed query whose code path changed recently sits inside
    # the window — r04 rotates enc_cube_ic1/11/12 (the DEFAULT
    # encoded+bucketed engine since 4cd5b09/c96475d), ann_ivf (new int64
    # oracle, acd3119), and bucketed_cube_ic12 (at-rest StageRunner path) IN.
    # r05: ann_ivf's oracle changed again (CAST SUM AS BIGINT, closing the
    # r04 HUGEINT-hash finding) so it stays in-window at position 6;
    # streaming_ic12 (NEW: stateful applyInPandasWithState incremental
    # dup check with a convergence oracle) rotates IN at position 7, and
    # kg_turn_order rotates to the tail (its lag-window family is
    # re-exercised in-window by events_sessionize; code unchanged in r5).
    # UNGATED tail, explicitly: anti_join/semi_join/set_except/window_top1/
    # count_distinct (generic TPC-ish shapes whose join/window/agg families
    # are re-exercised by the in-window cube_ic* plans — cube_ic4/7 anti,
    # cube_ic17 count-distinct, ic12 window), events_latest/events_stats
    # (same families), and text_fingerprint (documented no-oracle:
    # 64-bit rolling hash not expressible in DuckDB without overflow UB).
    return {
        "ic1_exactly_one": q_ic1_exactly_one,
        "ic12_duplicates": q_ic12_duplicates,
        "enc_cube_ic1": q_enc_cube_ic1,
        "enc_cube_ic11": q_enc_cube_ic11,
        "enc_cube_ic12": q_enc_cube_ic12,
        "ann_ivf": q_ann_ivf,
        "streaming_ic12": q_streaming_ic12,
        "path_join": q_path_join,
        "star_join": q_star_join,
        "ic17_group_size": q_ic17_group_size,
        "closure": q_closure,
        "kg_transcripts": q_kg_transcripts,
        "kg_mentions": q_kg_mentions,
        "kg_triples": q_kg_triples,
        "dedup_exact": q_dedup_exact,
        "dedup_jaccard": q_dedup_jaccard,
        "dedup_minhash": q_dedup_minhash,
        "dedup_simhash": q_dedup_simhash,
        "embedding_near_pairs": q_embedding_near_pairs,
        "ann_topk": q_ann_topk,
        "text_lang": q_text_lang,
        "text_quality": q_text_quality,
        "text_tokens": q_text_tokens,
        "text_winnow": q_text_winnow,
        "multimodal": q_multimodal,
        "multimodal_frames": q_multimodal_frames,
        "cube_ic1": q_cube_ic1,
        "cube_ic2": q_cube_ic2,
        "cube_ic3": q_cube_ic3,
        "cube_ic4": q_cube_ic4,
        "cube_ic5": q_cube_ic5,
        "cube_ic6": q_cube_ic6,
        "cube_ic7": q_cube_ic7,
        "cube_ic8": q_cube_ic8,
        "cube_ic9": q_cube_ic9,
        "cube_ic10": q_cube_ic10,
        "cube_ic11": q_cube_ic11,
        "cube_ic12": q_cube_ic12,
        "cube_ic13": q_cube_ic13,
        "cube_ic14": q_cube_ic14,
        "cube_ic15": q_cube_ic15,
        "cube_ic16": q_cube_ic16,
        "cube_ic17": q_cube_ic17,
        "cube_ic18": q_cube_ic18,
        "cube_ic19": q_cube_ic19,
        "cube_ic20": q_cube_ic20,
        "cube_ic21": q_cube_ic21,
        "events_sessionize": q_events_sessionize,
        "events_window_agg": q_events_window_agg,
        "bucketed_cube_ic12": q_bucketed_cube_ic12,
        # --- UNGATED tail (positions 51+; see ordering rule above) ----------
        "kg_turn_order": q_kg_turn_order,
        "anti_join": q_anti_join,
        "count_distinct": q_count_distinct,
        "semi_join": q_semi_join,
        "set_except": q_set_except,
        "window_top1": q_window_top1,
        "events_latest": q_events_latest,
        "events_stats": q_events_stats,
        "text_fingerprint": q_text_fingerprint,
    }


# ===========================================================================
# DuckDB oracles
# ===========================================================================
def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _surf_values() -> str:
    rows = ", ".join(
        f"({ei}, {si}, {_sql_quote(s)})" for (s, ei, si, _iri) in E.surface_rows()
    )
    return f"(VALUES {rows}) AS surf(ent_idx, surf_idx, surface)"


def _dict_values() -> str:
    rows = ", ".join(
        f"({_sql_quote(s)}, {_sql_quote(iri)})" for (s, _ei, _si, iri) in E.surface_rows()
    )
    return f"(VALUES {rows}) AS d(surface, entity)"


def _canon_case(col: str) -> str:
    cmap = E.canonical_map()
    if not cmap:
        return col
    whens = " ".join(
        f"WHEN {col} = {_sql_quote(src)} THEN {_sql_quote(dst)}" for src, dst in sorted(cmap.items())
    )
    return f"CASE {whens} ELSE {col} END"


def _transcripts_cte_clean() -> str:
    """Readable version: two aliased scans of the surface VALUES."""
    ne, nt = len(E.ENTITIES), len(E.TEMPLATES)
    text_cases = []
    for ti, (tmpl, _rel) in enumerate(E.TEMPLATES):
        parts = tmpl.split("{}")
        expr = f"{_sql_quote(parts[0])} || surf1 || {_sql_quote(parts[1])} || surf2 || {_sql_quote(parts[2])}"
        text_cases.append(f"WHEN tmpl = {ti} THEN {expr}")
    text_sql = "CASE " + " ".join(text_cases) + " END"
    surf_rows = ", ".join(f"({ei}, {si}, {_sql_quote(s)})" for (s, ei, si, _) in E.surface_rows())
    return f"""
WITH surfaces(ent_idx, surf_idx, surface) AS (VALUES {surf_rows}),
keyed AS (
  SELECT CAST(o_orderkey AS BIGINT) AS k,
         CAST(o_orderkey % {N_CONVS} AS BIGINT) AS conv_num,
         CAST(o_orderkey // {N_CONVS} AS BIGINT) AS turn_idx,
         CAST(o_orderkey % {nt} AS INT) AS tmpl,
         CAST(o_orderkey % {ne} AS INT) AS e1,
         CAST((o_orderkey * 7 + 3) % {ne} AS INT) AS e2,
         CAST((o_orderkey // 7) % 2 AS INT) AS s1,
         CAST((o_orderkey // 11) % 2 AS INT) AS s2
  FROM orders
),
transcripts AS (
  SELECT printf('conv-%06d', conv_num) AS conv_id,
         CAST(turn_idx AS INT) AS turn_idx,
         CASE WHEN k % 3 = 0 THEN 'user' WHEN k % 3 = 1 THEN 'assistant' ELSE 'tool' END AS role,
         (SELECT {text_sql}
            FROM (SELECT sa.surface AS surf1, sb.surface AS surf2
                    FROM surfaces sa, surfaces sb
                   WHERE sa.ent_idx = e1 AND sa.surf_idx = s1
                     AND sb.ent_idx = e2 AND sb.surf_idx = s2)) AS text,
         CASE WHEN k % 3 = 2 THEN 'database' ELSE '' END AS tool
  FROM keyed
)"""


def _mention_patterns() -> list[tuple[str, str]]:
    import re as _re

    pats = []
    for tmpl, rel in E.TEMPLATES:
        parts = [_re.escape(p) for p in tmpl.split("{}")]
        pats.append(("^" + "(.+?)".join(parts) + "$", rel))
    return pats


def _mentions_sql_body() -> str:
    branches = []
    for pat, rel in _mention_patterns():
        q = _sql_quote(pat)
        branches.append(
            f"SELECT conv_id, turn_idx, {_sql_quote(rel)} AS rel,\n"
            f"       regexp_extract(text, {q}, 1) AS subj_surface,\n"
            f"       regexp_extract(text, {q}, 2) AS obj_surface\n"
            f"  FROM transcripts WHERE regexp_matches(text, {q})"
        )
    return "\nUNION ALL\n".join(branches)



LI_CTE = """
WITH li_base AS (
  SELECT DISTINCT l_orderkey, l_linenumber, l_partkey, l_suppkey,
         CAST(FLOOR(l_quantity) AS INT) AS l_qty
  FROM lineitem
),
li AS (
  SELECT 'http://example.org/li#obs-' || CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR)
           || '-' || CAST(l_partkey AS VARCHAR) || '-' || CAST(l_suppkey AS VARCHAR)
           || '-' || CAST(l_qty AS VARCHAR) AS obs,
         'http://example.org/li#ds-' || CAST(l_orderkey % 7 AS VARCHAR) AS ds,
         'http://example.org/part#' || CAST(l_partkey AS VARCHAR) AS v_part,
         CASE WHEN (l_orderkey * 31 + l_linenumber) % 211 = 0 THEN NULL
              ELSE 'http://example.org/supp#' || CAST(l_suppkey AS VARCHAR) END AS v_supp,
         'http://example.org/qty#' || CAST(l_qty AS VARCHAR) AS v_qty,
         CASE WHEN l_orderkey % 997 = 1 AND l_linenumber = 1 THEN 1 ELSE 0 END AS extra_ds
  FROM li_base
)"""



MT_CTE = """
WITH mt_base AS (
  SELECT 'http://example.org/mt#obs-' || CAST(o_orderkey AS VARCHAR) AS obs,
         'http://example.org/mt#ds-' || CAST(o_orderkey % 3 AS VARCHAR) AS ds,
         'http://example.org/cust#' || CAST(o_custkey AS VARCHAR) AS cust,
         CASE WHEN o_orderkey % 2 = 0 THEN 'http://example.org/mt#priceM'
              ELSE 'http://example.org/mt#taxM' END AS chosen,
         CASE WHEN o_orderkey % 89 = 0 THEN 1 ELSE 0 END AS seed15,
         CASE WHEN o_orderkey % 97 = 0 THEN 1 ELSE 0 END AS seed16
  FROM orders
)"""


def oracle_sql() -> dict[str, str]:
    tr = _transcripts_cte_clean()
    mentions = f"{tr},\nmentions AS (\n{_mentions_sql_body()}\n)"
    kg_linked = f"""{mentions},
linked AS (
  SELECT m.conv_id, m.turn_idx, m.rel, m.subj_surface, m.obj_surface,
         MIN(ds.entity) AS subj_entity, MIN(do_.entity) AS obj_entity
  FROM mentions m
  JOIN {_dict_values().replace('AS d(', 'AS ds(')} ON ds.surface = m.subj_surface
  JOIN {_dict_values().replace('AS d(', 'AS do_(')} ON do_.surface = m.obj_surface
  GROUP BY 1, 2, 3, 4, 5
)"""
    return {
        "ic1_exactly_one": """
            SELECT c_custkey, count(o_orderkey) AS n_orders
            FROM customer LEFT JOIN orders ON c_custkey = o_custkey
            GROUP BY c_custkey HAVING count(o_orderkey) != 1
        """,
        "ic12_duplicates": """
            SELECT l_orderkey, l_linenumber FROM (
              SELECT l_orderkey, l_linenumber,
                     min(l_linenumber) OVER w AS min_line,
                     count(*) OVER w AS grp
              FROM lineitem
              WINDOW w AS (PARTITION BY l_orderkey, l_partkey, l_suppkey)
            ) WHERE grp > 1 AND l_linenumber != min_line
        """,
        "anti_join": """
            SELECT c_custkey FROM customer
            WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
        """,
        "semi_join": """
            SELECT c_custkey FROM customer
            WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
        """,
        "path_join": """
            SELECT r_name, count(o_orderkey) AS n_orders
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name
        """,
        "star_join": """
            SELECT DISTINCT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'O'
            AND o_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
        """,
        "count_distinct": """
            SELECT n_name, count(DISTINCT c_mktsegment) AS n_segments
            FROM customer JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name
        """,
        "window_top1": """
            SELECT o_custkey, o_orderkey FROM (
              SELECT o_custkey, o_orderkey,
                     row_number() OVER (PARTITION BY o_custkey
                                        ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
              FROM orders
            ) WHERE rn = 1
        """,
        "set_except": """
            SELECT DISTINCT o_custkey AS c_custkey FROM orders
            EXCEPT
            SELECT DISTINCT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
        """,
        "ic17_group_size": """
            SELECT o_custkey, count(*) AS n_orders
            FROM orders GROUP BY o_custkey HAVING count(*) != 3
        """,
        "closure": """
            WITH RECURSIVE edges AS (
              SELECT o_orderkey AS src, o_orderkey * 2 AS dst FROM orders
              WHERE o_orderkey * 2 IN (SELECT o_orderkey FROM orders)
            ),
            reach(node) AS (
              SELECT o_orderkey FROM orders WHERE o_orderkey <= 32
              UNION
              SELECT e.dst FROM reach r JOIN edges e ON e.src = r.node
            )
            SELECT DISTINCT node AS o_orderkey FROM reach
        """,
        "kg_transcripts": f"{tr}\nSELECT conv_id, turn_idx, role, text, tool FROM transcripts",
        "kg_mentions": f"{mentions}\nSELECT * FROM mentions",
        "kg_triples": f"""{kg_linked}
            SELECT {_canon_case('subj_entity')} AS subj,
                   {_sql_quote(E.PRED_NS)} || rel AS pred,
                   {_canon_case('obj_entity')} AS obj,
                   count(*) AS n_mentions
            FROM linked
            GROUP BY 1, 2, 3
        """,
        "dedup_exact": """
            SELECT id, canonical_id, fingerprint FROM (
              SELECT doc_id AS id, md5(text) AS fingerprint,
                     min(doc_id) OVER (PARTITION BY md5(text)) AS canonical_id,
                     count(*) OVER (PARTITION BY md5(text)) AS grp
              FROM documents
            ) WHERE grp > 1 AND id != canonical_id
        """,
        "dedup_jaccard": """
            WITH toks AS (
              SELECT doc_id, DISTINCT_TOK.tok FROM documents,
                LATERAL (SELECT DISTINCT unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS tok) AS DISTINCT_TOK
              WHERE DISTINCT_TOK.tok != ''
            ),
            sizes AS (SELECT doc_id, count(*) AS n FROM toks GROUP BY doc_id),
            pairs AS (
              SELECT a.doc_id AS src, b.doc_id AS dst
              FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
            ),
            inter AS (
              SELECT p.src, p.dst, count(*) AS i
              FROM pairs p
              JOIN toks ta ON ta.doc_id = p.src
              JOIN toks tb ON tb.doc_id = p.dst AND tb.tok = ta.tok
              GROUP BY p.src, p.dst
            )
            SELECT p.src, p.dst,
                   round(COALESCE(i, 0) * 1.0 /
                         greatest(sa.n + sb.n - COALESCE(i, 0), 1), 6) AS jaccard
            FROM pairs p
            JOIN sizes sa ON sa.doc_id = p.src
            JOIN sizes sb ON sb.doc_id = p.dst
            LEFT JOIN inter ON inter.src = p.src AND inter.dst = p.dst
        """,
        "embedding_near_pairs": """
            SELECT a.vec_id AS src, b.vec_id AS dst,
                   round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) AS cosine
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE a.vec_id < 64
              AND round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) >= 0.2
        """,
        "ann_topk": """
            SELECT q_id, vec_id, cosine, rank FROM (
              SELECT q.vec_id AS q_id, d.vec_id AS vec_id,
                     round(list_cosine_similarity(CAST(d.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])), 6) AS cosine,
                     row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY round(list_cosine_similarity(CAST(d.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])), 6) DESC,
                                d.vec_id ASC) AS rank
              FROM embeddings d, embeddings q
              WHERE q.vec_id < 5 AND d.vec_id >= 5
            ) WHERE rank <= 10
        """,
        # integer-quantized IVF (operators/similarity.py::ivf_topk_exact):
        # every intermediate is int64, so this replica is bit-exact.
        # floordiv(s, n) below is the %-based floor division that evaluates
        # identically in Spark and DuckDB (both % are C-style); the final
        # division is true integer division (// here, `div` in Spark) so
        # there is no 2^53 double ceiling on per-cell sums.
        "ann_ivf": """
            WITH qdata AS (
              SELECT vec_id,
                     list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qv
              FROM embeddings WHERE vec_id >= 5
            ),
            long_v AS (
              SELECT vec_id, vec_id % 16 AS cell, i, qv[i + 1] AS v
              FROM qdata, (SELECT unnest(range(0, 64)) AS i)
            ),
            c0 AS (
              SELECT cell, i, ((s - (((s % n) + n) % n)) // n) AS m
              FROM (SELECT cell, i, SUM(v) AS s, COUNT(*) AS n FROM long_v GROUP BY cell, i)
            ),
            assign AS (
              SELECT vec_id, cell FROM (
                SELECT lv.vec_id, c.cell, SUM((lv.v - c.m) * (lv.v - c.m)) AS dist
                FROM long_v lv JOIN c0 c USING (i)
                GROUP BY lv.vec_id, c.cell
                QUALIFY row_number() OVER (PARTITION BY lv.vec_id ORDER BY dist, c.cell) = 1
              )
            ),
            c1 AS (
              SELECT cell, i, ((s - (((s % n) + n) % n)) // n) AS m
              FROM (SELECT a.cell, lv.i, SUM(lv.v) AS s, COUNT(*) AS n
                    FROM long_v lv JOIN assign a USING (vec_id) GROUP BY a.cell, lv.i)
            ),
            q_long AS (
              SELECT vec_id AS q_id, i,
                     list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))[i + 1] AS qval
              FROM embeddings, (SELECT unnest(range(0, 64)) AS i)
              WHERE vec_id < 5
            ),
            probes AS (
              SELECT q_id, cell FROM (
                SELECT ql.q_id, c.cell, SUM((ql.qval - c.m) * (ql.qval - c.m)) AS dist
                FROM q_long ql JOIN c1 c USING (i)
                GROUP BY ql.q_id, c.cell
                QUALIFY row_number() OVER (PARTITION BY ql.q_id ORDER BY dist, c.cell) <= 4
              )
            ),
            scored AS (
              -- CAST: DuckDB SUM(int) -> HUGEINT which the driver hashes as
              -- float64; Spark produces int64 (r04 finding, same class as the
              -- r03 sessionize fix). Values are identical (0/50 diffs).
              SELECT ql.q_id, lv.vec_id, CAST(SUM((lv.v - ql.qval) * (lv.v - ql.qval)) AS BIGINT) AS dist
              FROM long_v lv
              JOIN assign a USING (vec_id)
              JOIN probes p ON p.cell = a.cell
              JOIN q_long ql ON ql.q_id = p.q_id AND ql.i = lv.i
              GROUP BY ql.q_id, lv.vec_id
            )
            SELECT q_id, vec_id, dist,
                   row_number() OVER (PARTITION BY q_id ORDER BY dist, vec_id) AS rank
            FROM scored
            QUALIFY rank <= 10
        """,
        # converged flagged set of the stateful streaming dup check: all
        # but the minimum obs per (ds, custkey) — arrival-order
        # independent, so a window oracle can gate a streaming operator
        "streaming_ic12": """
            WITH o AS (
              SELECT 'd1' AS ds, CAST(o_custkey AS VARCHAR) AS dim_key,
                     'o' || lpad(CAST(o_orderkey AS VARCHAR), 10, '0') AS obs
              FROM orders
            )
            SELECT ds, dim_key, obs
            FROM (SELECT ds, dim_key, obs,
                         min(obs) OVER (PARTITION BY ds, dim_key) AS rep
                  FROM o)
            WHERE obs != rep
        """,
        "text_lang": _text_lang_sql(),
        "text_quality": _text_quality_sql(),
        "text_tokens": f"""
            SELECT doc_id AS id,
                   len(list_filter(regexp_split_to_array(text, '\\s+'), t -> t != '')) AS ws_tokens,
                   len(regexp_extract_all(text, {_sql_quote(textual.BPE_ISH_PATTERN)})) AS bpe_ish_tokens
            FROM documents
        """,
        # real container arithmetic: BMP file = 54-byte header + 4-aligned
        # rows; WAV = 44-byte header + 2 bytes/sample mono PCM; AVI =
        # 100-byte fixed header structure + 24 bytes per frame chunk
        # (8-byte chunk header + 16 frame bytes), 25 fps. The engine READS
        # these from the payload bytes; the oracle recomputes them from
        # the same (doc_id, text-length) parameters the builder used.
        "multimodal": """
            SELECT CAST(doc_id AS BIGINT) AS media_id,
                   CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
                   CAST(CASE CAST(doc_id % 3 AS INT)
                        WHEN 0 THEN 54 + (((doc_id % 61 + 1) * 3 + 3) // 4) * 4 * (doc_id % 13 + 1)
                        WHEN 1 THEN 44 + 2 * (octet_length(encode(text)) % 500 + 50)
                        ELSE 100 + 24 * (octet_length(encode(text)) % 48 + 2) END AS INT) AS n_bytes,
                   CAST(CASE WHEN doc_id % 3 = 0 THEN doc_id % 61 + 1
                             WHEN doc_id % 3 = 2 THEN doc_id % 320 + 16 END AS INT) AS width,
                   CAST(CASE WHEN doc_id % 3 = 0 THEN doc_id % 13 + 1
                             WHEN doc_id % 3 = 2 THEN doc_id % 240 + 16 END AS INT) AS height,
                   CAST(CASE WHEN doc_id % 3 = 1 THEN 8000 * (doc_id % 4 + 1) END AS INT) AS sample_rate,
                   CAST(CASE WHEN doc_id % 3 = 1
                             THEN ((octet_length(encode(text)) % 500 + 50) * 1000) // (8000 * (doc_id % 4 + 1))
                             WHEN doc_id % 3 = 2
                             THEN (octet_length(encode(text)) % 48 + 2) * 40
                        END AS INT) AS duration_ms
            FROM documents
        """,
        "multimodal_frames": """
            SELECT CAST(doc_id AS BIGINT) AS media_id,
                   CAST(frame_idx AS INT) AS frame_idx,
                   CAST(100 + 24 * frame_idx + 8 AS INT) AS byte_offset,
                   CAST(16 AS INT) AS n_bytes
            FROM documents,
                 LATERAL unnest(range(0, octet_length(encode(text)) % 48 + 2)) AS t(frame_idx)
            WHERE doc_id % 3 = 2
        """,
        "cube_ic1": LI_CTE
        + """
            SELECT obs, 2 AS n_datasets FROM li WHERE extra_ds = 1
        """,
        "cube_ic2": """
            SELECT 'http://example.org/sl#ds-' || CAST(n_nationkey AS VARCHAR) AS ds,
                   CASE WHEN n_nationkey % 7 = 3 THEN 0 ELSE 2 END AS n_dsds
            FROM nation WHERE n_nationkey % 7 = 3 OR n_nationkey % 5 = 0
        """,
        "cube_ic3": """
            SELECT 'http://example.org/sl#dsd-' || CAST(n_nationkey AS VARCHAR) AS dsd
            FROM nation WHERE n_nationkey % 4 = 1
        """,
        "cube_ic4": """
            SELECT 'http://example.org/sl#dim-' || CAST(n_nationkey AS VARCHAR) AS dim
            FROM nation WHERE n_nationkey % 6 = 2
        """,
        "cube_ic5": """
            SELECT 'http://example.org/sl#dim-' || CAST(n_nationkey AS VARCHAR) AS dim
            FROM nation WHERE n_nationkey % 6 = 4
        """,
        "cube_ic6": """
            SELECT 'http://example.org/sl#dim-' || CAST(n_nationkey AS VARCHAR) AS comp_prop
            FROM nation WHERE n_nationkey % 8 = 5
        """,
        "cube_ic7": """
            SELECT 'http://example.org/sl#slicekey-' || CAST(n_nationkey AS VARCHAR) AS slice_key
            FROM nation WHERE n_nationkey % 9 = 6
        """,
        "cube_ic8": """
            SELECT 'http://example.org/sl#rogue-' || CAST(n_nationkey AS VARCHAR) AS comp_prop
            FROM nation WHERE n_nationkey % 10 = 7
        """,
        "cube_ic9": """
            SELECT 'http://example.org/sl#slice-' || CAST(n_nationkey AS VARCHAR) AS slice,
                   CASE WHEN n_nationkey % 11 = 3 THEN 0 ELSE 2 END AS n_structures
            FROM nation WHERE n_nationkey % 11 = 3 OR n_nationkey % 11 = 8
        """,
        "cube_ic10": """
            SELECT 'http://example.org/sl#slice-' || CAST(n_nationkey AS VARCHAR) AS slice,
                   'http://example.org/sl#dim-' || CAST(n_nationkey AS VARCHAR) AS dim
            FROM nation WHERE n_nationkey % 12 = 9 AND n_nationkey % 11 != 3
            UNION ALL
            SELECT 'http://example.org/sl#slice-' || CAST(n_nationkey AS VARCHAR) AS slice,
                   'http://example.org/sl#rogue-' || CAST(n_nationkey AS VARCHAR) AS dim
            FROM nation WHERE n_nationkey % 10 = 7 AND n_nationkey % 11 != 3
            UNION ALL
            SELECT 'http://example.org/sl#slice-' || CAST(n_nationkey AS VARCHAR) AS slice,
                   'http://example.org/sl#dim-extra' AS dim
            FROM nation WHERE n_nationkey % 11 = 8
        """,
        "cube_ic18": """
            SELECT 'http://example.org/sl#ds-' || CAST(n_nationkey AS VARCHAR) AS ds,
                   'http://example.org/sl#obs-' || CAST(n_nationkey AS VARCHAR) || '-0' AS obs
            FROM nation WHERE n_nationkey % 13 = 10
        """,
        "dedup_minhash": """
            SELECT doc_id AS id, cmin AS canonical_id FROM (
              SELECT doc_id, MIN(doc_id) OVER (PARTITION BY doc_id // 3) AS cmin
              FROM documents
            ) WHERE doc_id != cmin
        """,
        "dedup_simhash": """
            SELECT a.doc_id AS src, b.doc_id AS dst, 0 AS hamming
            FROM documents a JOIN documents b
              ON a.doc_id // 3 = b.doc_id // 3 AND a.doc_id < b.doc_id
        """,
        "text_winnow": """
            SELECT doc_id AS id,
                   list_min(list_transform(grams, g -> md5(g))) AS min_fp,
                   len(grams) AS n_shingles
            FROM (
              SELECT doc_id,
                     list_distinct([substr(text, i, 8)
                                    FOR i IN range(1, greatest(length(text) - 7, 1) + 1)]) AS grams
              FROM documents
            )
        """,
        "cube_ic11": LI_CTE
        + """
            SELECT obs, 'http://example.org/li#dimSupp' AS dim FROM li WHERE v_supp IS NULL
        """,
        "cube_ic13": LI_CTE
        + """
            SELECT obs, 'http://example.org/li#attrCurrency' AS attr
            FROM li_base,
                 LATERAL (SELECT 'http://example.org/li#obs-' || CAST(l_orderkey AS VARCHAR)
                          || '-' || CAST(l_linenumber AS VARCHAR) || '-' || CAST(l_partkey AS VARCHAR)
                          || '-' || CAST(l_suppkey AS VARCHAR) || '-' || CAST(l_qty AS VARCHAR) AS obs)
            WHERE (l_orderkey * 17 + l_linenumber) % 307 = 0
        """,
        "cube_ic14": LI_CTE
        + """
            SELECT obs, 'http://example.org/li#price' AS measure
            FROM li_base,
                 LATERAL (SELECT 'http://example.org/li#obs-' || CAST(l_orderkey AS VARCHAR)
                          || '-' || CAST(l_linenumber AS VARCHAR) || '-' || CAST(l_partkey AS VARCHAR)
                          || '-' || CAST(l_suppkey AS VARCHAR) || '-' || CAST(l_qty AS VARCHAR) AS obs)
            WHERE (l_orderkey * 13 + l_linenumber) % 401 = 0
        """,
        "cube_ic12": LI_CTE
        + """
            , complete AS (
              SELECT obs, ds,
                     array_to_string(list_sort(list_distinct([v_part, v_supp, v_qty])), chr(1)) AS k
              FROM li WHERE v_supp IS NOT NULL
            ),
            flagged AS (
              SELECT obs, min(obs) OVER (PARTITION BY ds, k) AS m,
                     count(*) OVER (PARTITION BY ds, k) AS c
              FROM complete
            )
            SELECT obs FROM flagged WHERE c > 1 AND obs != m
        """,
        "bucketed_cube_ic12": LI_CTE
        + """
            , complete AS (
              SELECT obs, ds,
                     array_to_string(list_sort(list_distinct([v_part, v_supp, v_qty])), chr(1)) AS k
              FROM li WHERE v_supp IS NOT NULL
            ),
            flagged AS (
              SELECT obs, min(obs) OVER (PARTITION BY ds, k) AS m,
                     count(*) OVER (PARTITION BY ds, k) AS c
              FROM complete
            )
            SELECT obs FROM flagged WHERE c > 1 AND obs != m
        """,
        "enc_cube_ic1": LI_CTE
        + """
            SELECT obs, 2 AS n_datasets FROM li WHERE extra_ds = 1
        """,
        "enc_cube_ic11": LI_CTE
        + """
            SELECT obs, 'http://example.org/li#dimSupp' AS dim FROM li WHERE v_supp IS NULL
        """,
        "enc_cube_ic12": LI_CTE
        + """
            , complete AS (
              SELECT obs, ds,
                     array_to_string(list_sort(list_distinct([v_part, v_supp, v_qty])), chr(1)) AS k
              FROM li WHERE v_supp IS NOT NULL
            ),
            flagged AS (
              SELECT obs, min(obs) OVER (PARTITION BY ds, k) AS m,
                     count(*) OVER (PARTITION BY ds, k) AS c
              FROM complete
            )
            SELECT obs FROM flagged WHERE c > 1 AND obs != m
        """,
        "events_sessionize": """
            -- CAST: DuckDB sum(int) returns HUGEINT which the driver hashes as
            -- float64 ("56.0") vs Spark's int64 ("56") — values identical, hash
            -- red. BIGINT restores the exact-hash contract (r03 finding #1).
            SELECT user_id, CAST(sum(new_sess) AS BIGINT) AS n_sessions FROM (
              SELECT user_id,
                     CASE WHEN prev_ts IS NULL
                               OR epoch(ts) - epoch(prev_ts) > 1800 THEN 1 ELSE 0 END AS new_sess
              FROM (
                SELECT user_id, ts,
                       lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
                FROM events
              )
            ) GROUP BY user_id
        """,
        "cube_ic15": MT_CTE
        + """
            SELECT obs, chosen AS mt FROM mt_base WHERE seed15 = 1 AND seed16 = 0
        """,
        "cube_ic16": MT_CTE
        + """
            SELECT obs, 2 AS n_mt FROM mt_base WHERE seed16 = 1
        """,
        "cube_ic17": MT_CTE
        + """
            SELECT obs, tot - grp AS n_unequal FROM (
              SELECT obs, count(*) OVER (PARTITION BY ds, cust) AS grp,
                     count(*) OVER (PARTITION BY ds) AS tot
              FROM mt_base
            ) WHERE grp != 2
        """,
        "cube_ic19": """
            SELECT DISTINCT 'http://example.org/geo#nation-' || CAST(n_nationkey AS VARCHAR) AS value,
                   'http://example.org/geo#scheme-nations' AS cl
            FROM customer JOIN nation ON c_nationkey = n_nationkey
            WHERE n_nationkey % 5 = 0
        """,
        "cube_ic20": """
            SELECT DISTINCT 'http://example.org/geo#cust-' || CAST(c_custkey AS VARCHAR) AS value,
                   2 AS n_lists
            FROM customer JOIN nation ON c_nationkey = n_nationkey
            WHERE n_regionkey != 0
        """,
        "cube_ic21": """
            SELECT DISTINCT 'http://example.org/geo#cust-' || CAST(c_custkey AS VARCHAR) AS value,
                   2 AS n_lists
            FROM customer JOIN nation ON c_nationkey = n_nationkey
            WHERE n_regionkey != 1
        """,
        "events_window_agg": """
            SELECT CAST(FLOOR(epoch(ts) / 300) * 300 AS BIGINT) AS bucket_s,
                   event_type, count(*) AS n
            FROM events GROUP BY 1, 2
        """,
        "kg_turn_order": tr
        + """
            SELECT conv_id, turn_idx, prev_idx FROM (
              SELECT conv_id, turn_idx,
                     lag(turn_idx) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev_idx
              FROM transcripts
            ) WHERE prev_idx IS NOT NULL
        """,
        "events_latest": """
            SELECT user_id, event_type, event_id FROM (
              SELECT user_id, event_type, event_id,
                     row_number() OVER (PARTITION BY user_id, event_type
                                        ORDER BY ts DESC, event_id DESC) AS rn
              FROM events
            ) WHERE rn = 1
        """,
        "events_stats": """
            SELECT event_type, count(*) AS n,
                   round(min(value), 6) AS min_value,
                   round(max(value), 6) AS max_value
            FROM events GROUP BY event_type
        """,
    }


def _text_lang_sql() -> str:
    cols = []
    for lang, ws in sorted(textual.LANG_MARKERS.items()):
        pat = r"(?i)\b(" + "|".join(ws) + r")\b"
        cols.append(f"len(regexp_extract_all(text, {_sql_quote(pat)})) AS s_{lang}")
    score_cols = ", ".join(cols)
    langs = sorted(textual.LANG_MARKERS)
    best = "greatest(" + ", ".join(f"s_{l}" for l in langs) + ")"
    # Spark's array_max over struct(score, lang) breaks ties by the LARGEST
    # lang string, so the CASE checks languages in descending order.
    case = " ".join(f"WHEN s_{l} = best THEN '{l}'" for l in sorted(langs, reverse=True))
    return f"""
        SELECT id, CASE WHEN best > 0 THEN (CASE {case} END) ELSE 'und' END AS pred_lang,
               best AS score
        FROM (SELECT doc_id AS id, {best} AS best,
                     {", ".join(f"s_{l}" for l in langs)}
              FROM (SELECT doc_id, {score_cols} FROM documents))
    """


def _text_quality_sql() -> str:
    stop_pat = r"(?i)\b(" + "|".join(textual.STOPWORDS_EN) + r")\b"
    return f"""
        SELECT id, n_chars, n_tokens, punct_u6, stopword_u6,
               (least(n_tokens * 10000, 1000000) // 2
                + least(stopword_u6 * 5, 1000000) * 3 // 10
                + (1000000 - least(punct_u6 * 10, 1000000)) // 5) AS quality_u6
        FROM (
          SELECT id, n_chars, n_tokens,
                 n_punct * 1000000 // greatest(n_chars, 1) AS punct_u6,
                 n_stop * 1000000 // greatest(n_tokens, 1) AS stopword_u6
          FROM (
            SELECT doc_id AS id, length(text) AS n_chars,
                   len(list_filter(regexp_split_to_array(text, '\\s+'), t -> t != '')) AS n_tokens,
                   len(regexp_extract_all(text, '[^\\w\\s]')) AS n_punct,
                   len(regexp_extract_all(text, {_sql_quote(stop_pat)})) AS n_stop
            FROM documents
          )
        )
    """
