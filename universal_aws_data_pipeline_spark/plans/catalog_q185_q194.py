"""Catalog chunk: q185–q195 (round-7 batches 2-4 — entity resolution closure,
inference stats, Markov transitions, graph component audit, grouped
sketch quantiles).

Each completes an existing family along a missing axis: q185 closes the
record-linkage story (fuzzy PAIRS → transitive entity CLUSTERS), q186 adds
the two-proportion z-test to the inference family (Wilson q173, chi-square
q169), q187 adds the first-order Markov transition matrix to the journey
family (trigrams q165), q188 audits the co-purchase graph's component
structure (the CC engine's |V|-scale report), and q189 is the GROUPED form
of q159's engine-portable histogram quantiles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from universal_aws_data_pipeline_spark.plans._shared import (
    QUERIES,
    _NORM_SQL,
    _copurchase_edges,
    _t,
    register,
)
from universal_aws_data_pipeline_spark.plans.catalog_q001_q050 import _Q43_ORACLE

# --------------------------------------------------------------------------
# q185 — entity-resolution clusters (linkage family). Operators:
# operators/linkage.py::blocked_edit_distance_match (the q79 blocked
# Levenshtein matcher, run over TWO corrupted batches) +
# operators/graph.py::connected_components — fuzzy pairs are only half the
# linkage story; the deliverable is transitive ENTITIES with a canonical
# id. Cluster = {master, variant A, variant B}; canonical = min id = the
# master (ids are constructed above 1e6 for variants).
# Scale: block-bounded edit-distance joins (never all-pairs) + pointer-
# jumping CC (diameter 2 here — two rounds); output 3x|masters| rows.
# --------------------------------------------------------------------------
@register(
    "q185_entity_clusters",
    """
    WITH RECURSIVE clean AS (
      SELECT c_custkey AS id, lower(trim(c_name)) AS nm FROM customer
    ), dirty AS (
      SELECT id + 1000000 AS did,
             substr(nm, 1, (id % 5) + 2) || substr(nm, (id % 5) + 4) AS nm,
             right(nm, 4) AS blk
      FROM clean
      UNION ALL
      SELECT id + 2000000 AS did,
             substr(nm, 1, (id % 3) + 2) || substr(nm, (id % 3) + 4) AS nm,
             right(nm, 4) AS blk
      FROM clean
    ), matched AS (
      SELECT c.id AS a, d.did AS b
      FROM clean c JOIN dirty d ON right(c.nm, 4) = d.blk
      WHERE levenshtein(c.nm, d.nm) <= 1
    ), edges AS (
      SELECT a, b FROM matched UNION SELECT b, a FROM matched
    ), reach(id, lbl) AS (
      SELECT a, a FROM edges
      UNION
      SELECT e.b, r.lbl FROM reach r JOIN edges e ON e.a = r.id
    ), comp AS (
      SELECT id, min(lbl) AS entity_id FROM reach GROUP BY id
    )
    SELECT id AS member_id, entity_id,
           CAST(count(*) OVER (PARTITION BY entity_id) AS BIGINT) AS cluster_size,
           id = entity_id AS is_canonical
    FROM comp
    """,
    "entity resolution closure: two corrupted ingest batches fuzzy-matched to the master, match pairs closed into transitive entities via connected components, canonical = min id (linkage family)",
)
def q185(spark: SparkSession, sf_dir: str) -> DataFrame:
    """From fuzzy match PAIRS to transitive ENTITY clusters.
    operators/linkage.py::blocked_edit_distance_match +
    operators/graph.py::connected_components.

    Round 14 (VERDICT r13 item 2 — the grant's "evaluate q185" case,
    included after measuring): the entity LABEL table is a per-dataset
    parquet artifact. Unlike q43/q56/q188 there was no pre-existing edge
    artifact here, so the boundary moves from nothing straight to the
    component table: the blocked-Levenshtein match AND the closure both
    run at build (the cold series pays them in full — cache scrubbed per
    bench run); the warm plan scans (id, component) + the size rollup.
    Production-shape rationale is the same as q43's: entity clusters are
    re-read per downstream consumer and recomputed when an ingest batch
    changes the match graph, never per read."""
    from universal_aws_data_pipeline_spark.operators.linkage import (
        blocked_edit_distance_match,
    )
    from universal_aws_data_pipeline_spark.plans._shared import _cc_label_artifact

    clean = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"), F.lower(F.trim(F.col("c_name"))).alias("nm")
    )

    def corrupt(offset: int, mod: int) -> DataFrame:
        return clean.select(
            (F.col("id") + offset).alias("id"),
            F.expr(
                f"concat(substr(nm, 1, (id % {mod}) + 2), substr(nm, (id % {mod}) + 4))"
            ).alias("nm"),
        )

    def _edges() -> DataFrame:
        edges = None
        for offset, mod in ((1_000_000, 5), (2_000_000, 3)):
            m = blocked_edit_distance_match(
                clean,
                corrupt(offset, mod),
                block_fn=lambda c: F.substring(c, -4, 4),
                id_col="id",
                name_col="nm",
                max_distance=1,
            ).select(F.col("clean_id").alias("id_a"), F.col("dirty_id").alias("id_b"))
            edges = m if edges is None else edges.unionByName(m)
        return edges

    comp = _cc_label_artifact(spark, "entity_clusters", sf_dir, _edges)
    sizes = comp.groupBy("component").agg(
        F.count(F.lit(1)).cast("long").alias("cluster_size")
    )
    return comp.join(sizes, "component").select(
        F.col("id").alias("member_id"),
        F.col("component").alias("entity_id"),
        "cluster_size",
        (F.col("id") == F.col("component")).alias("is_canonical"),
    )


# --------------------------------------------------------------------------
# q186 — two-proportion z-test per event type (inference family, joining
# Wilson q173 and chi-square q169): users split into arms by key parity,
# and the tested proportion is "the user's FIRST event is this type" —
# each user contributes exactly one type, so proportions stay interior
# (per-type REACH saturates at 1.0 on this fixture: every user touches
# every type, pooled variance hits 0 and z is undefined — the guard below
# also nulls that case by contract). z is ONE shared IEEE expression
# string (Python builds it once for both engines), round(4) — the q173
# device. First-event selection orders by (ts, event_id): a TOTAL order,
# timestamps alone are not unique (the q133 lesson).
# Scale: one per-user window + two rollups; the per-arm totals ride a
# 1-row broadcast; |types|-row output.
# --------------------------------------------------------------------------
_Q186_Z = (
    "case when ca + cb = 0 or ca + cb = na + nb then null else "
    "round((cast(ca as double)/na - cast(cb as double)/nb) / "
    "sqrt(((ca+cb)/cast(na+nb as double)) * (1.0 - (ca+cb)/cast(na+nb as double))"
    " * (1.0/na + 1.0/nb)), 4) end"
)


@register(
    "q186_ab_test_z",
    f"""
    WITH ranked AS (
      SELECT user_id, user_id % 2 AS arm, event_type,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    ), first AS (
      SELECT user_id, arm, event_type FROM ranked WHERE rn = 1
    ), totals AS (
      SELECT CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
             CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb
      FROM first
    ), conv AS (
      SELECT event_type,
             CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
             CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cb
      FROM first GROUP BY event_type
    )
    SELECT event_type, ca, cb, na, nb, {_Q186_Z} AS z_score
    FROM conv CROSS JOIN totals
    """,
    "two-proportion z-test of first-event type between parity-split user arms: exact integer counts, pooled-variance z as one shared IEEE expression round(4), zero-variance guarded (inference family)",
)
def q186(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Do the arms differ in which event type users START with?
    Pooled-variance two-proportion z in the q173 single-IEEE-expression
    discipline."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    first = (
        ev.select(
            "user_id",
            (F.col("user_id") % 2).alias("arm"),
            "event_type",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    totals = first.agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).cast("long").alias("na"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).cast("long").alias("nb"),
    )
    conv = first.groupBy("event_type").agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).cast("long").alias("ca"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).cast("long").alias("cb"),
    )
    return conv.join(F.broadcast(totals)).select(
        "event_type", "ca", "cb", "na", "nb", F.expr(_Q186_Z).alias("z_score")
    )


# --------------------------------------------------------------------------
# q187 — first-order Markov transition matrix of event types (journey
# family, the matrix complement of q165's trigram mining): P(next | cur)
# over per-user event sequences, exact counts + floor-div micro
# probabilities. ORDER BY carries (ts, event_id) — the fixture's
# timestamps alone are not unique, and a partial order would make lag()
# engine-dependent (the q133 lesson).
# Scale: one lag window per user partition, then a map-side-combinable
# count to the |types|² matrix; row totals join on the tiny matrix.
# --------------------------------------------------------------------------
@register(
    "q187_markov_transitions",
    """
    WITH seq AS (
      SELECT user_id, event_type AS cur,
             lag(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS prev
      FROM events
    ), cnt AS (
      SELECT prev, cur, CAST(count(*) AS BIGINT) AS n
      FROM seq WHERE prev IS NOT NULL GROUP BY prev, cur
    ), tot AS (
      SELECT prev, sum(n) AS t FROM cnt GROUP BY prev
    )
    SELECT cnt.prev, cnt.cur, n,
           CAST((1000000 * n) // t AS BIGINT) AS p_micro
    FROM cnt JOIN tot USING (prev)
    """,
    "first-order Markov transition matrix of per-user event sequences: exact transition counts and floor-div micro probabilities over a total (ts, event_id) order (journey family)",
)
def q187(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What does each event type lead to next? P(next | cur) per user
    journey, |types|²-bounded output."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("cur"), F.lag("event_type").over(w).alias("prev")
    ).filter(F.col("prev").isNotNull())
    cnt = seq.groupBy("prev", "cur").agg(F.count(F.lit(1)).cast("long").alias("n"))
    tot = cnt.groupBy("prev").agg(F.sum("n").alias("t"))
    return cnt.join(tot, "prev").select(
        "prev", "cur", "n", F.expr("(1000000 * n) div t").alias("p_micro")
    )


# --------------------------------------------------------------------------
# q188 — co-purchase component-size census (graph family). Operators:
# operators/graph.py::connected_components over the SHARED
# `_copurchase_edges` artifact (fifth consumer after q116/q148/q149/q154).
# The |V|-scale structural audit: a healthy co-purchase graph has one
# giant component plus a long tail; a shattered one means the support
# threshold is starving downstream miners.
# Scale: pointer-jumping CC (one shuffle join per round, observe()-gated
# convergence), then two tiny rollups; output is |distinct sizes| rows.
# --------------------------------------------------------------------------
@register(
    "q188_component_census",
    """
    WITH RECURSIVE op AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ), e AS (
      SELECT a.p AS x, b.p AS y
      FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
      GROUP BY a.p, b.p HAVING count(*) >= 2
    ), edges AS (
      SELECT x AS a, y AS b FROM e UNION SELECT y, x FROM e
    ), reach(id, lbl) AS (
      SELECT a, a FROM edges
      UNION
      SELECT ed.b, r.lbl FROM reach r JOIN edges ed ON ed.a = r.id
    ), comp AS (
      SELECT id, min(lbl) AS component FROM reach GROUP BY id
    ), sizes AS (
      SELECT component, CAST(count(*) AS BIGINT) AS cluster_size FROM comp GROUP BY component
    )
    SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_components,
           CAST(sum(cluster_size) AS BIGINT) AS n_parts
    FROM sizes GROUP BY cluster_size
    """,
    "component-size census of the support>=2 co-purchase graph via pointer-jumping connected components over the shared edge artifact: the structural health audit for every graph miner downstream (graph family)",
)
def q188(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How does the co-purchase graph decompose into components?
    operators/graph.py::connected_components over plans/_shared.py::
    _copurchase_edges.

    Round 14 (VERDICT r13 item 2, adjudicated GRANT): the component LABEL
    table is a per-dataset parquet artifact layered on the (already
    blessed) co-purchase edge artifact — the closure runs once per dataset
    at build; the warm plan scans (id, component) and runs the two census
    rollups. Cold pays edge mining + closure + write (cache scrubbed per
    bench run)."""
    from universal_aws_data_pipeline_spark.plans._shared import _cc_label_artifact

    comp = _cc_label_artifact(
        spark,
        "copurchase_components",
        sf_dir,
        lambda: _copurchase_edges(spark, sf_dir),
        src="a",
        dst="b",
    )
    sizes = comp.groupBy("component").agg(
        F.count(F.lit(1)).cast("long").alias("cluster_size")
    )
    return sizes.groupBy("cluster_size").agg(
        F.count(F.lit(1)).cast("long").alias("n_components"),
        F.sum("cluster_size").cast("long").alias("n_parts"),
    )


# --------------------------------------------------------------------------
# q189 — per-language token-length quantiles via the grouped histogram
# sketch (sketch family). Operators: operators/sketch.py::
# grouped_value_histogram + grouped_histogram_quantiles — q159's
# engine-portable quantile arithmetic with the cumulative walk windowed
# PER GROUP (parallelism = group count, no global sort). The corpus-
# profiling readout a mixture planner consumes (doc-length percentile
# bands per language).
# Scale: one map-side-combinable agg to |langs| x 32 bins, then
# sketch-sized integer arithmetic. Domain [0, 256) tokens, 8-token bins.
# --------------------------------------------------------------------------
_Q189_LO, _Q189_W, _Q189_NB = 0, 8, 32
_Q189_PS = [500, 900, 990]


@register(
    "q189_lang_length_quantiles",
    f"""
    WITH v AS (
      SELECT lang, CAST(len(string_split({_NORM_SQL}, ' ')) AS BIGINT) AS nt
      FROM documents
    ), h AS (
      SELECT lang,
             LEAST(GREATEST(CAST(floor((nt - {_Q189_LO}) / {_Q189_W}.0) AS BIGINT), 0), {_Q189_NB - 1}) AS bin,
             count(*) AS c
      FROM v GROUP BY 1, 2
    ), cum AS (
      SELECT lang, bin, c, sum(c) OVER (PARTITION BY lang ORDER BY bin) AS cum FROM h
    ), n AS (SELECT lang, sum(c) AS n FROM h GROUP BY lang),
    p AS (SELECT unnest([{", ".join(str(p) for p in _Q189_PS)}]) AS p_mille),
    r AS (
      SELECT n.lang, CAST(p_mille AS BIGINT) AS p_mille,
             1 + (p_mille * (n.n - 1)) // 1000 AS r
      FROM p CROSS JOIN n
    ),
    hit AS (
      SELECT r.lang, r.p_mille, min(cum.bin) AS bin
      FROM r JOIN cum ON cum.lang = r.lang AND cum.cum >= r.r
      GROUP BY r.lang, r.p_mille
    )
    SELECT hit.lang, hit.p_mille,
           CAST({_Q189_LO} + hit.bin * {_Q189_W} + ({_Q189_W} * (r.r - (cum.cum - cum.c))) // cum.c AS BIGINT) AS est
    FROM hit
    JOIN r ON hit.lang = r.lang AND hit.p_mille = r.p_mille
    JOIN cum ON cum.lang = hit.lang AND cum.bin = hit.bin
    """,
    "per-language token-length p50/p90/p99 via the grouped 32-bin histogram sketch: q159's engine-portable integer quantile arithmetic with per-group cumulative windows (sketch family)",
)
def q189(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc-length percentile bands per language from a mergeable sketch.
    operators/sketch.py::grouped_value_histogram +
    grouped_histogram_quantiles."""
    from universal_aws_data_pipeline_spark.functions.texthash import tokens_col
    from universal_aws_data_pipeline_spark.operators.sketch import (
        grouped_histogram_quantiles,
        grouped_value_histogram,
    )

    d = _t(spark, sf_dir, "documents")
    v = d.select("lang", F.size(tokens_col(F.col("text"))).cast("long").alias("nt"))
    hist = grouped_value_histogram(
        v, "lang", F.col("nt"), _Q189_LO, _Q189_W, _Q189_NB
    )
    return grouped_histogram_quantiles(hist, "lang", _Q189_PS, _Q189_LO, _Q189_W)


# --------------------------------------------------------------------------
# q190 — degree distribution of the co-purchase graph (graph family,
# completing q188's census): per power-of-two degree bucket, node and edge
# mass. Bucket = length(bin(degree)) - 1 — an INTEGER log2 both engines
# compute identically (no float log at exact powers). Sixth consumer of
# the shared `_copurchase_edges` artifact.
# Scale: one degree rollup over the edge table + a |buckets|-row agg.
# --------------------------------------------------------------------------
@register(
    "q190_degree_distribution",
    """
    WITH op AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ), e AS (
      SELECT a.p AS x, b.p AS y
      FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
      GROUP BY a.p, b.p HAVING count(*) >= 2
    ), deg AS (
      SELECT node, CAST(count(*) AS BIGINT) AS d FROM (
        SELECT x AS node FROM e UNION ALL SELECT y FROM e
      ) GROUP BY node
    )
    SELECT CAST(length(bin(d)) - 1 AS BIGINT) AS log2_bucket,
           CAST(count(*) AS BIGINT) AS n_nodes,
           CAST(sum(d) AS BIGINT) AS degree_mass
    FROM deg GROUP BY length(bin(d)) - 1
    """,
    "power-of-two degree distribution of the support>=2 co-purchase graph (integer log2 via binary-string length): the skew fingerprint that predicts which graph miners need degree caps (graph family)",
)
def q190(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How heavy is the co-purchase graph's degree tail?
    plans/_shared.py::_copurchase_edges + one rollup."""
    edges = _copurchase_edges(spark, sf_dir)
    deg = (
        edges.select(F.col("a").alias("node"))
        .unionByName(edges.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    return deg.groupBy(
        (F.length(F.expr("bin(d)")) - 1).cast("long").alias("log2_bucket")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.sum("d").cast("long").alias("degree_mass"),
    )


# --------------------------------------------------------------------------
# q191 — order-to-ship SLA audit per priority (warehouse ops family): per
# o_orderpriority, how many lineitems shipped late (> 60 days after the
# order date), the late rate in micro-units, and the mean lateness among
# late lines in milli-days — exact integer datediffs + floor divs.
# Scale: the standard orders->lineitem equi-join (TPC-H shape) into one
# grouped conditional agg; |priorities|-row output.
# --------------------------------------------------------------------------
@register(
    "q191_ship_sla",
    """
    WITH lag AS (
      SELECT o_orderpriority,
             CAST(datediff('day', o_orderdate, l_shipdate) AS BIGINT) AS days
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    )
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CASE WHEN days > 60 THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
           CAST((1000000 * sum(CASE WHEN days > 60 THEN 1 ELSE 0 END)) // count(*) AS BIGINT) AS late_micro,
           CAST((1000 * sum(CASE WHEN days > 60 THEN days ELSE 0 END))
                // greatest(sum(CASE WHEN days > 60 THEN 1 ELSE 0 END), 1) AS BIGINT) AS late_mean_milli
    FROM lag GROUP BY o_orderpriority
    """,
    "order-to-ship SLA audit per priority: late-line rate and mean lateness among late lines, exact integer datediffs and floor-div rates (warehouse ops family)",
)
def q191(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which priorities breach the 60-day ship SLA, and by how much?"""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    lag = o.join(li, o["o_orderkey"] == li["l_orderkey"]).select(
        "o_orderpriority",
        F.datediff("l_shipdate", "o_orderdate").cast("long").alias("days"),
    )
    late = F.when(F.col("days") > 60, 1).otherwise(0)
    return (
        lag.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum(late).cast("long").alias("n_late"),
            F.sum(F.when(F.col("days") > 60, F.col("days")).otherwise(0))
            .cast("long")
            .alias("_late_days"),
        )
        .select(
            "o_orderpriority",
            "n_lines",
            "n_late",
            F.expr("(1000000 * n_late) div n_lines").alias("late_micro"),
            F.expr("(1000 * _late_days) div greatest(n_late, 1)").alias(
                "late_mean_milli"
            ),
        )
    )


# --------------------------------------------------------------------------
# q192 — near-dup cluster quality spread (dedup x text quality,
# composing two stressed engines): per q43 duplicate cluster, the min/max
# composite quality score of its members — the evidence behind
# keep-BEST-per-cluster (q76): when spread is ~0 any survivor works; a
# wide spread means naive keep-first throws away the good copy. Quality
# is the q105 round(4) expression; min/max SELECT existing values (no
# float-sum order anywhere), spread re-rounds the difference.
# Scale: clusters come from the checkpointed q43 pair artifact + CC;
# quality is one map pass; the join and rollup are |clustered-docs|-sized.
# --------------------------------------------------------------------------
@register(
    "q192_cluster_quality_spread",
    f"""
    WITH clusters AS ({_Q43_ORACLE}),
    corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 100000, regexp_replace(text, '\\s+\\S+$', '') FROM documents
    ), scored AS (
      SELECT doc_id,
             round((least(1.0, ntok / 100.0) + alpha_ratio
                    + (1.0 - least(1.0, digit_ratio + punct_ratio))
                    + CASE WHEN mean_tok_len >= 3.0 AND mean_tok_len <= 10.0 THEN 1.0 ELSE 0.5 END) / 4.0,
                   4) AS quality
      FROM (
        SELECT doc_id, ntok,
          (n - length(regexp_replace(text, '[A-Za-z]', '', 'g'))) / n AS alpha_ratio,
          (n - length(regexp_replace(text, '[0-9]', '', 'g'))) / n AS digit_ratio,
          (n - length(regexp_replace(text, '[\\.,;:!\\?]', '', 'g'))) / n AS punct_ratio,
          CAST(length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE) / ntok AS mean_tok_len
        FROM (
          SELECT doc_id, text, CAST(length(text) AS DOUBLE) AS n,
                 len(string_split_regex(trim(text), '\\s+')) AS ntok
          FROM corpus
        )
      )
    )
    SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size,
           min(quality) AS q_min, max(quality) AS q_max,
           round(max(quality) - min(quality), 4) AS q_spread
    FROM clusters JOIN scored USING (doc_id)
    GROUP BY cluster_id
    """,
    "per near-dup cluster: the quality spread across members — zero spread means any survivor works, wide spread is the keep-best-per-cluster motivation made measurable (dedup x quality)",
)
def q192(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Do duplicate families span quality tiers?
    Composes q43's cluster engine with operators/text.py::quality_score."""
    from universal_aws_data_pipeline_spark.operators.text import quality_score

    clusters = QUERIES["q43_dup_clusters"].fn(spark, sf_dir).select(
        "doc_id", "cluster_id"
    )
    d = _t(spark, sf_dir, "documents")
    corpus = d.select("doc_id", "text").unionByName(
        d.select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            F.regexp_replace("text", r"\s+\S+$", "").alias("text"),
        )
    )
    scored = corpus.select("doc_id", quality_score(F.col("text")).alias("quality"))
    return (
        clusters.join(scored, "doc_id")
        .groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("cluster_size"),
            F.min("quality").alias("q_min"),
            F.max("quality").alias("q_max"),
            F.round(F.max("quality") - F.min("quality"), 4).alias("q_spread"),
        )
    )


# --------------------------------------------------------------------------
# q193 — per-supplier ship-lag percentile bands via the grouped sketch
# (sketch family; the q189 device on a second domain, proving the grouped
# quantile operator generalizes): p10/p50/p90 of order-to-ship days per
# supplier from a 32-bin histogram — the supplier-consistency readout a
# procurement mart publishes.
# Scale: orders->lineitem join + one map-side-combinable agg to
# |suppliers| x 32 bins; estimates are sketch-sized integer arithmetic.
# Domain [0, 128) days, 4-day bins.
# --------------------------------------------------------------------------
_Q193_LO, _Q193_W, _Q193_NB = 0, 4, 32
_Q193_PS = [100, 500, 900]


@register(
    "q193_supplier_lag_bands",
    f"""
    WITH v AS (
      SELECT l_suppkey, CAST(datediff('day', o_orderdate, l_shipdate) AS BIGINT) AS days
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ), h AS (
      SELECT l_suppkey,
             LEAST(GREATEST(CAST(floor((days - {_Q193_LO}) / {_Q193_W}.0) AS BIGINT), 0), {_Q193_NB - 1}) AS bin,
             count(*) AS c
      FROM v GROUP BY 1, 2
    ), cum AS (
      SELECT l_suppkey, bin, c, sum(c) OVER (PARTITION BY l_suppkey ORDER BY bin) AS cum FROM h
    ), n AS (SELECT l_suppkey, sum(c) AS n FROM h GROUP BY l_suppkey),
    p AS (SELECT unnest([{", ".join(str(p) for p in _Q193_PS)}]) AS p_mille),
    r AS (
      SELECT n.l_suppkey, CAST(p_mille AS BIGINT) AS p_mille,
             1 + (p_mille * (n.n - 1)) // 1000 AS r
      FROM p CROSS JOIN n
    ),
    hit AS (
      SELECT r.l_suppkey, r.p_mille, min(cum.bin) AS bin
      FROM r JOIN cum ON cum.l_suppkey = r.l_suppkey AND cum.cum >= r.r
      GROUP BY r.l_suppkey, r.p_mille
    )
    SELECT hit.l_suppkey, hit.p_mille,
           CAST({_Q193_LO} + hit.bin * {_Q193_W} + ({_Q193_W} * (r.r - (cum.cum - cum.c))) // cum.c AS BIGINT) AS est
    FROM hit
    JOIN r ON hit.l_suppkey = r.l_suppkey AND hit.p_mille = r.p_mille
    JOIN cum ON cum.l_suppkey = hit.l_suppkey AND cum.bin = hit.bin
    """,
    "per-supplier order-to-ship p10/p50/p90 day bands via the grouped 32-bin histogram sketch — the q189 grouped quantile device generalized to a second domain (sketch family)",
)
def q193(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which suppliers ship consistently, which have fat tails?
    operators/sketch.py::grouped_value_histogram +
    grouped_histogram_quantiles."""
    from universal_aws_data_pipeline_spark.operators.sketch import (
        grouped_histogram_quantiles,
        grouped_value_histogram,
    )

    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    v = o.join(li, o["o_orderkey"] == li["l_orderkey"]).select(
        "l_suppkey",
        F.datediff("l_shipdate", "o_orderdate").cast("long").alias("days"),
    )
    hist = grouped_value_histogram(
        v, "l_suppkey", F.col("days"), _Q193_LO, _Q193_W, _Q193_NB
    )
    return grouped_histogram_quantiles(hist, "l_suppkey", _Q193_PS, _Q193_LO, _Q193_W)


# --------------------------------------------------------------------------
# q194 — int8 quantization error audit (similarity family). Operators:
# operators/similarity.py::quantize_vec — q104's production quantizer,
# audited numerically: per vector the relative reconstruction MSE
# floor(1e6 · Σ(x − round(x/s)·s)² / Σx²) with s = max|x|/127, then an
# EXACT integer rollup per label (sum/max of the per-vector micro values,
# mean via floor div). The per-vector value is one ordered IEEE fold
# (F.aggregate ↔ list_sum over list_transform — the q17 _cos_sql
# precedent), so both engines replay it bit-for-bit.
# Scale: map-only per vector + one |labels|-row agg.
# --------------------------------------------------------------------------
_Q194_ERR = """
CAST(floor(1000000.0 * (
  list_sum(list_transform({v}, x ->
    (CAST(x AS DOUBLE) - round(CAST(x AS DOUBLE) / {s}) * {s})
    * (CAST(x AS DOUBLE) - round(CAST(x AS DOUBLE) / {s}) * {s})))
  / list_sum(list_transform({v}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))
)) AS BIGINT)
"""


@register(
    "q194_quantization_error",
    f"""
    WITH q AS (
      SELECT label,
             {_Q194_ERR.format(v="embedding", s="(greatest(list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))), 1e-12) / 127.0)")} AS err_micro
      FROM embeddings
    )
    SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
           CAST(sum(err_micro) // count(*) AS BIGINT) AS mean_err_micro,
           CAST(max(err_micro) AS BIGINT) AS max_err_micro
    FROM q GROUP BY label
    """,
    "relative reconstruction MSE of the q104 int8 quantizer per label (micro-units, per-vector ordered IEEE fold then exact integer rollup): the numeric-honesty audit behind the quantized ANN tier (similarity family)",
)
def q194(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How much signal does int8 quantization cost, per label?
    operators/similarity.py::quantize_vec replayed with its error."""
    from universal_aws_data_pipeline_spark.operators.similarity import quantize_vec

    e = _t(spark, sf_dir, "embeddings")
    scale, _ = quantize_vec(F.col("embedding"))
    # materialize the scale once per row so the per-element lambda reuses
    # ONE computed value (Spark HOF lambdas have no CSE)
    with_s = e.select("label", F.col("embedding"), scale.alias("_s"))
    recon_err = F.aggregate(
        F.transform(
            F.transform(F.col("embedding"), lambda x: x.cast("double")),
            lambda x: (x - F.round(x / F.col("_s")) * F.col("_s"))
            * (x - F.round(x / F.col("_s")) * F.col("_s")),
        ),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )
    energy = F.aggregate(
        F.transform(F.col("embedding"), lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )
    per_vec = with_s.select(
        "label",
        F.floor(F.lit(1_000_000.0) * (recon_err / energy)).cast("long").alias(
            "err_micro"
        ),
    )
    return per_vec.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
        F.expr("sum(err_micro) div count(1)").alias("mean_err_micro"),
        F.max("err_micro").cast("long").alias("max_err_micro"),
    )


# --------------------------------------------------------------------------
# q195 — embedding whitening on the integer grid (similarity family,
# closing the chunk's span at q195). Per-dim mean/var derive from EXACT
# integer sums on the 1e-6 grid (the q157 device — order-proof), so the
# z-score for each sampled vector is ONE deterministic IEEE expression
# over exact integers, round(4). Sample = vec_id % 101 == 0 (the q45
# pure-key membership contract) — whitening every vector would emit the
# corpus; the audit needs the TRANSFORM verified, not materialized.
# Scale: one posexplode agg to 64 rows (broadcast back) + a map over the
# key-sampled subset.
# --------------------------------------------------------------------------
_Q195_Z = (
    "round((CAST(xq AS DOUBLE) - CAST(sx AS DOUBLE) / n) / "
    "sqrt((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) / (CAST(n AS DOUBLE) * n)), 4)"
)


@register(
    "q195_embedding_whitening",
    f"""
    WITH x AS (
      SELECT vec_id, j + 1 AS dim,
             CAST(round(CAST(embedding[j + 1] AS DOUBLE) * 1000000) AS BIGINT) AS xq
      FROM embeddings CROSS JOIN (SELECT unnest(range(0, 64)) AS j)
    ), stats AS (
      SELECT dim, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(xq) AS BIGINT) AS sx, CAST(sum(xq * xq) AS BIGINT) AS sxx
      FROM x GROUP BY dim
    )
    SELECT vec_id, x.dim, {_Q195_Z} AS z
    FROM x JOIN stats ON x.dim = stats.dim
    WHERE vec_id % 101 = 0
    """,
    "per-dim whitening (z-score) of a key-sampled vector subset: mean/var from exact integer sums on the 1e-6 grid (order-proof), one deterministic IEEE z expression round(4) — the standardization step before distance-based mining (similarity family)",
)
def q195(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standardize embeddings against per-dim corpus statistics.
    The q157 integer-grid device extended from audit to TRANSFORM."""
    e = _t(spark, sf_dir, "embeddings")
    x = e.select(
        "vec_id", F.posexplode("embedding").alias("j", "v")
    ).select(
        "vec_id",
        (F.col("j") + 1).alias("dim"),
        F.round(F.col("v").cast("double") * 1_000_000).cast("long").alias("xq"),
    )
    stats = x.groupBy("dim").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("xq").cast("long").alias("sx"),
        F.sum(F.col("xq") * F.col("xq")).cast("long").alias("sxx"),
    )
    return (
        x.filter(F.col("vec_id") % 101 == 0)
        .join(F.broadcast(stats), "dim")
        .select("vec_id", "dim", F.expr(_Q195_Z).alias("z"))
    )
