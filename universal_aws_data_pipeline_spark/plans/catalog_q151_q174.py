"""Catalog chunk: q151–q174 (stats/seasonality, itemsets, survival, robust).

Mechanically split from the former single-file catalog (round 7); the
assembler in ``plans/catalog.py`` imports every chunk and enforces the
pinned registration order, so query placement here never changes the
driver's graded window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from universal_aws_data_pipeline_spark.plans._shared import (
    register,
    _t,
    _NORM_SQL,
    _cos_sql,
    _hex_int_sql,
    _copurchase_edges,
)
@register(
    "q151_cusum_changepoints",
    """
    WITH d AS (
      SELECT event_type, CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ), m AS (
      SELECT event_type, CAST((1000 * sum(n)) // count(*) AS BIGINT) AS mean_milli
      FROM d GROUP BY event_type
    ), c AS (
      SELECT d.event_type, d.day, m.mean_milli,
             CAST(sum(1000 * d.n - m.mean_milli)
                  OVER (PARTITION BY d.event_type ORDER BY d.day) AS BIGINT) AS cs
      FROM d JOIN m USING (event_type)
    ), s AS (
      SELECT event_type, day, mean_milli,
             cs - least(CAST(0 AS BIGINT),
                        CAST(min(cs) OVER (PARTITION BY event_type ORDER BY day) AS BIGINT)) AS cusum
      FROM c
    )
    SELECT event_type,
           CAST(count(CASE WHEN cusum > 5 * mean_milli THEN 1 END) AS BIGINT) AS n_alarm_days,
           min(CASE WHEN cusum > 5 * mean_milli THEN day END) AS first_alarm_day,
           CAST(max(cusum) AS BIGINT) AS max_cusum_milli
    FROM s GROUP BY event_type
    """,
    "CUSUM changepoint detection on daily event volume: the max(0, S+dev) recursion rewritten as running-sum-minus-running-min (two prefix windows over the calendar-bounded daily table), integer milli-units, 5-mean-days alarm threshold (time-series family)",
)
def q151(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Where did the volume regime shift? One-sided CUSUM accumulates
    excess over the per-type mean and alarms when the cumulated drift
    exceeds five average days. The recursion S_i = max(0, S_{i-1}+dev_i)
    has no direct window form; the running-sum-minus-running-minimum
    identity computes it with two prefix windows — over the tiny daily
    aggregate, never the raw stream. Exact integer milli-units."""
    from pyspark.sql.window import Window

    e = _t(spark, sf_dir, "events")
    d = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    m = d.groupBy("event_type").agg(
        F.expr("(1000 * sum(n)) div count(*)").cast("long").alias("mean_milli")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    c = (
        d.join(F.broadcast(m), "event_type")
        .withColumn("cs", F.sum(F.lit(1000) * F.col("n") - F.col("mean_milli")).over(w).cast("long"))
    )
    s = c.withColumn(
        "cusum",
        F.col("cs") - F.least(F.lit(0).cast("long"), F.min("cs").over(w).cast("long")),
    )
    alarm = F.col("cusum") > 5 * F.col("mean_milli")
    return s.groupBy("event_type").agg(
        F.count(F.when(alarm, 1)).cast("long").alias("n_alarm_days"),
        F.min(F.when(alarm, F.col("day"))).alias("first_alarm_day"),
        F.max("cusum").cast("long").alias("max_cusum_milli"),
    )


# --------------------------------------------------------------------------
# q152 — Benford first-digit audit on order prices (A-family). Operators:
# leading-digit histogram vs the Benford expectation log10(1+1/d), shipped
# as PRECOMPUTED integer micro literals (float log in-engine would be an
# ulp hazard); deviations in exact micro-share units via floor-div. The
# standard forensic screen for fabricated/synthetic monetary data.
# Scale: one map-side-combinable 9-bucket aggregation + a broadcast scalar
# attach of the total; output is 9 rows forever.
# --------------------------------------------------------------------------
_BENFORD_MICRO = {d: round(1_000_000 * __import__("math").log10(1 + 1 / d)) for d in range(1, 10)}


@register(
    "q152_benford_audit",
    f"""
    WITH digits AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS INTEGER) AS digit
      FROM orders
    ), hist AS (
      SELECT digit, CAST(count(*) AS BIGINT) AS n_obs FROM digits GROUP BY digit
    ), tot AS (
      SELECT CAST(sum(n_obs) AS BIGINT) AS total FROM hist
    ), exp AS (
      SELECT * FROM (VALUES {", ".join(f"({d}, {v})" for d, v in _BENFORD_MICRO.items())}) AS t(digit, exp_micro)
    )
    SELECT h.digit, h.n_obs,
           CAST((1000000 * h.n_obs) // t.total AS BIGINT) AS obs_micro,
           CAST(e.exp_micro AS BIGINT) AS exp_micro,
           CAST(abs((1000000 * h.n_obs) // t.total - e.exp_micro) AS BIGINT) AS abs_dev_micro
    FROM hist h CROSS JOIN tot t JOIN exp e USING (digit)
    """,
    "Benford first-digit audit on order prices: leading-digit shares vs the log10(1+1/d) expectation in exact integer micro-units (precomputed literals — no in-engine float log), 9-row output — the forensic screen for fabricated monetary data (A-family)",
)
def q152(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Do the prices obey Benford's law? Natural multi-magnitude monetary
    data puts ~30.1% of leading digits at 1; uniform-synthetic data puts
    ~11.1% everywhere — the deviation column IS the detector (the fixture's
    uniform price generator fails the screen loudly, which is the point:
    this is the data-quality probe that catches synthetic injections).
    Expected shares ship as integer micro literals; one 9-bucket agg."""
    o = _t(spark, sf_dir, "orders")
    digits = o.select(
        F.substring(F.floor("o_totalprice").cast("long").cast("string"), 1, 1)
        .cast("int")
        .alias("digit")
    )
    hist = digits.groupBy("digit").agg(F.count(F.lit(1)).cast("long").alias("n_obs"))
    tot = hist.agg(F.sum("n_obs").cast("long").alias("total"))
    exp = spark.createDataFrame(
        [(d, v) for d, v in _BENFORD_MICRO.items()], "digit: int, exp_micro: long"
    )
    obs = F.expr("(1000000 * n_obs) div total").cast("long")
    return (
        hist.crossJoin(F.broadcast(tot))
        .join(F.broadcast(exp), "digit")
        .select(
            "digit",
            "n_obs",
            obs.alias("obs_micro"),
            F.col("exp_micro").cast("long").alias("exp_micro"),
            F.abs(obs - F.col("exp_micro")).cast("long").alias("abs_dev_micro"),
        )
    )


# --------------------------------------------------------------------------
# q153 — EWMA smoothing of daily revenue-event value (time-series family).
# Operators: exponential smoothing with integer weights — w_j =
# round(1e6 * 0.8^j) shipped as literals (in-engine pow(0.8,j) is an
# engine-ulp hazard), truncated at 30 lags (0.8^30 < 1e-3 of the mass).
# The EWMA recursion becomes a BOUNDED range self-join over the daily
# aggregate: exact cent sums, weight lookup by day-gap, floor-div ratio.
# Scale: the self-join runs on the |types x days| table (calendar-bounded,
# never raw events) with a <=30-row expansion per row; the daily agg
# itself is one map-side-combinable shuffle of the stream.
# --------------------------------------------------------------------------
_EWMA_LAGS = 30
_EWMA_W = [round(1_000_000 * (0.8**j)) for j in range(_EWMA_LAGS)]


@register(
    "q153_ewma_daily_value",
    f"""
    WITH v AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v_cents
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ), j AS (
      SELECT a.event_type, a.day, a.v_cents,
             b.v_cents AS bv,
             [{", ".join(str(w) for w in _EWMA_W)}][datediff('day', b.day, a.day) + 1] AS w
      FROM v a JOIN v b
        ON a.event_type = b.event_type
       AND b.day <= a.day AND b.day > a.day - {_EWMA_LAGS}
    )
    SELECT event_type, day, max(v_cents) AS v_cents,
           CAST(sum(bv * w) // sum(w) AS BIGINT) AS ewma_cents
    FROM j GROUP BY event_type, day
    """,
    f"EWMA smoothing of daily event value: integer weights round(1e6*0.8^j) as literals over a {_EWMA_LAGS}-lag bounded self-join of the calendar-sized daily table — exact cent arithmetic, no in-engine float pow (time-series family)",
)
def q153(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed daily revenue signal: exponentially weighted moving average
    with ratio sum(w_j * x_{i-j}) / sum(w_j) over the available lags — the
    truncated-window form self-normalizes at series starts (no warm-up
    bias). Weights are precomputed integer literals, values exact cents:
    both engines floor-div to the same answer. The self-join expands the
    tiny daily table <=30x, never the raw stream."""
    e = _t(spark, sf_dir, "events")
    v = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.sum(F.round(F.col("value") * 100, 0).cast("long")).cast("long").alias("v_cents"))
    a = v.alias("a")
    b = v.alias("b")
    wlit = F.array(*[F.lit(w).cast("long") for w in _EWMA_W])
    j = (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("b.day") <= F.col("a.day"))
            & (F.col("b.day") > F.date_sub(F.col("a.day"), _EWMA_LAGS)),
        )
        .select(
            F.col("a.event_type").alias("event_type"),
            F.col("a.day").alias("day"),
            F.col("a.v_cents").alias("v_cents"),
            F.col("b.v_cents").alias("bv"),
            F.element_at(wlit, F.datediff(F.col("a.day"), F.col("b.day")) + 1).alias("w"),
        )
    )
    return j.groupBy("event_type", "day").agg(
        F.max("v_cents").alias("v_cents"),
        F.expr("sum(bv * w) div sum(w)").cast("long").alias("ewma_cents"),
    )


# --------------------------------------------------------------------------
# q154 — association rules on the co-purchase pairs (itemset family).
# Operators: operators/itemsets.py::association_rules over the SHARED
# support>=2 edge artifact (`_copurchase_edges` — built once per dataset,
# fourth consumer after q116/q148/q149). Confidence and lift in exact
# integer micro-units (floor div, the q115 device) — hash-gradable, no
# float ratio crosses an engine boundary.
# Scale: pairs are pre-thresholded at the artifact (99% of raw pairs are
# support-1 noise and never materialize); item counts are one map-side-
# combinable agg; the rule join broadcasts the dimension-sized count
# tables; the basket total rides a 1-row broadcast.
# --------------------------------------------------------------------------
@register(
    "q154_association_rules",
    """
    WITH op AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ), pairs AS (
      SELECT a.p AS x, b.p AS y, count(*) AS s
      FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
      GROUP BY a.p, b.p HAVING count(*) >= 2
    ), items AS (
      SELECT p, count(*) AS n FROM op GROUP BY p
    ), tot AS (
      SELECT count(DISTINCT o) AS nb FROM op
    ), dirs AS (
      SELECT x AS ante, y AS cons, s FROM pairs
      UNION ALL SELECT y, x, s FROM pairs
    )
    SELECT ante, cons, CAST(s AS BIGINT) AS support,
           CAST((1000000 * s) // ia.n AS BIGINT) AS conf_micro,
           CAST((1000000 * s * tot.nb) // (ia.n * ic.n) AS BIGINT) AS lift_micro
    FROM dirs
    JOIN items ia ON dirs.ante = ia.p
    JOIN items ic ON dirs.cons = ic.p
    CROSS JOIN tot
    """,
    "market-basket association rules (support/confidence/lift in integer micro-units) from the shared support>=2 co-purchase artifact — fourth consumer of the once-mined pair table (itemset family)",
)
def q154(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed buy-A-then-B rules with the classic support / confidence /
    lift trio: confidence ranks actionability, lift separates real
    affinity from two-popular-items coincidence. Pair supports come from
    the shared `_copurchase_edges` artifact; only the per-item basket
    counts rescan (one distinct agg). operators/itemsets.py."""
    from universal_aws_data_pipeline_spark.operators.itemsets import association_rules

    pairs = _copurchase_edges(spark, sf_dir)
    baskets = (
        _t(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    return association_rules(pairs, baskets, basket_col="o", item_col="p")


# --------------------------------------------------------------------------
# q155 — day-of-week seasonal decomposition (seasonality family).
# Operators: operators/seasonal.py::dow_seasonal_index — classical weekly
# seasonal index restricted to the mean estimator so the whole computation
# is exact int64 (cents sums, floor-div means, micro-unit index).
# Scale: one rollup to |days| rows, a 7-row agg, 1-row broadcast; the
# index numerator is 1e6 * PER-DAY mean, bounded whatever the history.
# --------------------------------------------------------------------------
@register(
    "q155_dow_seasonality",
    """
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS cents
      FROM orders GROUP BY 1
    ), dow AS (
      SELECT CAST(isodow(d) AS BIGINT) AS weekday, SUM(cents) AS sw, COUNT(*) AS nw
      FROM daily GROUP BY 1
    ), tot AS (SELECT SUM(cents) AS st, COUNT(*) AS nt FROM daily)
    SELECT weekday, CAST(nw AS BIGINT) AS n_days,
           CAST(sw // nw AS BIGINT) AS mean_cents,
           CAST((1000000 * (sw // nw)) // (st // nt) AS BIGINT) AS seasonal_micro
    FROM dow CROSS JOIN tot
    """,
    "weekly seasonal index of order revenue: per-weekday mean daily cents and its micro-unit ratio to the global daily mean — exact integer classical decomposition (seasonality family)",
)
def q155(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Is Monday really down, or is that the weekly shape? Mean daily
    revenue per ISO weekday and its ratio to the global daily mean, all in
    exact integers. operators/seasonal.py::dow_seasonal_index."""
    from universal_aws_data_pipeline_spark.operators.seasonal import dow_seasonal_index

    o = _t(spark, sf_dir, "orders")
    return dow_seasonal_index(
        o, "o_orderdate", F.round(F.col("o_totalprice") * 100, 0).cast("long")
    )


# --------------------------------------------------------------------------
# q156 — per-source unigram KL divergence vs the corpus (X4/mixture).
# Operators: operators/text.py::source_kl_divergence — one token explode,
# ONE (source, token) aggregate; source totals and global counts derive
# from that vocab-sized table; global total on a 1-row broadcast. The
# corpus is tokenized exactly once. round(4) after the aggregation (the
# q103 float discipline: sums of logs are stable far past 4dp).
# --------------------------------------------------------------------------
@register(
    "q156_source_kl_divergence",
    f"""
    WITH toks AS (
      SELECT source, unnest(string_split({_NORM_SQL}, ' ')) AS tok FROM documents
    ), sc AS (
      SELECT source, tok, count(*) AS c FROM toks GROUP BY source, tok
    ), stot AS (
      SELECT source, sum(c) AS n FROM sc GROUP BY source
    ), g AS (
      SELECT tok, sum(c) AS cg FROM sc GROUP BY tok
    ), gt AS (SELECT sum(cg) AS ng FROM g)
    SELECT sc.source,
           CAST(max(stot.n) AS BIGINT) AS n_tokens,
           round(sum((CAST(c AS DOUBLE) / n) * ln((CAST(c AS DOUBLE) / n) / (CAST(cg AS DOUBLE) / ng))), 4) AS kl_nats
    FROM sc
    JOIN stot ON sc.source = stot.source
    JOIN g ON sc.tok = g.tok
    CROSS JOIN gt
    GROUP BY sc.source
    """,
    "lexical idiosyncrasy per source: KL divergence of each source's unigram distribution from the whole corpus — the mixture diagnostic feeding domain-weight decisions; one tokenize pass (X4)",
)
def q156(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A source that is just more-of-the-corpus scores ~0 nats; a domain-
    specific one scores high and deserves its own q129 mixture weight.
    operators/text.py::source_kl_divergence."""
    from universal_aws_data_pipeline_spark.operators.text import source_kl_divergence

    d = _t(spark, sf_dir, "documents")
    return source_kl_divergence(d, group_col="source", text_col="text")


# --------------------------------------------------------------------------
# q157 — embedding dimension health stats (X3 hygiene).
# Operators: operators/similarity.py::embedding_dim_stats — posexplode ->
# ONE map-side-combinable aggregate to |dims| rows; 1e-6 integer
# quantization makes the sums exact, so the derived mean/var doubles are
# deterministic functions of integers (hash-gradable at round 6).
# --------------------------------------------------------------------------
@register(
    "q157_embedding_dim_stats",
    """
    WITH x AS (
      SELECT j + 1 AS dim,
             CAST(round(CAST(embedding[j + 1] AS DOUBLE) * 1000000) AS BIGINT) AS xq
      FROM embeddings CROSS JOIN (SELECT unnest(range(0, 64)) AS j)
    )
    SELECT dim, CAST(count(*) AS BIGINT) AS n,
           round(CAST(sum(xq) AS DOUBLE) / count(*) / 1e6, 6) AS mean,
           round((CAST(sum(xq * xq) AS DOUBLE) / count(*)
                  - (CAST(sum(xq) AS DOUBLE) / count(*)) * (CAST(sum(xq) AS DOUBLE) / count(*))) / 1e12, 6) AS var,
           CAST(min(xq) AS BIGINT) AS min_q,
           CAST(max(xq) AS BIGINT) AS max_q
    FROM x GROUP BY dim
    """,
    "per-dimension embedding health (mean/var/min/max on the 1e-6 grid): the dead-dimension / wild-variance / unnormalized-checkpoint audit run before any ANN index build (X3)",
)
def q157(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector hygiene before indexing: a dead dim wastes index bits, a
    wild-variance one dominates L2, a nonzero mean betrays an unnormalized
    encoder. operators/similarity.py::embedding_dim_stats."""
    from universal_aws_data_pipeline_spark.operators.similarity import embedding_dim_stats

    e = _t(spark, sf_dir, "embeddings")
    return embedding_dim_stats(e)


# --------------------------------------------------------------------------
# q158 — within-document token entropy (X4 quality).
# Operators: operators/text.py::token_entropy — entirely ROW-LOCAL
# higher-order-function arithmetic (distinct -> per-token count via
# filter() -> -sum p ln p): no explode, no shuffle, a map stage at any
# corpus size. round(4) on a per-row sum of <=|distinct| log terms.
# --------------------------------------------------------------------------
@register(
    "q158_token_entropy",
    f"""
    WITH t AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks FROM documents
    )
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
           round(-list_sum(list_transform(list_distinct(toks),
                 t -> (CAST(len(list_filter(toks, x -> x = t)) AS DOUBLE) / len(toks))
                      * ln(CAST(len(list_filter(toks, x -> x = t)) AS DOUBLE) / len(toks)))), 4) AS entropy_nats
    FROM t
    """,
    "within-doc Shannon entropy of the unigram distribution: the compressibility quality signal (template spam repeats a tiny vocabulary at any length) — row-local, zero shuffle (X4)",
)
def q158(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HOW evenly tokens appear (entropy), complementing Gopher's WHICH
    tokens appear. operators/text.py::token_entropy."""
    from universal_aws_data_pipeline_spark.operators.text import token_entropy

    d = _t(spark, sf_dir, "documents")
    return token_entropy(d)


# --------------------------------------------------------------------------
# q159 — equi-width histogram quantile sketch (sketch family).
# Operators: operators/sketch.py::value_histogram + histogram_quantiles —
# the engine-PORTABLE quantile sketch: the bin table is a pure function of
# the data (unlike t-digest/KLL whose estimates depend on buffer layout and
# merge order), build is one map-side-combinable agg to <=120 rows, merge
# is count addition, estimates are exact integer arithmetic both engines
# replay bit-identically. Estimate error bound: one bin width ($1000).
# tests/test_round6_ops.py asserts the estimates track exact percentiles.
# --------------------------------------------------------------------------
_HQ_LO, _HQ_W, _HQ_NB = 0, 100_000, 120  # cents domain [0, $120k), $1k bins
_HQ_PS = [500, 900, 990]


@register(
    "q159_histogram_quantiles",
    f"""
    WITH h AS (
      SELECT LEAST(GREATEST(CAST(floor((CAST(round(l_extendedprice * 100, 0) AS BIGINT) - {_HQ_LO}) / {_HQ_W}.0) AS BIGINT), 0), {_HQ_NB - 1}) AS bin,
             count(*) AS c
      FROM lineitem GROUP BY 1
    ), cum AS (
      SELECT bin, c, sum(c) OVER (ORDER BY bin) AS cum FROM h
    ), n AS (SELECT sum(c) AS n FROM h),
    p AS (SELECT unnest([{", ".join(str(p) for p in _HQ_PS)}]) AS p_mille),
    r AS (SELECT CAST(p_mille AS BIGINT) AS p_mille, 1 + (p_mille * (n.n - 1)) // 1000 AS r FROM p CROSS JOIN n),
    hit AS (
      SELECT r.p_mille, min(cum.bin) AS bin FROM r JOIN cum ON cum.cum >= r.r GROUP BY r.p_mille
    )
    SELECT hit.p_mille,
           CAST({_HQ_LO} + hit.bin * {_HQ_W} + ({_HQ_W} * (r.r - (cum.cum - cum.c))) // cum.c AS BIGINT) AS est_cents
    FROM hit JOIN r ON hit.p_mille = r.p_mille JOIN cum ON cum.bin = hit.bin
    """,
    "p50/p90/p99 of extended price via a 120-bin equi-width histogram sketch: mergeable (count addition), engine-portable (exact integer interpolation), error bounded by one bin width (sketch family)",
)
def q159(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The quantile sketch you can hash-grade: the q48-exact-percentile
    swap-in whose state merges across partitions/days by addition.
    operators/sketch.py::value_histogram/histogram_quantiles."""
    from universal_aws_data_pipeline_spark.operators.sketch import (
        histogram_quantiles,
        value_histogram,
    )

    li = _t(spark, sf_dir, "lineitem")
    hist = value_histogram(
        li,
        F.round(F.col("l_extendedprice") * 100, 0).cast("long"),
        _HQ_LO,
        _HQ_W,
        _HQ_NB,
    )
    return histogram_quantiles(hist, _HQ_PS, _HQ_LO, _HQ_W)


# --------------------------------------------------------------------------
# q160 — common-neighbor link prediction on the co-purchase graph (graph
# family). Operators: operators/graph.py::link_prediction — resource-
# allocation-weighted shared-neighbor scores for NON-adjacent pairs, in
# integer micro-units. Fifth consumer of the shared edge artifact.
# Scale: wedge count has no orientation escape here (both endpoints are
# the output), so the documented max_center_degree cap bounds wedges at
# |V|*cap^2 pre-join, discarding only the weakest-evidence centers
# (RA weight <= 1e6/cap); the cap is part of the contract and the oracle
# replays it verbatim.
# --------------------------------------------------------------------------
_LP_MIN_COMMON, _LP_MAX_DEG = 2, 64


@register(
    "q160_link_prediction",
    f"""
    WITH op AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ), eu AS (
      SELECT a.p AS x, b.p AS y
      FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
      GROUP BY a.p, b.p HAVING count(*) >= 2
    ), adj AS (
      SELECT x AS c, y AS n FROM eu UNION ALL SELECT y, x FROM eu
    ), deg AS (
      SELECT c, count(*) AS deg FROM adj GROUP BY c
    ), ctr AS (
      SELECT adj.c, adj.n, deg.deg FROM adj JOIN deg ON adj.c = deg.c
      WHERE deg.deg <= {_LP_MAX_DEG}
    ), wedges AS (
      SELECT w1.n AS x, w2.n AS y, w1.deg
      FROM ctr w1 JOIN ctr w2 ON w1.c = w2.c AND w1.n < w2.n
    ), scored AS (
      SELECT x, y, count(*) AS common, sum(1000000 // deg) AS ra_micro
      FROM wedges GROUP BY x, y HAVING count(*) >= {_LP_MIN_COMMON}
    )
    SELECT s.x, s.y, CAST(s.common AS BIGINT) AS common, CAST(s.ra_micro AS BIGINT) AS ra_micro
    FROM scored s
    LEFT JOIN eu ON s.x = eu.x AND s.y = eu.y
    WHERE eu.x IS NULL
    """,
    f"resource-allocation link prediction: shared-neighbor evidence (count + sum floor(1e6/deg(center))) for parts NOT yet co-purchased, center degree capped at {_LP_MAX_DEG} by contract (graph family)",
)
def q160(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which parts SHOULD co-occur but don't yet — the recommendation /
    missing-link readout of the co-purchase graph, scored by common
    neighbors with the RA degree discount in exact integers.
    operators/graph.py::link_prediction (shared edge artifact)."""
    from universal_aws_data_pipeline_spark.operators.graph import link_prediction

    e = _copurchase_edges(spark, sf_dir).select("a", "b")
    return link_prediction(
        e, min_common=_LP_MIN_COMMON, max_center_degree=_LP_MAX_DEG
    )


# --------------------------------------------------------------------------
# q161 — mutual nearest neighbors (X3 alignment). Operators:
# operators/similarity.py::mutual_nearest_neighbors — the bitext-mining /
# entity-alignment primitive: pairs form only when each side is the
# OTHER's top-1, killing asymmetric hub matches. 6dp-rounded cosine
# BEFORE the argmax + smallest-partner tiebreak = engine-portable winner.
# Scale: blocked self-join (|block|^2, never corpus^2) -> map-side-
# combinable max_by per vector -> one |V|-row mutuality self-join; blocks
# come from a coarse quantizer (q150) at real scale.
# --------------------------------------------------------------------------
@register(
    "q161_mutual_nn",
    """
    WITH n AS (
      SELECT vec_id, label, embedding,
             sqrt(list_sum(list_transform(embedding,
                  y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)))) AS nrm
      FROM embeddings
    ), u AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE) / nrm) AS uv
      FROM n
    ), p0 AS (
      SELECT a.vec_id AS src, b.vec_id AS dst,
             round(list_sum(list_transform(range(1, 65),
                   i -> a.uv[i] * b.uv[i])), 6) AS cos
      FROM u a JOIN u b ON a.label = b.label AND a.vec_id < b.vec_id
    ), p AS (
      SELECT src, dst, cos FROM p0 UNION ALL SELECT dst, src, cos FROM p0
    ), best AS (
      SELECT src, dst, cos FROM (
        SELECT src, dst, cos,
               row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst ASC) AS rn
        FROM p
      ) WHERE rn = 1
    )
    SELECT b1.src AS x, b1.dst AS y, b1.cos AS cos_sim
    FROM best b1 JOIN best b2 ON b1.src = b2.dst AND b1.dst = b2.src
    WHERE b1.src < b1.dst
    """,
    "mutual top-1 nearest-neighbor pairs within label blocks (the bitext-mining/alignment primitive): 6dp cosine argmax each direction, pair kept only when reciprocal (X3)",
)
def q161(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-best matches: the pairing that survives when one-way
    top-1 noise is removed. operators/similarity.py::mutual_nearest_neighbors."""
    from universal_aws_data_pipeline_spark.operators.similarity import (
        mutual_nearest_neighbors,
    )

    e = _t(spark, sf_dir, "embeddings")
    return mutual_nearest_neighbors(e)


# --------------------------------------------------------------------------
# q162 — largest-remainder quota allocation (X6 sampling). Operators:
# operators/sampling.py::quota_allocation — Hamilton apportionment: exact-
# integer per-source quotas that SUM EXACTLY to the budget (independently
# rounded float shares don't). One count agg to |sources| rows; the
# floors/remainders/rank run on that tiny table.
# --------------------------------------------------------------------------
_Q162_BUDGET = 1000


@register(
    "q162_quota_allocation",
    f"""
    WITH c AS (
      SELECT source, count(*) AS n_rows FROM documents GROUP BY source
    ), t AS (SELECT sum(n_rows) AS nn FROM c),
    b AS (
      SELECT source, n_rows,
             ({_Q162_BUDGET} * n_rows) // nn AS fl,
             ({_Q162_BUDGET} * n_rows) % nn AS rem
      FROM c CROSS JOIN t
    ), l AS (SELECT {_Q162_BUDGET} - sum(fl) AS lv FROM b),
    r AS (
      SELECT *, row_number() OVER (ORDER BY rem DESC, source) AS rk FROM b
    )
    SELECT source, CAST(n_rows AS BIGINT) AS n_rows,
           CAST(fl + CASE WHEN rk <= l.lv THEN 1 ELSE 0 END AS BIGINT) AS quota
    FROM r CROSS JOIN l
    """,
    f"Hamilton largest-remainder apportionment of a {_Q162_BUDGET}-doc eval budget across sources: exact-integer quotas summing exactly to the budget, remainder ties by name (X6)",
)
def q162(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Give me exactly N docs, proportional to source sizes — with integer
    quotas that actually sum to N. operators/sampling.py::quota_allocation."""
    from universal_aws_data_pipeline_spark.operators.sampling import quota_allocation

    d = _t(spark, sf_dir, "documents")
    return quota_allocation(d, _Q162_BUDGET, group_col="source")


# --------------------------------------------------------------------------
# q163 — corpus datacard (X4/X6 reporting composition): the one-table
# per-source summary a dataset release ships — volume, token mass, language
# share, exact-dup rate, mean quality. Composes the q105 quality battery,
# q07's dup semantics, and q156's token accounting into ONE grouped pass
# over the corpus (integer micro-unit shares; avg of 4dp quality).
# --------------------------------------------------------------------------
@register(
    "q163_corpus_datacard",
    f"""
    WITH scored AS (
      SELECT source, lang, text,
        round((least(1.0, ntok / 100.0) + alpha_ratio
               + (1.0 - least(1.0, digit_ratio + punct_ratio))
               + CASE WHEN mean_tok_len >= 3.0 AND mean_tok_len <= 10.0 THEN 1.0 ELSE 0.5 END) / 4.0,
              4) AS quality,
        ntok_norm
      FROM (
        SELECT source, lang, text, n, ntok,
          len(string_split({_NORM_SQL}, ' ')) AS ntok_norm,
          (n - length(regexp_replace(text, '[A-Za-z]', '', 'g'))) / n AS alpha_ratio,
          (n - length(regexp_replace(text, '[0-9]', '', 'g'))) / n AS digit_ratio,
          (n - length(regexp_replace(text, '[\\.,;:!\\?]', '', 'g'))) / n AS punct_ratio,
          CAST(length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE) / ntok AS mean_tok_len
        FROM (
          SELECT source, lang, text,
                 CAST(length(text) AS DOUBLE) AS n,
                 len(string_split_regex(trim(text), '\\s+')) AS ntok
          FROM documents
        )
      )
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(ntok_norm) AS BIGINT) AS n_tokens,
           CAST((1000000 * sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)) // count(*) AS BIGINT) AS en_share_micro,
           CAST((1000000 * (count(*) - count(DISTINCT md5(text)))) // count(*) AS BIGINT) AS dup_micro,
           round(avg(quality), 4) AS avg_quality
    FROM scored GROUP BY source
    """,
    "corpus datacard: per-source volume, normalized-token mass, English share and exact-dup rate in integer micro-units, mean quality score — the dataset-release summary table in one grouped pass (X4/X6)",
)
def q163(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The table a dataset release ships. Quality via the q105 battery
    (operators/text.py::quality_score); dup rate = 1 - distinct(md5)/n so
    the distinct exchange is digest-sized; shares in integer micro-units."""
    from universal_aws_data_pipeline_spark.functions.texthash import tokens_col
    from universal_aws_data_pipeline_spark.operators.text import quality_score

    d = _t(spark, sf_dir, "documents")
    return (
        d.select(
            "source",
            "lang",
            "text",
            F.size(tokens_col(F.col("text"))).cast("long").alias("ntok_norm"),
            quality_score(F.col("text")).alias("quality"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("ntok_norm").alias("n_tokens"),
            F.expr(
                "(1000000 * sum(case when lang = 'en' then 1 else 0 end)) div count(*)"
            ).alias("en_share_micro"),
            # digest, not raw text: the distinct-agg exchange ships 16-byte
            # md5s instead of documents (collision odds 2^-128 — the q07/q130
            # digest convention)
            F.expr("(1000000 * (count(*) - count(distinct md5(text)))) div count(*)").alias(
                "dup_micro"
            ),
            F.round(F.avg("quality"), 4).alias("avg_quality"),
        )
    )


# --------------------------------------------------------------------------
# q164 — semantic decontamination (X2/X3): the embedding-space complement
# of q125's lexical shingle report — a PARAPHRASED benchmark item shares no
# 8-grams but sits at cosine ~0.99. Operators:
# operators/similarity.py::semantic_decontaminate. Eval fixture: every 41st
# vector, deterministically perturbed per-dimension (the q130/q132
# synthetic-fixture convention) so scores are nontrivial (<1.0) yet both
# engines compute the identical floats. Scale: blocked cross-table join,
# eval side benchmark-sized (broadcasts under AQE).
# --------------------------------------------------------------------------
_Q164_THRESH = 0.98


@register(
    "q164_semantic_decontamination",
    f"""
    WITH ev AS (
      SELECT vec_id + 1000000 AS eval_id, label,
             list_transform(range(1, 65),
               j -> CAST(embedding[j] AS DOUBLE)
                    + 0.001 * ((((j - 1) * 7 + vec_id) % 5) - 2)) AS ve
      FROM embeddings WHERE vec_id % 41 = 0
    )
    SELECT ev.eval_id, t.vec_id AS train_id,
           round({_cos_sql("t.embedding", "ev.ve")}, 6) AS cos_sim
    FROM embeddings t JOIN ev ON t.label = ev.label
    WHERE round({_cos_sql("t.embedding", "ev.ve")}, 6) >= {_Q164_THRESH}
    """,
    "semantic decontamination: training vectors within cosine 0.98 of any (perturbed) eval vector, blocked cross-table join — catches the paraphrased contamination q125's lexical digests cannot (X2/X3)",
)
def q164(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval = every 41st vector with a deterministic per-dimension nudge
    (integer-derived, exactly replayable IEEE arithmetic); report = all
    train vectors at cosine >= 0.98. operators/similarity.py::
    semantic_decontaminate."""
    from universal_aws_data_pipeline_spark.operators.similarity import (
        semantic_decontaminate,
    )

    e = _t(spark, sf_dir, "embeddings")
    ev = e.filter(F.col("vec_id") % 41 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        "label",
        F.transform(
            "embedding",
            lambda x, i: x.cast("double")
            + 0.001 * (((i * 7 + F.col("vec_id")) % 5) - 2).cast("double"),
        ).alias("embedding"),
    )
    return semantic_decontaminate(e, ev, threshold=_Q164_THRESH)


# --------------------------------------------------------------------------
# q165 — top journey trigrams (event family): the path-mining readout of
# the event stream — which 3-step sequences dominate user journeys (the
# funnel-design input q55's FIXED funnel assumes). One per-user window
# pass (lag x2 over the (ts, event_id) total order — the q146 convention;
# fixture timestamps are microsecond-granular, so the order is engine-
# consistent) + one map-side-combinable path count.
# --------------------------------------------------------------------------
@register(
    "q165_journey_trigrams",
    """
    WITH o AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type, 2) OVER w AS t2,
             lag(event_type, 1) OVER w AS t1
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT t2 || '>' || t1 || '>' || event_type AS path,
           CAST(count(*) AS BIGINT) AS n
    FROM o WHERE t2 IS NOT NULL
    GROUP BY 1
    """,
    "journey path mining: counts of every 3-step event sequence over per-user (ts, event_id)-ordered streams — the data-driven funnel-design input (event family)",
)
def q165(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which 3-step paths actually happen (vs the fixed funnel q55
    assumes): two lags over the per-user total order, one path count."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = ev.select(
        "event_type",
        F.lag("event_type", 2).over(w).alias("t2"),
        F.lag("event_type", 1).over(w).alias("t1"),
    )
    return (
        o.filter(F.col("t2").isNotNull())
        .select(F.concat_ws(">", "t2", "t1", "event_type").alias("path"))
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --------------------------------------------------------------------------
# q166 — Pareto cumulative revenue share (analytics family). The 80/20
# readout over suppliers WITHOUT the global single-task window: revenue
# ranks through operators/sampling.py::stratified_prefix_sum (constant
# stratum) — range-partition on the desc sort key, parallel per-partition
# running sums, |partitions|-row offsets collect — the same two-phase
# device q131's packing uses, here on an ungrouped global order. Exact
# integer cents; shares in permille (1e3 factor keeps 10x-scaled totals
# inside int64 where 1e6 would overflow).
# --------------------------------------------------------------------------
@register(
    "q166_pareto_share",
    """
    WITH rev AS (
      SELECT l_suppkey AS s,
             SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT)) AS cents
      FROM lineitem GROUP BY 1
    ), c AS (
      SELECT s, cents,
             sum(cents) OVER (ORDER BY cents DESC, s) AS cum_cents,
             sum(cents) OVER () AS total
      FROM rev
    )
    SELECT s AS suppkey, cents, CAST(cum_cents AS BIGINT) AS cum_cents,
           CAST((1000 * cum_cents) // total AS BIGINT) AS cum_share_permille
    FROM c
    """,
    "Pareto/80-20 audit: per-supplier net revenue with cumulative share in exact permille over the revenue-desc order — computed via the two-phase distributed prefix sum, never a single-task global window (analytics family)",
)
def q166(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How concentrated is supplier revenue: cumulative permille share in
    revenue-desc order. The oracle's global window is the SEMANTIC spec;
    the plan runs sampling.py::stratified_prefix_sum so no task ever holds
    the whole table."""
    from universal_aws_data_pipeline_spark.operators.sampling import (
        stratified_prefix_sum,
    )

    li = _t(spark, sf_dir, "lineitem")
    rev = (
        li.select(
            F.col("l_suppkey").alias("s"),
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0)
            .cast("long")
            .alias("cents"),
        )
        .groupBy("s")
        .agg(F.sum("cents").alias("cents"))
        .withColumn("_one", F.lit(1))
    )
    ranked = stratified_prefix_sum(
        rev,
        "_one",
        [F.col("cents").desc(), F.col("s").asc()],
        "cents",
        out_col="cum_before",
    )
    total = rev.agg(F.sum("cents").alias("total"))
    return (
        ranked.join(F.broadcast(total))
        .select(
            F.col("s").alias("suppkey"),
            "cents",
            (F.col("cum_before") + F.col("cents")).cast("long").alias("cum_cents"),
            F.expr("(1000 * (cum_before + cents)) div total").alias("cum_share_permille"),
        )
    )


# --------------------------------------------------------------------------
# q167 — Efraimidis-Spirakis weighted sample (X6 sampling). Operators:
# operators/sampling.py::weighted_sample_topk — weighted-without-
# replacement selection that is DETERMINISTIC across engines, reruns, and
# partition layouts (md5-uniform, not an RNG; the module's hash-mod
# contract extended to weighted draws). ln spelling avoids cross-libm pow;
# 6dp key rounding + id tiebreak makes the k-boundary engine-portable.
# Scale: one map expression + TakeOrderedAndProject.
# --------------------------------------------------------------------------
_Q167_K = 100


@register(
    "q167_weighted_sample",
    f"""
    SELECT doc_id, n_chars,
           round(ln(({_hex_int_sql("CAST(doc_id AS VARCHAR)", 4)} + 0.5) / 65536.0)
                 / n_chars, 6) AS es_key
    FROM documents
    WHERE n_chars > 0
    ORDER BY es_key DESC, doc_id
    LIMIT {_Q167_K}
    """,
    f"weighted sampling without replacement (Efraimidis-Spirakis top-{_Q167_K} by ln(u)/w): deterministic md5-uniform draws, selection probability proportional to document length (X6)",
)
def q167(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-weighted document sample that every engine reproduces
    byte-for-byte. operators/sampling.py::weighted_sample_topk."""
    from universal_aws_data_pipeline_spark.operators.sampling import weighted_sample_topk

    d = _t(spark, sf_dir, "documents")
    return weighted_sample_topk(d, "n_chars", _Q167_K)


# --------------------------------------------------------------------------
# q168 — Kaplan-Meier retention (event family). Operators:
# operators/survival.py::km_survival — censoring-correct retention: users
# last seen within 7 days of stream end are CENSORED (leave the at-risk
# set without a death), which a naive retention curve counts as churn,
# biasing it down. Integer at-risk/death counts; the survival product is
# an ordered fold of exact-integer-ratio factors — identical fold in both
# engines (DuckDB list_reduce's first-element seed is identity-compatible
# under multiplication), round(6) output.
# Scale: one grouped pass to per-user spans; everything downstream runs on
# the |distinct lifetimes|-row table (bounded by the observation span).
# --------------------------------------------------------------------------
@register(
    "q168_km_retention",
    """
    WITH spans AS (
      SELECT user_id,
             min(CAST(floor(epoch(ts) / 86400) AS BIGINT)) AS first_d,
             max(CAST(floor(epoch(ts) / 86400) AS BIGINT)) AS last_d
      FROM events GROUP BY user_id
    ), e AS (SELECT max(last_d) AS max_d FROM spans),
    ev AS (
      SELECT last_d - first_d AS t,
             CASE WHEN last_d <= e.max_d - 7 THEN 1 ELSE 0 END AS is_death
      FROM spans CROSS JOIN e
    ), g AS (
      SELECT t, sum(is_death) AS d, sum(1 - is_death) AS c FROM ev GROUP BY t
    ), r AS (
      SELECT t, d,
             sum(d + c) OVER (ORDER BY t DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_risk
      FROM g
    ), dd AS (SELECT * FROM r WHERE d > 0),
    f AS (
      SELECT t, d, n_risk,
             list(CAST(n_risk - d AS DOUBLE) / n_risk)
               OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fs
      FROM dd
    )
    SELECT t AS t_days, CAST(n_risk AS BIGINT) AS n_risk,
           CAST(d AS BIGINT) AS n_deaths,
           round(list_reduce(fs, (a, b) -> a * b), 6) AS survival
    FROM f
    """,
    "Kaplan-Meier user retention over event-stream lifetimes with 7-day-tail censoring: at-risk/death counts per lifetime day and the KM survival product — the churn curve a naive retention query biases downward (event family)",
)
def q168(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What fraction of users are still active after t days, censoring-
    correct. operators/survival.py::km_survival."""
    from universal_aws_data_pipeline_spark.operators.survival import km_survival

    ev = _t(spark, sf_dir, "events")
    return km_survival(ev, censor_tail_days=7)


# --------------------------------------------------------------------------
# q169 — chi-square independence audit (stats family): are order priority
# and order year independent? Observed vs expected cell counts + per-cell
# chi-square contributions — the contingency diagnostic behind "did the
# priority mix shift across years". One scan to the |priorities x years|
# cell table; expecteds from row/col margins (window sums over the tiny
# cell table); every float derives from exact integer counts.
# --------------------------------------------------------------------------
@register(
    "q169_chi_square_mix",
    """
    WITH cells AS (
      SELECT o_orderpriority AS priority, CAST(year(o_orderdate) AS BIGINT) AS yr,
             count(*) AS o
      FROM orders GROUP BY 1, 2
    ), m AS (
      SELECT priority, yr, o,
             sum(o) OVER (PARTITION BY priority) AS row_tot,
             sum(o) OVER (PARTITION BY yr) AS col_tot,
             sum(o) OVER () AS n
      FROM cells
    )
    SELECT priority, yr, CAST(o AS BIGINT) AS n_obs,
           round(CAST(row_tot AS DOUBLE) * col_tot / n, 4) AS expected,
           round((o - CAST(row_tot AS DOUBLE) * col_tot / n)
                 * (o - CAST(row_tot AS DOUBLE) * col_tot / n)
                 / (CAST(row_tot AS DOUBLE) * col_tot / n), 4) AS chi2_part
    FROM m
    """,
    "chi-square independence audit of priority x order-year: observed vs expected cell counts and per-cell contributions from row/col margins — the contingency-shift diagnostic (stats family)",
)
def q169(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Did the priority mix shift across years — per-cell chi-square
    contributions over the |priorities x years| contingency table."""
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    cells = o.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.year("o_orderdate").cast("long").alias("yr"),
    ).agg(F.count(F.lit(1)).alias("o"))
    m = cells.select(
        "priority",
        "yr",
        "o",
        F.sum("o").over(Window.partitionBy("priority")).alias("row_tot"),
        F.sum("o").over(Window.partitionBy("yr")).alias("col_tot"),
        F.sum("o").over(Window.partitionBy()).alias("n"),
    )
    e = F.col("row_tot").cast("double") * F.col("col_tot") / F.col("n")
    return m.select(
        "priority",
        "yr",
        F.col("o").cast("long").alias("n_obs"),
        F.round(e, 4).alias("expected"),
        F.round((F.col("o") - e) * (F.col("o") - e) / e, 4).alias("chi2_part"),
    )


# --------------------------------------------------------------------------
# q170 — weekly PSI drift trend (X18 monitoring): q95's drift index turned
# into a TREND — each week's event-value distribution vs the week-0
# baseline, over a full (week x bin) grid so bins empty in one period
# still contribute their smoothed mass. One scan to the |weeks x bins|
# cell table; Laplace 0.5 smoothing (the q95 convention).
# --------------------------------------------------------------------------
_Q170_BINS, _Q170_WIDTH = 10, 50.0


@register(
    "q170_weekly_psi_trend",
    f"""
    WITH binned AS (
      SELECT CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) // 7 AS BIGINT) AS week,
             least({_Q170_BINS - 1}, greatest(0, CAST(floor(value / {_Q170_WIDTH}) AS BIGINT))) AS bin
      FROM events
    ), counts AS (
      SELECT week, bin, count(*) AS c FROM binned GROUP BY week, bin
    ), grid AS (
      SELECT w.week, b.bin, coalesce(c.c, 0) AS c
      FROM (SELECT DISTINCT week FROM counts) w
      CROSS JOIN (SELECT unnest(range(0, {_Q170_BINS})) AS bin) b
      LEFT JOIN counts c ON c.week = w.week AND c.bin = b.bin
    ), tot AS (
      SELECT week, sum(c) AS n FROM grid GROUP BY week
    ), p AS (
      SELECT g.week, g.bin,
             (g.c + 0.5) / (t.n + {0.5 * _Q170_BINS}) AS pr
      FROM grid g JOIN tot t ON g.week = t.week
    ), base AS (
      SELECT bin, pr AS p0 FROM p WHERE week = 0
    )
    SELECT p.week, CAST(max(t.n) AS BIGINT) AS n_events,
           round(sum((p.pr - base.p0) * ln(p.pr / base.p0)), 4) AS psi
    FROM p JOIN base ON p.bin = base.bin JOIN tot t ON p.week = t.week
    WHERE p.week > 0
    GROUP BY p.week
    """,
    "weekly PSI drift trend: each week's event-value histogram vs the week-0 baseline over a full week x bin grid (absent bins keep smoothed mass) — q95's monitor as a time series (X18)",
)
def q170(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Is the value distribution drifting, and since when — PSI per week
    against the first week."""
    ev = _t(spark, sf_dir, "events")
    binned = ev.select(
        F.expr("CAST(datediff(CAST(ts AS DATE), DATE '2024-01-01') div 7 AS BIGINT)").alias("week"),
        F.least(
            F.lit(_Q170_BINS - 1),
            F.greatest(F.lit(0).cast("long"), F.floor(F.col("value") / _Q170_WIDTH).cast("long")),
        ).alias("bin"),
    )
    counts = binned.groupBy("week", "bin").agg(F.count(F.lit(1)).alias("c"))
    weeks = counts.select("week").distinct()
    bins = spark.range(_Q170_BINS).select(F.col("id").alias("bin"))
    grid = (
        weeks.crossJoin(F.broadcast(bins))
        .join(counts, ["week", "bin"], "left")
        .select("week", "bin", F.coalesce("c", F.lit(0).cast("long")).alias("c"))
    )
    tot = grid.groupBy("week").agg(F.sum("c").alias("n"))
    p = grid.join(tot, "week").select(
        "week",
        "bin",
        ((F.col("c") + 0.5) / (F.col("n") + 0.5 * _Q170_BINS)).alias("pr"),
    )
    base = p.filter(F.col("week") == 0).select("bin", F.col("pr").alias("p0"))
    return (
        p.filter(F.col("week") > 0)
        .join(F.broadcast(base), "bin")
        .join(tot, "week")
        .groupBy("week")
        .agg(
            F.max("n").cast("long").alias("n_events"),
            F.round(
                F.sum((F.col("pr") - F.col("p0")) * F.log(F.col("pr") / F.col("p0"))), 4
            ).alias("psi"),
        )
    )


# --------------------------------------------------------------------------
# q171 — HITS hubs & authorities on the directed trade graph (graph
# family). Operators: operators/graph.py::hits_micro — PageRank's directed
# complement: on the bipartite customer->supplier graph the two scores
# separate the best-connected BUYERS (hubs) from the best-connected
# SUPPLIERS (authorities), which q115's symmetrized PageRank blends into
# one number. Exact-integer sums; L1 normalization via one floor-of-double
# step per half-round (the q159 device — pure-integer scaling would
# overflow int64). Oracle: the rounds unrolled as chained CTEs.
# --------------------------------------------------------------------------
_HITS_ROUNDS, _HITS_TOTAL = 3, 1_000_000_000_000


def _hits_step(i: int) -> str:
    prev_h = "h0" if i == 1 else f"h{i - 1}"
    return f"""
    ar{i} AS (
      SELECT e.dst, sum(h) AS a FROM e JOIN {prev_h} p ON e.src = p.src GROUP BY e.dst
    ), a{i} AS (
      SELECT dst, CAST(floor((CAST(a AS DOUBLE) * {_HITS_TOTAL}.0)
                             / (SELECT CAST(sum(a) AS DOUBLE) FROM ar{i})) AS BIGINT) AS a
      FROM ar{i}
    ), hr{i} AS (
      SELECT e.src, sum(a) AS h FROM e JOIN a{i} p ON e.dst = p.dst GROUP BY e.src
    ), h{i} AS (
      SELECT src, CAST(floor((CAST(h AS DOUBLE) * {_HITS_TOTAL}.0)
                             / (SELECT CAST(sum(h) AS DOUBLE) FROM hr{i})) AS BIGINT) AS h
      FROM hr{i}
    )"""


@register(
    "q171_hits_trade",
    f"""
    WITH op AS (
      SELECT DISTINCT o_custkey AS c, l_suppkey AS s
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ), e AS (
      SELECT c * 2 AS src, s * 2 + 1 AS dst FROM op
    ), h0 AS (
      SELECT src, CAST({_HITS_TOTAL} // (SELECT count(*) FROM (SELECT DISTINCT src FROM e)) AS BIGINT) AS h
      FROM (SELECT DISTINCT src FROM e)
    ),{",".join(_hits_step(i) for i in range(1, _HITS_ROUNDS + 1))}
    SELECT coalesce(h.src, a.dst) AS node,
           CAST(coalesce(h.h, 0) AS BIGINT) AS hub_micro,
           CAST(coalesce(a.a, 0) AS BIGINT) AS auth_micro
    FROM h{_HITS_ROUNDS} h FULL OUTER JOIN a{_HITS_ROUNDS} a ON h.src = a.dst
    """,
    f"{_HITS_ROUNDS}-round HITS on the directed customer->supplier trade graph: hub scores rank the best-connected buyers, authority scores the best-connected suppliers — the directed separation q115's PageRank blends (graph family)",
)
def q171(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best-connected buyers (hubs) vs best-connected suppliers
    (authorities) in one fixed-round recurrence.
    operators/graph.py::hits_micro; integer node ids per the q115
    convention."""
    from universal_aws_data_pipeline_spark.operators.graph import hits_micro

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    e = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    return hits_micro(e, iterations=_HITS_ROUNDS, total_micro=_HITS_TOTAL)


# --------------------------------------------------------------------------
# q172 — feature hashing (X38 ML prep). Operators:
# operators/features.py::hash_features — the hashing trick: categorical
# features land in md5-derived signed buckets, so NO vocabulary dictionary
# is ever built, shipped, or kept consistent across dataset versions (at
# 100 TB a vocab build is itself a corpus pass, and dictionary drift
# silently misaligns features between versions). Row-local expansion, one
# explode + one map-side-combinable (id, idx) sum; sparse output rows.
# --------------------------------------------------------------------------
_Q172_K = 16


def _q172_feat_sql(expr: str, k: int) -> str:
    # mirror hash_features' NULL contract: null features hash as '<null>'
    e = f"coalesce({expr}, '<null>')"
    b = _hex_int_sql(e, 4)
    s = f"(strpos('0123456789abcdef', substring(md5({e}),5,1))-1)"
    return f"SELECT user_id, {b} % {k} AS feat_idx, 1 - 2 * ({s} % 2) AS sgn"


@register(
    "q172_feature_hashing",
    f"""
    WITH base AS (
      SELECT user_id, event_type,
             CAST(floor(epoch(ts) / 3600) % 24 AS BIGINT) AS hr
      FROM events
    ), feats AS (
      {_q172_feat_sql("'t:' || event_type", _Q172_K)} FROM base
      UNION ALL {_q172_feat_sql("'u:' || CAST(user_id % 100 AS VARCHAR)", _Q172_K)} FROM base
      UNION ALL {_q172_feat_sql("'h:' || CAST(hr AS VARCHAR)", _Q172_K)} FROM base
    )
    SELECT user_id, CAST(feat_idx AS BIGINT) AS feat_idx,
           CAST(sum(sgn) AS BIGINT) AS val
    FROM feats GROUP BY user_id, feat_idx
    HAVING sum(sgn) <> 0
    """,
    f"hashing-trick featurization: per-user signed {_Q172_K}-bucket md5 feature vector over (event type, user cohort, hour-of-day) — no vocabulary dictionary to build or drift, sparse output (X38 ML prep)",
)
def q172(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user hashed feature vectors from the event stream — the
    dictionary-free categorical featurization training pipelines need at
    corpus scale. operators/features.py::hash_features."""
    from universal_aws_data_pipeline_spark.operators.features import hash_features

    ev = _t(spark, sf_dir, "events")
    base = ev.select(
        "user_id",
        "event_type",
        (F.floor(F.unix_timestamp("ts") / 3600) % 24).cast("long").alias("hr"),
    )
    return hash_features(
        base,
        "user_id",
        [
            F.concat(F.lit("t:"), F.col("event_type")),
            F.concat(F.lit("u:"), (F.col("user_id") % 100).cast("string")),
            F.concat(F.lit("h:"), F.col("hr").cast("string")),
        ],
        k=_Q172_K,
    )


# --------------------------------------------------------------------------
# q173 — funnel conversion with Wilson intervals (stats family): per
# event type, how many users convert to purchase — with the 95% Wilson
# score interval, the small-n-honest bound (a 2/3 conversion is NOT "67%";
# Wald intervals lie at the tails, Wilson doesn't). All inputs are exact
# integer user counts; the interval is one fixed IEEE expression replayed
# verbatim by the oracle, round(4).
# Scale: two distinct-user rollups + one |types|-row join.
# --------------------------------------------------------------------------
_Q173_Z = 1.96


@register(
    "q173_funnel_wilson",
    f"""
    WITH per AS (
      SELECT event_type, user_id FROM events GROUP BY event_type, user_id
    ), buyers AS (
      SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
    ), agg AS (
      SELECT p.event_type,
             count(*) AS n,
             sum(CASE WHEN b.user_id IS NOT NULL THEN 1 ELSE 0 END) AS k
      FROM per p LEFT JOIN buyers b ON p.user_id = b.user_id
      WHERE p.event_type <> 'purchase'
      GROUP BY p.event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_users, CAST(k AS BIGINT) AS n_converted,
           round(CAST(k AS DOUBLE) / n, 4) AS p_hat,
           round((CAST(k AS DOUBLE) / n + {_Q173_Z} * {_Q173_Z} / (2.0 * n)
                  - {_Q173_Z} * sqrt((CAST(k AS DOUBLE) / n) * (1.0 - CAST(k AS DOUBLE) / n) / n
                                     + {_Q173_Z} * {_Q173_Z} / (4.0 * n * n)))
                 / (1.0 + {_Q173_Z} * {_Q173_Z} / n), 4) AS wilson_lo,
           round((CAST(k AS DOUBLE) / n + {_Q173_Z} * {_Q173_Z} / (2.0 * n)
                  + {_Q173_Z} * sqrt((CAST(k AS DOUBLE) / n) * (1.0 - CAST(k AS DOUBLE) / n) / n
                                     + {_Q173_Z} * {_Q173_Z} / (4.0 * n * n)))
                 / (1.0 + {_Q173_Z} * {_Q173_Z} / n), 4) AS wilson_hi
    FROM agg
    """,
    "per-event-type purchase conversion with 95% Wilson score intervals: the small-n-honest uncertainty band a bare rate hides — exact integer user counts, one fixed IEEE expression (stats family)",
)
def q173(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion rates you can act on: the Wilson interval stays inside
    [0,1] and stays honest at small n, unlike Wald."""
    ev = _t(spark, sf_dir, "events")
    per = ev.groupBy("event_type", "user_id").agg(F.lit(1)).select("event_type", "user_id")
    buyers = (
        ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
        .withColumn("_b", F.lit(1))
    )
    agg = (
        per.filter(F.col("event_type") != "purchase")
        .join(F.broadcast(buyers), "user_id", "left")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("_b").isNotNull(), 1).otherwise(0)).alias("k"),
        )
    )
    z = _Q173_Z
    p = F.col("k").cast("double") / F.col("n")
    half = z * F.sqrt(p * (1.0 - p) / F.col("n") + z * z / (4.0 * F.col("n") * F.col("n")))
    center = p + z * z / (2.0 * F.col("n"))
    denom = 1.0 + z * z / F.col("n")
    return agg.select(
        "event_type",
        F.col("n").cast("long").alias("n_users"),
        F.col("k").cast("long").alias("n_converted"),
        F.round(p, 4).alias("p_hat"),
        F.round((center - half) / denom, 4).alias("wilson_lo"),
        F.round((center + half) / denom, 4).alias("wilson_hi"),
    )


# --------------------------------------------------------------------------
# q174 — Theil-Sen robust trend (stats family): the median of all pairwise
# daily-revenue slopes — the trend estimator a few promo-spike days cannot
# drag around (OLS breakdown 0%, Theil-Sen 29%). Slopes in exact integer
# micro-cents/day via floor div; the median is an integer order statistic
# (lower median, deterministic) — hash-exact end to end.
# Scale: the pair stage is |days|^2 — bounded by the CALENDAR (~2.4k days
# -> ~3M integer pairs), not by data volume; corpus size touches only the
# daily rollup. Adjudicated cartesian: the all-pairs set IS the estimator.
# --------------------------------------------------------------------------
@register(
    "q174_theil_sen_trend",
    """
    WITH daily AS (
      SELECT CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) AS d,
             SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS cents
      FROM orders GROUP BY 1
    ), slopes AS (
      SELECT (1000000 * (b.cents - a.cents)) // (b.d - a.d) AS s
      FROM daily a JOIN daily b ON a.d < b.d
    )
    SELECT CAST((SELECT count(*) FROM daily) AS BIGINT) AS n_days,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY s) AS BIGINT) AS slope_micro_cents_per_day
    FROM slopes
    """,
    "Theil-Sen robust revenue trend: exact-integer median of all pairwise daily-slope estimates (micro-cents/day) — promo-spike-proof where OLS is not; pair space bounded by the calendar (stats family)",
)
def q174(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Is revenue trending up — robustly: the median pairwise slope.
    Integer slopes + order-statistic median, bit-exact in any engine.

    The median does NOT run through `percentile_disc`: that aggregate
    buffers every raw slope per partition and merges all buffers into ONE
    task (measured 9 s at sf0.1 over 2.9M slopes; gigabytes through one
    task at a 50M-slope span). operators/robust.py::theil_sen_micro
    selects the exact same value by iterative range refinement — bounded
    4096-row histograms per round, full-parallel scans, TakeOrdered only
    on the final <=100k-row remainder (~3x faster here, and the only
    shape that survives a long calendar)."""
    from universal_aws_data_pipeline_spark.operators.robust import theil_sen_micro

    o = _t(spark, sf_dir, "orders")
    daily = (
        o.select(
            F.expr("cast(floor(unix_timestamp(o_orderdate) / 86400) as bigint)").alias("d"),
            F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
        )
        .groupBy("d")
        .agg(F.sum("cents").alias("cents"))
    )
    n_days, n_pairs, slope = theil_sen_micro(daily)
    return spark.createDataFrame(
        [(n_days, n_pairs, slope)],
        "n_days: long, n_pairs: long, slope_micro_cents_per_day: long",
    )
