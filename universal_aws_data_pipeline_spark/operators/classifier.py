"""Trained model-based quality classifier (extension X6 family — the
CCNet/fastText shape: Wenzek et al. 2020 "CCNet", Joulin et al. 2017
"fastText"; the GPT-3/LLaMA-style trained corpus filter).

The published recipe: train a LINEAR classifier over hashed bag-of-words
features to score "looks like the curated corpus" vs "random crawl", then
keep high-scoring documents. This is the one standard LLM-corpus pipeline
stage the heuristic/statistical quality battery (rule score, Gopher,
perplexity, DSIR) does not cover: the model is TRAINED on a label proxy,
not hand-written.

Engine-native spelling, designed so every round hash-grades against a SQL
oracle (the q113/q229 arithmetic discipline):

- **features**: md5-hashed word buckets (``dsir.hashed_bucket`` — the same
  portable hash the DSIR model uses), per-document bucket frequency
  quantized to exact integer micro-units ``f = (1e6 * count) div n_tokens``
  (truncating integer division — Spark ``div`` and DuckDB ``//`` agree on
  negatives, verified: both truncate toward zero).
- **centering**: the model regresses on MEAN-CENTERED features
  ``x̃ = x − m`` (m = per-bucket corpus mean frequency, quantized like f).
  Uncentered bag-of-words frequencies share one dominant direction (every
  document's frequency mass), which (a) makes plain gradient descent
  hopelessly ill-conditioned — the stability bound is set by that useless
  common direction while the class signal lives in directions ~30x
  smaller — and (b) biases every score toward the majority class. The
  bucket means ARE part of the trained model (they are its intercept):
  scoring applies ``w·(x − m)``.
- **labels**: a proxy derivable in-engine — any boolean column, mapped to
  ``y = ±1e6`` micro-units. The graded queries use ``lang = 'en'`` (the
  curated-slice discriminator — the model CCNet literally runs first);
  ``source = 'src0'`` gives the DSIR-style source-based variant.
- **training**: ``rounds`` full-batch gradient steps on the least-squares
  objective ``mean (w·x̃ − y)²/2`` with integer micro-unit weights. The
  centered algebra is computed SPARSELY — the dense doc×bucket grid never
  materializes: ``s_d = (Σ_{sparse} w f − Σ_b w m) div 1e6`` and
  ``g_b = (lr · (G_b − m_b·R)) div (n·1e6)`` with ``G_b = Σ_{sparse} r f``
  and ``R = Σ_d r`` (exact identities, since absent buckets contribute
  ``−m_b`` per doc). Every quantity is an exact BIGINT and every sum
  order-independent, so the trained model hash-grades bit-exactly.
- **lr**: an INTEGER multiplier applied before the one truncating
  division (no precision lost). Centered frequency features are tiny
  (typical per-bucket variance ~1e-4 in real units), so lr = 1 would need
  thousands of rounds; the default lr = 256 converges to the in-sample
  least-squares ceiling in ~5 rounds on the fixtures while the divergence
  boundary sits ~4x higher (verified empirically; GD on the centered
  spectrum, the common direction that would have forced lr < 2 is gone).
- **scoring**: a pure columnar dot product — one broadcast join of the
  B-row model onto the hashed token stream + one exact integer sum per
  document, minus the model-constant bias ``Σ w·m``. No UDFs anywhere.

Scale shape: the model is a B-row table (B = 64 here; fastText uses
hashed bins the same way) — vocabulary-independent and broadcastable at
any corpus size. TRAINING runs on a bounded labeled sample (the production
recipe: CCNet trains on a Wikipedia sample, not the full crawl), so the
full-batch gradient's int64 sums stay far from overflow: worst-case
|lr·Σ_d r·f| ≈ lr·n·1e12 bounds the sample at n ~ 3×10^4 docs
adversarially / ~10^6 docs on natural text at the default lr (cast the
two gradient sums to DECIMAL(38,0) past that). SCORING is the map-only
broadcast join and scales to the full corpus. Per training round: one
hash-agg by doc + one hash-agg by bucket over the sparse feature table,
which is localCheckpoint()ed once and reused — the corpus is tokenized
exactly once. The model table is checkpointed per round (the q133
Bradley–Terry lesson: the update consumes it twice per round, so unbroken
lineage would grow a 2^rounds join tree).
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from universal_aws_data_pipeline_spark.functions.texthash import tokens_col
from universal_aws_data_pipeline_spark.operators.dsir import hashed_bucket

MICRO = 1_000_000


def doc_bucket_features(
    df: DataFrame,
    is_target: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 64,
) -> DataFrame:
    """Per-document hashed bag-of-words features in exact integer
    micro-frequency units: (id, bucket, f_micro, y_micro, n_tokens) —
    SPARSE (only buckets the document touches).

    ``f_micro = (1e6 * bucket_count) div n_tokens`` — truncating integer
    division on positive operands, identical in Spark and DuckDB.
    ``y_micro = +1e6`` where ``is_target`` else ``-1e6``. Documents with
    zero normalized tokens have no feature rows and are excluded from the
    training corpus on both engines (the documented contract)."""
    toks = df.select(
        F.col(id_col).alias("_id"),
        is_target.alias("_tgt"),
        F.explode(tokens_col(F.col(text_col))).alias("_w"),
    ).filter(F.col("_w") != "")
    bucketed = toks.select(
        "_id", "_tgt", hashed_bucket(F.col("_w"), buckets).alias("bucket")
    )
    per_doc = bucketed.groupBy("_id", "_tgt").agg(
        F.count(F.lit(1)).cast("long").alias("_n")
    )
    per_bucket = bucketed.groupBy("_id", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("_c")
    )
    return (
        per_bucket.join(per_doc, "_id")
        .select(
            F.col("_id").alias(id_col),
            "bucket",
            F.expr(f"({MICRO} * _c) div _n").cast("long").alias("f_micro"),
            F.when(F.col("_tgt"), F.lit(MICRO))
            .otherwise(F.lit(-MICRO))
            .cast("long")
            .alias("y_micro"),
            F.col("_n").alias("n_tokens"),
        )
    )


def _bucket_spine(df: DataFrame, buckets: int) -> DataFrame:
    """All-B-row zero table (bucket). Built via ``spark.range`` — B rows,
    never corpus-derived."""
    return df.sparkSession.range(buckets).select(
        F.col("id").cast("long").alias("bucket")
    )


def _sparse_scores(feat: DataFrame, model: DataFrame, id_col: str) -> DataFrame:
    """Per-doc centered dot product under ``model`` (bucket, w_micro,
    m_micro): ``s = (Σ_sparse w·f − Σ_b w·m) div 1e6`` — the exact dense
    centered sum, computed without materializing absent buckets. Returns
    (id, y_micro, n_tokens, s_micro)."""
    wm = model.agg(
        F.sum(F.col("w_micro") * F.col("m_micro")).cast("long").alias("_wm")
    )
    return (
        feat.join(F.broadcast(model.select("bucket", "w_micro")), "bucket")
        .groupBy(id_col)
        .agg(
            F.max("y_micro").alias("y_micro"),
            F.max("n_tokens").alias("n_tokens"),
            F.sum(F.col("w_micro") * F.col("f_micro")).alias("_wf"),
        )
        .crossJoin(F.broadcast(wm))
        .select(
            id_col,
            "y_micro",
            "n_tokens",
            F.expr(f"(_wf - _wm) div {MICRO}").cast("long").alias("s_micro"),
        )
    )


def _lp_rounds(
    df: DataFrame,
    is_target: Column,
    rounds: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 64,
    lr: int = 256,
) -> Iterator[tuple[int, DataFrame, DataFrame]]:
    """The ONE gradient-descent loop behind train/score/curve (the shared
    `_uni_em_rounds` convention: a single generator, so the trained model
    and the convergence curve can never drift apart).

    Yields per round r = 1..rounds: ``(r, scores_r, model_r)`` where
    ``scores_r`` is the per-doc (id, y_micro, n_tokens, s_micro) under the
    PRE-round model (the E-step-objective convention of q231) and
    ``model_r`` is the post-update (bucket, w_micro, m_micro) table,
    localCheckpoint()ed.

    Every arithmetic step is exact BIGINT; the only divisions are
    truncating ``div`` by positive values, which DuckDB's ``//`` replays
    bit-identically (both truncate toward zero on negatives)."""
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    if lr < 1:
        raise ValueError(f"lr must be a positive integer, got {lr}")
    feat = doc_bucket_features(
        df, is_target, id_col=id_col, text_col=text_col, buckets=buckets
    ).localCheckpoint(eager=True)
    # 1-row broadcast attach (the catalog's sanctioned pattern) — the doc
    # count rides as a column, never a driver-side collect.
    n_docs = feat.select(id_col).distinct().agg(
        F.count(F.lit(1)).cast("long").alias("_n_docs")
    )
    # per-bucket mean frequency — the model's intercept half, fixed for the
    # whole run. Sparse sum == dense sum (absent buckets contribute 0).
    means = (
        feat.groupBy("bucket")
        .agg(F.sum("f_micro").alias("_sf"))
        .crossJoin(F.broadcast(n_docs))
        .select("bucket", F.expr("_sf div _n_docs").cast("long").alias("m_micro"))
    )
    model = (
        _bucket_spine(df, buckets)
        .join(F.broadcast(means), "bucket", "left")
        .select(
            "bucket",
            F.lit(0).cast("long").alias("w_micro"),
            F.coalesce(F.col("m_micro"), F.lit(0)).cast("long").alias("m_micro"),
        )
        .localCheckpoint(eager=True)
    )
    for r in range(1, rounds + 1):
        # single-execution barrier (round-13 review): the per-doc scores
        # feed the residual total AND the gradient join (and, in curve
        # mode, the stats row) — un-checkpointed, the feat-join-model
        # scoring aggregation would re-execute 2-3x per round
        scores = _sparse_scores(feat, model, id_col).localCheckpoint(eager=True)
        resid = scores.select(
            id_col, (F.col("s_micro") - F.col("y_micro")).alias("_r")
        )
        # R = Σ_d r (1-row attach); G_b = Σ_sparse r·f; the centered
        # gradient is g_b = lr·(G_b − m_b·R) div (n·1e6) — exact identity
        # with the dense centered sum (absent buckets contribute −m_b·r_d).
        rtot = resid.agg(F.sum("_r").cast("long").alias("_R"))
        grads = (
            # resid is training-sample-sized, NOT a 1-row attach: no
            # broadcast hint (a ~1e6-doc sample would collect on the
            # driver every round); a plain equi-join on the id scales and
            # AQE still picks broadcast when the sample is actually small
            feat.join(resid, id_col)
            .groupBy("bucket")
            .agg(F.sum(F.col("_r") * F.col("f_micro")).alias("_G"))
            .crossJoin(F.broadcast(rtot))
            .crossJoin(F.broadcast(n_docs))
            .join(F.broadcast(model.select("bucket", "m_micro")), "bucket")
            .select(
                "bucket",
                F.expr(f"({lr} * (_G - m_micro * _R)) div (_n_docs * {MICRO})")
                .cast("long")
                .alias("_g"),
            )
        )
        model = (
            model.join(F.broadcast(grads), "bucket", "left")
            .select(
                "bucket",
                (F.col("w_micro") - F.coalesce(F.col("_g"), F.lit(0)))
                .cast("long")
                .alias("w_micro"),
                "m_micro",
            )
            .localCheckpoint(eager=True)
        )
        yield r, scores, model


def linear_probe_train(
    df: DataFrame,
    is_target: Column,
    rounds: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 64,
    lr: int = 256,
) -> DataFrame:
    """Train the quality classifier: ``rounds`` exact-integer gradient
    steps; returns the B-row model (bucket, w_micro, m_micro) — weights
    plus the bucket means that center the scorer. The caller amortizes it
    as a per-dataset parquet artifact (the q226 convention)."""
    model = None
    for _, _, model in _lp_rounds(
        df, is_target, rounds, id_col=id_col, text_col=text_col, buckets=buckets, lr=lr
    ):
        pass
    return model


def _model_buckets(model: DataFrame) -> int:
    """The bucket count IS the model's row count (the spine guarantees
    exactly B rows at training time) — derived, never passed, so a scorer
    can NOT silently hash features mod a different B than the weights were
    learned under (round-13 review: a mismatched ``buckets`` argument
    would score every document confidently wrong with no error anywhere).
    One count() over a B-row table — negligible."""
    n = model.count()
    if n < 1:
        raise ValueError("model table is empty — not a trained classifier")
    return n


def linear_probe_score(
    df: DataFrame,
    model: DataFrame,
    is_target: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score every document under a trained model (bucket, w_micro,
    m_micro): (id, n_tokens, s_micro, pred_target, is_target). Pure
    columnar centered dot product — the B-row model broadcasts onto the
    hashed token stream; one exact integer sum per doc minus the
    model-constant bias. ``pred_target = s_micro >= 0`` (the sign
    convention of the ±1e6 labels). The feature-hash modulus is DERIVED
    from the model (see ``_model_buckets``). Map-only at any corpus
    scale."""
    feat = doc_bucket_features(
        df, is_target, id_col=id_col, text_col=text_col,
        buckets=_model_buckets(model),
    )
    return _sparse_scores(feat, model, id_col).select(
        id_col,
        "n_tokens",
        "s_micro",
        (F.col("s_micro") >= 0).alias("pred_target"),
        (F.col("y_micro") > 0).alias("is_target"),
    )


def linear_probe_curve(
    df: DataFrame,
    is_target: Column,
    rounds: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 64,
    lr: int = 256,
) -> DataFrame:
    """Training convergence curve (the q222/q231 analogue): per round, the
    objective under the PRE-round model — mean |residual| in micro-units
    (exact: Σ|s−y| div n) and the count of sign-correct documents — plus
    the post-update model's L1 mass. All exact BIGINTs; consumes the SAME
    generator as the trainer, so the curve cannot drift from the model."""
    rows: DataFrame | None = None
    for r, scores, model in _lp_rounds(
        df, is_target, rounds, id_col=id_col, text_col=text_col, buckets=buckets, lr=lr
    ):
        stat = (
            scores.agg(
                F.count(F.lit(1)).cast("long").alias("_n"),
                F.sum(F.abs(F.col("s_micro") - F.col("y_micro"))).alias("_ae"),
                F.sum(
                    F.when(
                        (F.col("s_micro") >= 0) == (F.col("y_micro") > 0), 1
                    ).otherwise(0)
                )
                .cast("long")
                .alias("n_correct"),
            )
            .crossJoin(
                F.broadcast(
                    model.agg(
                        F.sum(F.abs("w_micro")).cast("long").alias("w_l1_micro")
                    )
                )
            )
            .select(
                F.lit(r).cast("int").alias("round"),
                F.expr("_ae div _n").cast("long").alias("mean_abs_resid_micro"),
                "n_correct",
                "w_l1_micro",
            )
        )
        rows = stat if rows is None else rows.unionByName(stat)
    return rows


def selection_curve(
    scored: DataFrame,
    thresholds: list[int],
) -> DataFrame:
    """Operating curve for the trained filter — the CCNet "choose the keep
    cutoff" step: for each candidate threshold t (micro-units), the volume
    and quality of the corpus slice ``s_micro >= t``. One row per
    threshold: (threshold_micro, n_kept, n_target_kept, precision_micro,
    recall_micro) — precision/recall vs the proxy label in exact truncated
    micro-units (div; 0 when the slice is empty).

    Input is :func:`linear_probe_score` output (needs s_micro +
    is_target). Scale shape: ONE conditional aggregation over the scored
    table (2|T|+1 map-side-combinable sums — map-only at any corpus size,
    no per-threshold re-scan, no sort, no explode of corpus rows), then a
    |T|-row row-local unpivot of the single aggregate row. The threshold
    grid is a literal — the decision surface, not data."""
    if not thresholds:
        raise ValueError("thresholds must be non-empty")
    if len(set(thresholds)) != len(thresholds):
        raise ValueError(f"duplicate thresholds: {thresholds}")
    # count(when(...)) not sum(when(...)): count never returns NULL, so an
    # EMPTY scored input yields exact zeros — matching the oracle's
    # count(*) FILTER — instead of NULL counts (round-13 review)
    aggs = []
    for i, t in enumerate(thresholds):
        keep = F.col("s_micro") >= F.lit(int(t))
        aggs.append(F.count(F.when(keep, 1)).cast("long").alias(f"_k{i}"))
        aggs.append(
            F.count(F.when(keep & F.col("is_target"), 1))
            .cast("long")
            .alias(f"_t{i}")
        )
    aggs.append(
        F.count(F.when(F.col("is_target"), 1)).cast("long").alias("_tot")
    )
    wide = scored.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(int(t)).cast("long").alias("threshold_micro"),
                F.col(f"_k{i}").alias("n_kept"),
                F.col(f"_t{i}").alias("n_target_kept"),
            )
            for i, t in enumerate(thresholds)
        ]
    )
    return (
        wide.select(F.explode(rows).alias("_r"), "_tot")
        .select(
            F.col("_r.threshold_micro").alias("threshold_micro"),
            F.col("_r.n_kept").alias("n_kept"),
            F.col("_r.n_target_kept").alias("n_target_kept"),
            F.when(
                F.col("_r.n_kept") > 0,
                F.expr(f"({MICRO} * _r.n_target_kept) div _r.n_kept"),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("precision_micro"),
            F.when(
                F.col("_tot") > 0,
                F.expr(f"({MICRO} * _r.n_target_kept) div _tot"),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("recall_micro"),
        )
    )


def quality_filter_stream_fn(
    out_path: str,
    model_path: str,
    keep_threshold_micro: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """``foreachBatch`` maintainer scoring a LIVE ingestion stream under a
    FIXED trained quality classifier — the streaming twin of the q233
    scoring leg (STR9): a production crawl feed filters documents AS THEY
    ARRIVE under the deployed model, without retraining (the CCNet filter
    run online; the q227-token-cost convention of "telemetry under the
    DEPLOYED artifact").

    Per batch: load the trained-once model artifact (bucket, w_micro,
    m_micro — the q232 parquet, B rows, broadcast), score every document
    via the same centered dot product as :func:`linear_probe_score` (one
    merge of contract: batch and offline scoring share `_sparse_scores`),
    and APPEND the per-doc decision log (id, n_tokens, s_micro, kept,
    batch_id) to ``out_path``. The log is TOTAL: documents with zero
    normalized tokens have no features and therefore no score — they are
    logged with ``s_micro = NULL, kept = false`` (an unscorable document
    must surface as an explicit rejection, not vanish from the audit
    trail).

    At-least-once safety comes from determinism (the
    ``dp_release_stream_fn`` pattern): decisions are a pure function of
    (batch rows, model artifact, threshold), so a replayed batch appends
    byte-identical rows and downstream consumers dedup on
    (id, batch_id) losslessly. No state table — the model is frozen and
    per-doc decisions carry no cross-batch memory (admission QUOTAS are
    ``domain_cap_stream_fn``'s contract; compose downstream if both are
    wanted).

    Scale per batch: map-only — one tokenize pass over the batch, the
    B-row model broadcast, one integer sum per doc."""

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        model = spark.read.parquet(model_path)
        feat = doc_bucket_features(
            batch_df, F.lit(False), id_col=id_col, text_col=text_col,
            buckets=_model_buckets(model),
        )
        scores = _sparse_scores(feat, model, id_col).select(
            id_col, "n_tokens", "s_micro"
        )
        out = (
            batch_df.select(id_col)
            .join(scores, id_col, "left")
            .select(
                id_col,
                "n_tokens",
                "s_micro",
                F.coalesce(
                    F.col("s_micro") >= F.lit(int(keep_threshold_micro)),
                    F.lit(False),
                ).alias("kept"),
                F.lit(int(batch_id)).cast("long").alias("batch_id"),
            )
        )
        out.write.mode("append").parquet(out_path)

    return fn
