"""Tokenizer-training statistics: BPE merge candidates and vocab budgets.

Reference parity: none — LLM-training-data extensions (SURVEY §2.11
family). Training a subword tokenizer on a 100 TB corpus starts with two
distributed aggregates: (a) the adjacent-symbol pair frequencies that
drive BPE merge selection, and (b) the vocabulary coverage curve that
sizes the vocab budget. Both factor through the WORD-FREQUENCY table
first — the classic BPE trick: the corpus is scanned exactly once to
build |vocab| (word, count) rows, and every later stage (pair explode,
coverage window) runs over the vocabulary domain, which is bounded by
language, not by corpus size. At 100 TB the word-frequency rollup is the
only shuffle that sees corpus volume, and it is map-side combinable.

Tokenization matches the repo-wide convention (``texthash.tokens_col``:
lowercase, non-alphanumerics to spaces) so these stats compose with the
dedup/quality operators on the same normalized token stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from universal_aws_data_pipeline_spark.functions.texthash import tokens_col

# replace() passes per BPE merge round (see bpe_learn_merges docstring):
# fixed, not until-fixpoint, so the SQL oracle composes the identical
# expression. Two passes make non-self pairs and self-runs <= 4 exactly
# greedy; self-runs >= 5 under-merge at ANY pass count (isolated leftover
# singles cannot re-pair). The third pass is headroom.
_MERGE_PASSES = 3


def word_frequencies(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, count) over the normalized-whitespace token stream — the
    shared substrate for BPE pair mining and vocab budgeting. One corpus
    scan, one map-side-combinable rollup to |vocab| rows."""
    return (
        df.select(F.explode(tokens_col(F.col(text_col))).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )


def bpe_pair_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adjacent character-pair frequencies weighted by word occurrence —
    the first-round BPE merge-candidate table (the pair with the top
    count is the first merge a byte-pair tokenizer learns).

    Runs on the word-frequency table: each distinct word of length ≥ 2
    contributes its (len−1) adjacent 2-grams, weighted by the word's
    corpus count. The explode is over Σ(len−1) per DISTINCT word —
    vocabulary-bounded, never corpus-bounded: a 100× corpus grows the
    counts, not the exploded row set. The 2-grams come straight from
    ``substring(w, i, 2)`` over an index sequence (array expression, no
    UDF), identically spellable in any SQL engine.

    Returns (pair, pair_count, n_words) — n_words is the number of
    distinct word types containing the pair at least once (a merge that
    only helps one word is a worse candidate than one spanning many).
    Multiple occurrences of a pair inside one word each count toward
    pair_count (BPE counts positions, not presence).
    """
    vocab = word_frequencies(df, text_col)
    pairs = vocab.filter(F.length("w") >= 2).select(
        "w",
        "c",
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair"),
    )
    return pairs.groupBy("pair").agg(
        F.sum("c").cast("long").alias("pair_count"),
        F.countDistinct("w").cast("long").alias("n_words"),
    )


def vocab_coverage(
    df: DataFrame, budgets: list[int], text_col: str = "text"
) -> DataFrame:
    """Coverage curve for vocabulary sizing: for each candidate budget V,
    the fraction of all token OCCURRENCES covered by the top-V word types
    (ranked by count desc, word asc — a total, engine-portable order).
    The knee of this curve is the standard vocab-size decision; mass not
    covered is what falls to subword/UNK handling.

    Scale: the ranking window runs single-partition BY DESIGN over the
    word-frequency table — |vocab| rows, a language-bounded domain (the
    same bounded-domain single-partition adjudication as the histogram
    walks; the corpus itself is only touched by the word-frequency
    rollup). Budgets clamp to the actual type count, so V beyond the
    vocabulary reports full coverage instead of dropping the row. An
    EMPTY corpus (n_types = 0) still emits every budget row, with
    tokens_covered 0 and coverage 0.0 — the clamp floors at rank 1 and
    the rank lookup left-joins, so the no-types case degrades to zeros
    instead of silently returning an empty curve (round-10 ADVICE).

    Returns one row per DISTINCT budget (duplicates in ``budgets`` are
    collapsed; rows come back keyed by ``vocab_budget``, so read them by
    value, not by input position): (vocab_budget, tokens_covered,
    coverage, n_types, total_tokens), coverage rounded to 4 dp.
    """
    if not budgets or any(int(v) < 1 for v in budgets):
        raise ValueError(f"budgets must be positive ints, got {budgets!r}")
    vocab = word_frequencies(df, text_col)
    order = Window.orderBy(F.col("c").desc(), F.col("w"))
    cum = vocab.select(
        F.row_number().over(order).alias("rn"),
        F.sum("c")
        .over(order.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long")
        .alias("cum_tokens"),
    )
    tot = vocab.agg(
        # sum over zero rows is NULL — coalesce so the empty-corpus curve
        # reports total_tokens 0, not NULL
        F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("total_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
    )
    b = F.explode(F.array(*[F.lit(int(v)) for v in sorted(set(int(v) for v in budgets))]))
    budget_rows = tot.select(b.alias("vocab_budget"), "total_tokens", "n_types").withColumn(
        # clamp BEFORE the join so the lookup is a plain equi-join (a
        # |budgets|-row broadcast build side), not a non-equi nested loop;
        # the greatest(.., 1) floor keeps the rank valid on an EMPTY
        # corpus (n_types = 0 would clamp rn to 0, matching no rank row)
        "rn",
        F.greatest(
            F.least(F.col("vocab_budget").cast("int"), F.col("n_types").cast("int")),
            F.lit(1),
        ),
    )
    return (
        budget_rows.join(cum, "rn", "left")  # left: empty corpus has no ranks
        .select(
            "vocab_budget",
            F.coalesce(F.col("cum_tokens"), F.lit(0)).cast("long").alias("tokens_covered"),
            F.coalesce(
                F.round(F.col("cum_tokens") / F.col("total_tokens"), 4), F.lit(0.0)
            ).alias("coverage"),
            "n_types",
            "total_tokens",
        )
    )


def apply_merges(
    df: DataFrame,
    merges: list[str],
    text_col: str = "text",
    vocab: DataFrame | None = None,
) -> DataFrame:
    """Tokenize the corpus with a LEARNED merge table — the apply side of
    :func:`bpe_learn_merges` (train) and the step every downstream token
    count implies: learn merges once, then segment fresh text with them.

    ``merges`` is the ORDERED merge list as ``bpe_learn_merges`` returns
    it (``"a b"`` pairs, train order — BPE applies merges in learned
    priority order). Each merge is applied with the SAME fixed
    ``_MERGE_PASSES``-pass leftmost non-overlapping replacement as
    training (one shared contract, so train-time segmentations and
    apply-time segmentations agree exactly — including the documented
    self-run-≥5 under-merge, which both sides share), and the whole
    merge chain composes into ONE column expression: applying V merges
    is V·passes scalar replace() calls inside whole-stage codegen, no
    loop over data, no driver synchronization, no UDF.

    Returns the re-segmented VOCABULARY ``(w, seg, c)`` — word, its
    space-separated symbol segmentation under the merges, corpus count.
    Per-document tokenization factors through this table by construction
    (a word's segmentation is context-free), so downstream symbol
    statistics stay vocabulary-bounded: corpus volume touches only the
    word-frequency rollup, exactly the training-side discipline.

    Scale: one corpus scan → |vocab| rows → a pure column expression.
    The merge list is driver-side by nature (it IS the tokenizer model,
    |vocab_budget| entries, kilobytes). A caller that already holds the
    (w, c) word-frequency table passes it as ``vocab`` and the corpus
    scan is skipped entirely (q230 shares ONE corpus pass across both
    tokenizer models this way).
    """
    for m in merges:
        parts = m.split(" ")
        if len(parts) != 2 or not parts[0] or not parts[1]:
            raise ValueError(
                f"merges must be 'left right' symbol pairs, got {m!r}"
            )
    if vocab is None:
        vocab = word_frequencies(df, text_col)
    seg: F.Column = F.concat(
        F.lit(" "), F.trim(F.regexp_replace(F.col("w"), "(.)", "$1 ")), F.lit(" ")
    )
    for pair in merges:
        merged = pair.replace(" ", "")
        for _ in range(_MERGE_PASSES):
            seg = F.replace(seg, F.lit(f" {pair} "), F.lit(f" {merged} "))
    return vocab.select("w", F.trim(seg).alias("seg"), "c")


def token_cost_stream_fn(
    out_path: str,
    merges: list[str],
    text_col: str = "text",
    group_col: str | None = None,
):
    """``foreachBatch`` maintainer of a live token-cost telemetry log
    under a FIXED learned merge list — the streaming twin of the q227
    fertility audit: a production ingestion stream wants to know, per
    micro-batch, how many tokens the new data will cost under the
    tokenizer that is actually deployed (budget burn, language-mix
    shifts), without re-training anything.

    Per batch: the batch's word-frequency rollup (optionally keyed by
    ``group_col``, e.g. language) → :func:`apply_merges`' segmentation
    as a pure column expression → one summary row per group with RAW
    ADDITIVE counts (ws_tokens, bpe_symbols, chars) plus the batch id,
    appended to ``out_path``. Raw counts, not ratios, so the log is
    MERGEABLE: any window's fertility/compression is a sum-then-divide
    over its rows, exact — the same additive-telemetry contract as the
    drift maintainers. NULL group values are kept as a real category
    via an explicit "(null)" coalesce (a telemetry stream must not drop
    exactly the unlabeled slice).

    At-least-once safety comes from determinism (the
    ``dp_release_stream_fn`` pattern): the counts are pure functions of
    the batch rows and the fixed merge list, so a replayed batch appends
    byte-identical rows and downstream consumers dedup on
    (group, batch_id) losslessly.

    Scale per batch: two map-side-combinable rollups over the batch (the
    batch-wide vocabulary that prices each word via
    :func:`apply_merges` — one contract spelling, shared with training —
    and the (group, word) count table), a batch-vocabulary-keyed
    equi-join, and a |groups|-row aggregate.
    """

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        gcols = []
        if group_col is not None:
            batch_df = batch_df.withColumn(
                group_col,
                F.coalesce(F.col(group_col).cast("string"), F.lit("(null)")),
            )
            gcols = [group_col]
        # per-word symbol costs via apply_merges VERBATIM — one merge-
        # contract spelling shared with training/q226/q227 (and its
        # merge-format validation); the (group, word) rollup is the only
        # batch-volume pass, joined on the batch-vocabulary-sized table
        sizes = apply_merges(batch_df, merges, text_col).select(
            "w",
            F.size(F.split("seg", " ")).cast("long").alias("_nsym"),
            F.length("w").cast("long").alias("_nchr"),
        )
        gw = (
            batch_df.select(
                *gcols, F.explode(tokens_col(F.col(text_col))).alias("w")
            )
            .filter(F.col("w") != "")
            .groupBy(*gcols, "w")
            .agg(F.count(F.lit(1)).cast("long").alias("c"))
        )
        out = gw.join(sizes, "w").groupBy(*gcols).agg(
            F.sum("c").cast("long").alias("ws_tokens"),
            F.sum(F.col("c") * F.col("_nsym")).cast("long").alias("bpe_symbols"),
            F.sum(F.col("c") * F.col("_nchr")).cast("long").alias("chars"),
        )
        out.withColumn("batch_id", F.lit(int(batch_id)).cast("long")).write.mode(
            "append"
        ).parquet(out_path)

    return fn


# ---------------------------------------------------------------------------
# Unigram-LM (SentencePiece-style) tokenizer — the standard alternative to
# BPE (Kudo 2018), trained by FIXED-ROUND hard EM (Viterbi E-step) so every
# round is a deterministic function of the data and hash-grades against a
# SQL oracle. The same discipline as the BPE family: the corpus is scanned
# once into the |vocab| word-frequency table, and everything after —
# candidate pieces, Viterbi segmentation, expected counts — runs over the
# vocabulary domain (bounded by language, never by corpus size).
#
# Exact contract (all constants fixed so the oracle composes identically):
# - candidate pieces: every substring of length 1.._UNI_MAX_PIECE of every
#   vocab word; words longer than _UNI_MAX_WORD are EXCLUDED from training
#   and audits (documented filter, mirrored in every oracle).
# - piece probabilities live as integer MICRO-NAT costs (the q113 device):
#   cost = round((ln(total) - ln(count)) * 1e6) as BIGINT — ln runs on
#   exact integers, and the Viterbi DP is then pure BIGINT min-plus
#   arithmetic: zero float surface inside the recursion, so both engines
#   agree bit-for-bit.
# - smoothing/coverage: single-character pieces get +1 on every count pass
#   (seed and each M-step) and are NEVER pruned — the standard unigram-LM
#   rule that keeps every word segmentable; multi-char pieces with zero
#   Viterbi usage drop implicitly (EM's own pruning), and a final explicit
#   prune keeps the top-`keep_multi` multi-char pieces by (count desc,
#   piece asc) — the "drop lowest-loss pieces" step, simplified from
#   SentencePiece's loss ranking to usage ranking (hard-EM usage IS the
#   piece's likelihood contribution under the Viterbi objective).
# - tie-break: when two segmentations of a word cost the same, the longer
#   final piece wins at every DP position (key = cost*4 + (3 - piece_len),
#   minimized) — a total, engine-portable order.
# ---------------------------------------------------------------------------

_UNI_MAX_PIECE = 3
_UNI_MAX_WORD = 12
_UNI_BIG = 10**12  # "piece unavailable" cost — dominates any real path


def _uni_vocab(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Word-frequency substrate for unigram training: the shared
    ``word_frequencies`` rollup with the trainer's max-word-length
    contract applied (words longer than _UNI_MAX_WORD are excluded —
    the DP and its oracle replay are fixed-depth)."""
    return word_frequencies(df, text_col).filter(
        F.length("w") <= _UNI_MAX_WORD
    )


def _uni_candidates(vocab: DataFrame) -> DataFrame:
    """(w, c, i, L, piece): every substring of length L in 1.._UNI_MAX_PIECE
    ending at position i (1-based) of every vocab word. Vocabulary-bounded:
    sum of len(w)·_UNI_MAX_PIECE rows per DISTINCT word — a 100x corpus
    grows c, not this row set."""
    parts = []
    for L in range(1, _UNI_MAX_PIECE + 1):
        parts.append(
            vocab.filter(F.length("w") >= L)
            .select(
                "w",
                "c",
                F.explode(F.sequence(F.lit(L), F.length("w"))).alias("i"),
                F.lit(L).alias("L"),
            )
            .withColumn(
                "piece", F.col("w").substr(F.col("i") - F.lit(L - 1), F.lit(L))
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _uni_costs(counts: DataFrame) -> DataFrame:
    """(piece, cnt) -> (piece, cnt, cost): micro-nat cost of each piece
    under the multinomial counts. The total is a 1-row broadcast attach
    (the adjudicated scalar-attach shape); ln runs on exact integers so
    the rounded micro-nat is engine-identical."""
    total = counts.agg(F.sum("cnt").cast("long").alias("t"))
    return counts.crossJoin(F.broadcast(total)).select(
        "piece",
        "cnt",
        F.round(
            (F.log(F.col("t").cast("double")) - F.log(F.col("cnt").cast("double")))
            * 1000000.0,
            0,
        )
        .cast("long")
        .alias("cost"),
    )


def _uni_seed(vocab: DataFrame) -> DataFrame:
    """Round-0 model: piece counts = substring occurrences weighted by word
    frequency (+1 on single chars, the uniform smoothing rule)."""
    cand = _uni_candidates(vocab)
    seed = cand.groupBy("piece").agg(F.sum("c").cast("long").alias("s"))
    adj = seed.select(
        "piece",
        (
            F.col("s")
            + F.when(F.length("piece") == 1, F.lit(1)).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("cnt"),
    )
    return _uni_costs(adj)


def unigram_viterbi_segment(vocab: DataFrame, model: DataFrame) -> DataFrame:
    """Viterbi-segment every vocab word under a (piece, cost) model — the
    E-step and the apply step in one function (train/apply share ONE
    contract, the q226 discipline).

    Relational prep, then a single fold: candidates equi-join the model on
    the piece (never a driver-side lookup table), one grouped pass builds
    per-word (position -> cost) maps per piece length, and the DP itself is
    ONE ``F.aggregate`` fold over positions 1..len(w) — BIGINT min-plus
    steps carrying the last three best-prefix states, no UDF, no loop over
    data, no driver synchronization. Unreachable transitions cost _UNI_BIG;
    single-char pieces are always in the model (never pruned), so every
    word segments.

    Returns (w, c, seg, cost, covered): the space-separated Viterbi
    segmentation, its total micro-nat cost, and the alphabet-coverage flag.
    Scale: one vocab-bounded join + one grouped rollup; corpus volume never
    appears.

    ALPHABET-COVERAGE PRECONDITION (round-12 ADVICE): "every word
    segments" holds only when the input words' character inventory is a
    subset of the model's single-char pieces — the same-corpus usage of
    training (q229/q230), where chars are never pruned. Applying a trained
    model to text with an UNSEEN character still returns a row, but its
    cost includes the ``_UNI_BIG`` unreachable sentinel (~1e12 micro-nats
    per gap) and its segmentation silently glues sentinel-priced pieces.
    ``covered = cost < _UNI_BIG`` flags exactly those rows: library
    callers scoring out-of-corpus text must filter or route
    ``covered = false`` words (e.g. to a byte-fallback tokenizer, the
    SentencePiece production convention) instead of consuming
    sentinel-cost segmentations as if they were priced."""
    cand = _uni_candidates(vocab)
    sc = cand.join(model.select("piece", "cost"), "piece")

    def entries(L: int) -> F.Column:
        return F.map_from_entries(
            F.collect_list(
                F.when(
                    F.col("L") == L,
                    F.struct(F.col("i").alias("k"), F.col("cost").alias("v")),
                )
            )
        )

    # left-join from the vocab so the output is TOTAL: a word with NO piece
    # in the model (fully-unseen alphabet) previously vanished at the inner
    # candidate/model join — silent row loss is worse than a flagged row.
    # Its maps come back NULL, element_at(NULL, i) is NULL, and the fold's
    # existing coalesce prices every position at the _UNI_BIG sentinel, so
    # the row surfaces with covered=false like any partially-unseen word.
    per = vocab.select("w", "c").join(
        sc.groupBy("w", "c").agg(
            entries(1).alias("m1"), entries(2).alias("m2"), entries(3).alias("m3")
        ),
        ["w", "c"],
        "left",
    )
    big = F.lit(_UNI_BIG).cast("long")
    init = F.struct(
        F.lit(0).cast("long").alias("b1"),
        big.alias("b2"),
        big.alias("b3"),
        F.lit("").alias("s1"),
        F.lit("").alias("s2"),
        F.lit("").alias("s3"),
    )

    def step(acc: F.Column, i: F.Column) -> F.Column:
        # acc carries best[i-1], best[i-2], best[i-3] (+ their segs); a
        # piece of length j ending at i extends best[i-j]
        c1 = F.coalesce(F.element_at(F.col("m1"), i), big)
        c2 = F.coalesce(F.element_at(F.col("m2"), i), big)
        c3 = F.coalesce(F.element_at(F.col("m3"), i), big)
        b1c, b2c, b3c = acc["b1"] + c1, acc["b2"] + c2, acc["b3"] + c3
        # tie-break key: cost*4 + (3 - piece_len) — equal-cost paths pick
        # the longer final piece, identically in the SQL oracle's arg_min
        k1, k2, k3 = b1c * 4 + 2, b2c * 4 + 1, b3c * 4
        kmin = F.least(k1, k2, k3)
        nb = F.least(b1c, b2c, b3c)
        ns = (
            F.when(
                kmin == k3,
                F.concat(acc["s3"], F.lit(" "), F.col("w").substr(i - 2, F.lit(3))),
            )
            .when(
                kmin == k2,
                F.concat(acc["s2"], F.lit(" "), F.col("w").substr(i - 1, F.lit(2))),
            )
            .otherwise(
                F.concat(acc["s1"], F.lit(" "), F.col("w").substr(i, F.lit(1)))
            )
        )
        return F.struct(
            nb.alias("b1"),
            acc["b1"].alias("b2"),
            acc["b2"].alias("b3"),
            ns.alias("s1"),
            acc["s1"].alias("s2"),
            acc["s2"].alias("s3"),
        )

    st = F.aggregate(F.sequence(F.lit(1), F.length("w")), init, step)
    return per.withColumn("_st", st).select(
        "w",
        "c",
        F.trim(F.col("_st")["s1"]).alias("seg"),
        F.col("_st")["b1"].alias("cost"),
        (F.col("_st")["b1"] < F.lit(_UNI_BIG).cast("long")).alias("covered"),
    )


def _uni_mstep(seg_tbl: DataFrame, char_inventory: DataFrame) -> DataFrame:
    """M-step: piece usage counts from the Viterbi segmentations (+1 on
    every single char — chars missing from all segmentations survive with
    count 1), renormalized into micro-nat costs. Multi-char pieces with
    zero usage drop here — EM's implicit prune."""
    used = (
        seg_tbl.select(F.explode(F.split("seg", " ")).alias("piece"), "c")
        .groupBy("piece")
        .agg(F.sum("c").cast("long").alias("used"))
    )
    chars = char_inventory.join(used, "piece", "left").select(
        "piece",
        (F.coalesce(F.col("used"), F.lit(0)) + 1).cast("long").alias("cnt"),
    )
    multi = used.filter(F.length("piece") >= 2).select(
        "piece", F.col("used").alias("cnt")
    )
    return _uni_costs(chars.unionByName(multi))


def _uni_em_setup(df: DataFrame, text_col: str):
    """Checkpointed (vocab, char-inventory) pair — the loop's fixed inputs."""
    vocab = _uni_vocab(df, text_col).localCheckpoint(eager=True)
    chars = (
        _uni_candidates(vocab)
        .filter(F.col("L") == 1)
        .select("piece")
        .distinct()
        .localCheckpoint(eager=True)
    )
    return vocab, chars


def _uni_em_rounds(
    vocab: DataFrame, chars: DataFrame, rounds: int, checkpoint_seg: bool = False
):
    """THE fixed-round hard-EM loop, yielded round by round as
    (r, seg, model) — ``unigram_train`` and ``unigram_em_curve`` both
    consume this one generator, so the trainer's contract (smoothing,
    candidate bounds, checkpoint cadence) cannot drift between the model
    and its reported trajectory (round-12 review). ``checkpoint_seg`` is
    for consumers that read each round's segmentation TWICE (the curve's
    stats row + the M-step); the trainer reads it once and skips the
    extra materialization."""
    model = _uni_seed(vocab).localCheckpoint(eager=True)
    for r in range(1, rounds + 1):
        seg = unigram_viterbi_segment(vocab, model)
        if checkpoint_seg:
            seg = seg.localCheckpoint(eager=True)
        model = _uni_mstep(seg, chars).localCheckpoint(eager=True)
        yield r, seg, model


def unigram_train(
    df: DataFrame,
    rounds: int,
    keep_multi: int,
    text_col: str = "text",
) -> DataFrame:
    """Train a unigram-LM tokenizer by ``rounds`` of hard (Viterbi) EM,
    then prune to single chars + the top ``keep_multi`` multi-char pieces
    by (final count desc, piece asc).

    Returns the final model (piece, cnt, cost) — cnt is the last M-step's
    adjusted count, cost its micro-nat. Like ``bpe_learn_merges``, the
    corpus is scanned exactly once (the word-frequency rollup); each EM
    round is a handful of vocabulary-bounded Spark jobs with NO driver
    collect at all (the model stays distributed and joins the candidate
    table). Per-round localCheckpoints keep lineage flat. The prune's
    top-k is orderBy+limit — TakeOrderedAndProject, k rows per partition
    to the driver merge, never a single-partition window."""
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    if keep_multi < 1:
        raise ValueError(f"keep_multi must be >= 1, got {keep_multi}")
    vocab, chars = _uni_em_setup(df, text_col)
    model = None
    for _r, _seg, model in _uni_em_rounds(vocab, chars, rounds):
        pass
    return model.filter(F.length("piece") == 1).unionByName(
        model.filter(F.length("piece") >= 2)
        .orderBy(F.col("cnt").desc(), "piece")
        .limit(keep_multi)
    )


def unigram_em_curve(
    df: DataFrame, rounds: int, text_col: str = "text"
) -> DataFrame:
    """Per-round EM convergence curve for the unigram-LM trainer — the
    unigram twin of ``bpe_learn_merges(corpus_stats=True)``'s compression
    curve (q222): the data behind "how many EM rounds are worth running".

    One row per round r: ``corpus_cost_micro`` (the E-step objective —
    total Viterbi cost of the corpus under the PRE-round model m_{r-1},
    exact BIGINT micro-nats), ``corpus_symbols`` (corpus volume of the
    round's segmentation, Σ count·|pieces|), and ``n_pieces`` (model size
    AFTER the round's M-step — zero-usage multi-char pieces have already
    dropped, EM's implicit prune).

    Runs the SAME loop as :func:`unigram_train` (one corpus scan, then
    vocabulary-bounded rounds) with two extra 1-row aggregates per round;
    the per-round stats stay DataFrames (a union of 1-row aggregates +
    1-row broadcast attaches) — like the trainer, no driver collect
    anywhere. Empty corpus ⇒ every round row with zeros (the
    vocab_coverage degradation rule)."""
    from functools import reduce

    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    vocab, chars = _uni_em_setup(df, text_col)
    stats = []
    for r, seg, model in _uni_em_rounds(vocab, chars, rounds, checkpoint_seg=True):
        row = (
            seg.agg(
                F.coalesce(F.sum(F.col("c") * F.col("cost")), F.lit(0))
                .cast("long")
                .alias("corpus_cost_micro"),
                F.coalesce(
                    F.sum(F.col("c") * F.size(F.split("seg", " "))), F.lit(0)
                )
                .cast("long")
                .alias("corpus_symbols"),
            )
            .crossJoin(
                F.broadcast(
                    model.agg(F.count(F.lit(1)).cast("long").alias("n_pieces"))
                )
            )
            .select(
                F.lit(r).cast("int").alias("round"),
                "corpus_cost_micro",
                "corpus_symbols",
                "n_pieces",
            )
        )
        stats.append(row)
    return reduce(lambda a, b: a.unionByName(b), stats)


def bpe_learn_merges(
    df: DataFrame, rounds: int, text_col: str = "text", corpus_stats: bool = False
) -> DataFrame:
    """Learn the first ``rounds`` BPE merges from the corpus — the actual
    greedy training loop, not just round-1 statistics
    (:func:`bpe_pair_counts`).

    Exactly the classic factoring: the corpus is scanned ONCE into the
    |vocab| word-frequency table; words become space-separated symbol
    sequences (initially characters); each round (a) counts adjacent
    symbol pairs weighted by word frequency, (b) takes the top pair
    (count desc, pair asc — a total order), and (c) merges it everywhere.
    All per-round work is over the vocabulary domain — bounded by
    language, never by corpus size — so the loop costs `rounds` tiny
    Spark jobs after the one corpus-volume rollup. The top-pair pick is a
    1-row driver collect per round (bounded driver state by construction);
    the re-segmented vocab is localCheckpointed per round to keep lineage
    flat.

    Merge application is leftmost non-overlapping string replacement on
    the sentinel-wrapped symbol string, applied in THREE passes per
    round: one pass under-merges CONSECUTIVE occurrences of the winning
    pair (" a b a b " — the matches share the separator space, so a
    single pass yields `ab a b`), and later passes merge leftovers whose
    " pa pb " spelling survives. The exact contract (pass count FIXED,
    not until-fixpoint, so the oracle composes the identical
    expression; replace() semantics verified engine-identical, so the
    result is bit-reproducible everywhere):

    - NON-self pairs (pa ≠ pb): exact greedy BPE — pass 1 leaves only
      isolated " pa pb " leftovers, pass 2 merges them all; pass 3 is
      headroom.
    - SELF-pair runs of length ≤ 4 ("aaaa"): exact greedy BPE.
    - SELF-pair runs of length ≥ 5: leftover singles end up flanked by
      merged symbols and can never re-pair, so they stay — run of 5
      → `aa a aa` (greedy: `aa aa a`), run of 6 → `aa a aa a`
      (greedy: `aa aa aa`); NO pass count fixes this, it is a property
      of non-overlapping replacement. A corpus whose words carry 5+
      same-char runs (e.g. "000000") under-merges those words; both
      engines agree exactly, so determinism and cross-engine parity —
      the contract here — are unaffected.

    Returns one row per learned merge: (round, pair, pair_count,
    n_symbols) — n_symbols is the distinct symbol count across the vocab
    AFTER applying the merge (the growing symbol inventory). With
    ``corpus_stats=True`` two columns join them: ``corpus_symbols``
    (total corpus symbol occurrences, Σ count·|segmentation|, after the
    merge) and ``compression`` (corpus_symbols over the round-0
    character baseline, 4 dp) — what each merge actually buys on the
    corpus, at the cost of one extra |vocab|-sized aggregate per round.
    """
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    spark = df.sparkSession
    vocab = word_frequencies(df, text_col)
    cur = vocab.select(
        F.trim(F.regexp_replace(F.col("w"), "(.)", "$1 ")).alias("seg"), "c"
    ).localCheckpoint(eager=True)  # |vocab| rows — tiny
    base_symbols = 0
    if corpus_stats:
        # baseline = round-0 corpus symbol (character) total, computed
        # over the CHECKPOINTED seg table — NOT over the lazy vocab plan,
        # which would re-run the corpus-volume explode/rollup as a second
        # scan (actions do not share exchanges). None on an empty corpus
        # -> 0; the loop then emits no rows, so it is never divided by.
        b = cur.agg(
            F.sum(F.col("c") * F.size(F.split("seg", " "))).cast("long").alias("b")
        ).collect()[0]["b"]
        base_symbols = int(b) if b is not None else 0
    out_rows: list = []
    for r in range(1, rounds + 1):
        toks = cur.select(F.split("seg", " ").alias("t"), "c")
        pairs = toks.select(
            F.explode(
                F.when(
                    F.size("t") >= 2,
                    F.expr(
                        "transform(sequence(1, size(t) - 1),"
                        " i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))"
                    ),
                ).otherwise(F.array().cast("array<string>"))
            ).alias("pair"),
            "c",
        )
        top = (
            pairs.groupBy("pair")
            .agg(F.sum("c").cast("long").alias("pc"))
            .orderBy(F.col("pc").desc(), "pair")
            .limit(1)
            .collect()
        )
        if not top:
            break  # every word fused to a single symbol — nothing to merge
        pair, pc = top[0]["pair"], top[0]["pc"]
        merged = pair.replace(" ", "")
        seg = F.concat(F.lit(" "), F.col("seg"), F.lit(" "))
        for _ in range(_MERGE_PASSES):
            seg = F.replace(seg, F.lit(f" {pair} "), F.lit(f" {merged} "))
        cur = cur.select(F.trim(seg).alias("seg"), "c").localCheckpoint(eager=True)
        n_symbols = (
            cur.select(F.explode(F.split("seg", " ")).alias("s")).distinct().count()
        )
        if corpus_stats:
            corpus_symbols = int(
                cur.agg(
                    F.sum(F.col("c") * F.size(F.split("seg", " ")))
                    .cast("long")
                    .alias("cs")
                ).collect()[0]["cs"]
            )
            out_rows.append((r, pair, int(pc), int(n_symbols), corpus_symbols))
        else:
            out_rows.append((r, pair, int(pc), int(n_symbols)))
    schema = "round INT, pair STRING, pair_count BIGINT, n_symbols BIGINT"
    if corpus_stats:
        # compression rounds via F.round (HALF_UP — for positive values
        # identical to DuckDB's half-away round; Python's round() is
        # banker's and diverges on exact 4-dp ties like 5/32 = 0.15625)
        out = spark.createDataFrame(out_rows, schema + ", corpus_symbols BIGINT")
        return out.withColumn(
            "compression",
            F.round(F.col("corpus_symbols") / F.lit(base_symbols), 4),
        )
    return spark.createDataFrame(out_rows, schema)
