"""Text-analysis operators (extension X4): language ID, quality scoring,
token counting, document fingerprinting.

All pure built-in-function column expressions — map-only, no shuffle, no
Python UDFs: at 100 TB these run at parquet-scan speed inside whole-stage
codegen. Each returns a DataFrame transformation suitable for a pipeline
stage or a standalone query.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from universal_aws_data_pipeline_spark.functions.texthash import md5_fingerprint, normalize_text, tokens_col

# Tiny per-language marker lexicons for the n-gram/stopword heuristic.
# Deliberately deterministic + transparent (no model download): a real
# deployment would swap in fastText/CLD3 behind the same column contract.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is"),
    "de": ("der", "die", "das", "und", "ist"),
    "es": ("el", "la", "de", "y", "es"),
    "fr": ("le", "la", "des", "et", "est"),
}


def token_count(text: Column) -> Column:
    """Whitespace token count over raw text (BIGINT)."""
    return F.size(F.split(F.trim(text), r"\s+")).cast("long")


def bpe_token_count(text: Column) -> Column:
    """BPE-ish subword proxy count: alphabetic runs + digit runs + individual
    punctuation marks, mirroring how byte-pair tokenizers split mixed text.
    A cheap JVM-side estimator for token budgeting over a corpus (the real
    tokenizer runs at training time; this is the pipeline-side accounting)."""
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), 0)).cast("long")


def char_classes(text: Column) -> dict[str, Column]:
    """Character-class tallies used by quality scoring."""
    stripped_alpha = F.regexp_replace(text, "[A-Za-z]", "")
    stripped_digit = F.regexp_replace(text, "[0-9]", "")
    stripped_punct = F.regexp_replace(text, r"[\.,;:!\?]", "")
    stripped_space = F.regexp_replace(text, r"\s", "")
    n = F.length(text).cast("double")
    return {
        "n_chars": F.length(text).cast("long"),
        "alpha_ratio": (n - F.length(stripped_alpha)) / n,
        "digit_ratio": (n - F.length(stripped_digit)) / n,
        "punct_ratio": (n - F.length(stripped_punct)) / n,
        "space_ratio": (n - F.length(stripped_space)) / n,
    }


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: rewards alphabetic prose with sane
    token lengths, penalizes digit/punct soup. Deterministic + SQL-portable."""
    c = char_classes(text)
    ntok = token_count(text)
    mean_tok_len = F.length(F.regexp_replace(text, r"\s", "")).cast("double") / ntok.cast("double")
    # clamp each component to [0,1] then average
    len_component = F.least(F.lit(1.0), ntok.cast("double") / F.lit(100.0))
    alpha_component = c["alpha_ratio"]
    clean_component = F.lit(1.0) - F.least(F.lit(1.0), c["digit_ratio"] + c["punct_ratio"])
    toklen_component = F.when((mean_tok_len >= 3.0) & (mean_tok_len <= 10.0), 1.0).otherwise(0.5)
    return F.round((len_component + alpha_component + clean_component + toklen_component) / 4.0, 4)


def lang_id(text: Column) -> Column:
    """Marker-word language guess: language with the most stopword hits among
    normalized tokens; 'und' (undetermined) when nothing matches.

    Expressed as array intersections (no explode ⇒ no shuffle). Hit counting
    uses non-distinct token matches via filter() so repeated markers count.
    """
    toks = tokens_col(text)
    scores: list[tuple[str, Column]] = []
    for lang, markers in LANG_MARKERS.items():
        marker_arr = F.array(*[F.lit(m) for m in markers])
        scores.append((lang, F.size(F.filter(toks, lambda t: F.array_contains(marker_arr, t)))))
    # argmax with deterministic tie-break on language code order
    best_lang = F.lit("und")
    best_score = F.lit(0)
    for lang, score in sorted(scores, key=lambda kv: kv[0], reverse=True):
        best_lang = F.when(score >= F.greatest(best_score, F.lit(1)), F.lit(lang)).otherwise(best_lang)
        best_score = F.greatest(best_score, score)
    return best_lang


def profile_documents(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Full text-analysis profile: one row per document with token stats,
    quality score, language guess, and content fingerprint."""
    t = F.col(text_col)
    c = char_classes(t)
    return df.select(
        F.col(id_col),
        token_count(t).alias("n_tokens"),
        c["n_chars"].alias("n_chars"),
        F.round(c["alpha_ratio"], 4).alias("alpha_ratio"),
        F.round(c["punct_ratio"], 4).alias("punct_ratio"),
        quality_score(t).alias("quality"),
        lang_id(t).alias("lang_guess"),
        md5_fingerprint(t).alias("fingerprint"),
    )


# PII patterns kept to the Java-regex ∩ RE2 common subset so the same
# expressions run verbatim in Spark and in SQL engines (\b, character
# classes, bounded repetition — no lookarounds).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("phone", r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b", "[PHONE]"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "[SSN]"),
]


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-category PII match counts (pre-redaction). Counted on the raw
    text, with earlier categories masked out first so e.g. the digits of an
    email's domain can't double-count as a phone — the counting order
    matches the replacement order in redact_pii."""
    out: dict[str, Column] = {}
    masked = text
    for name, pat, repl in PII_PATTERNS:
        out[name] = F.regexp_count(masked, F.lit(pat))
        masked = F.regexp_replace(masked, pat, repl)
    return out


def redact_pii(text: Column) -> Column:
    """Replace emails / phone numbers / SSNs with typed mask tokens.
    Pure chained regexp_replace — JVM-side, map-only, codegen-friendly;
    runs at scan speed over a 100 TB corpus (no UDF, no shuffle)."""
    out = text
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out
