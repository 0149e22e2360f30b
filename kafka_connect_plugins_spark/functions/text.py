"""Text-analysis column expressions for training-data pipelines.

All pure native Columns (JVM-side, whole-stage-codegen'd) — the hot path
never enters Python. Hashes are built from ``sha2`` so an independent ANSI
SQL oracle (DuckDB) can reproduce every value bit-for-bit; Spark-only
hashes (xxhash64) are reserved for partitioning, where only distribution
matters (SURVEY.md §4).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 60-bit hash space: 15 hex chars parse positive into a signed 64-bit long in
# both Spark (conv) and DuckDB ('0x…'::BIGINT) — no sign-wrap disagreement.
HASH_BITS = 60
# Largest prime < 2^53: acc * 31 + 127 stays well inside a signed 64-bit long
# in Spark AND DuckDB, so the fold never overflows in either engine.
FINGERPRINT_MOD = 9007199254740881

# BPE-ish token pattern (GPT-2-style pre-tokenizer, simplified): letter runs,
# single digits, or single non-alphanumeric marks.
BPE_ISH_PATTERN = "[a-zA-Z]+|[0-9]|[^a-zA-Z0-9 ]"


def ws_tokens(text: Column) -> Column:
    """Whitespace tokens."""
    return F.split(F.trim(text), r"\s+")


def bpe_ish_tokens(text: Column) -> Column:
    """BPE-style pre-tokenization via regex (letters / digits / marks)."""
    return F.regexp_extract_all(text, F.lit(BPE_ISH_PATTERN), 0)


def shingles(text: Column, k: int = 5) -> Column:
    """All k-char shingles of the string (>= 1 even for short strings)."""
    idx = F.sequence(F.lit(1), F.greatest(F.length(text) - (k - 1), F.lit(1)))
    return F.transform(idx, lambda i: F.substring(text, i, F.lit(k)))


def stable_hash60(s: Column) -> Column:
    """sha256-derived 60-bit non-negative hash — identical in Spark and DuckDB."""
    return F.conv(F.substring(F.sha2(s, 256), 1, 15), 16, 10).cast("long")


def hash_array60(arr: Column) -> Column:
    """Element-wise :func:`stable_hash60` over a string array."""
    return F.transform(arr, lambda s: F.conv(F.substring(F.sha2(s, 256), 1, 15), 16, 10).cast("long"))


def rolling_fingerprint(text: Column, base: int = 31, mod: int = FINGERPRINT_MOD) -> Column:
    """Polynomial rolling hash (Rabin–Karp) over the characters.

    ``h = (h * base + code(c)) mod m`` folded left over the string — the
    classic document-fingerprinting primitive. Native ``aggregate`` over the
    char array; DuckDB mirrors it with ``list_reduce``.
    """
    chars = F.split(text, "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: F.pmod(acc * base + F.ascii(c), F.lit(mod)),
    )


def quality_features(text: Column) -> dict[str, Column]:
    """Heuristic quality-scoring features (Gopher/C4-style cheap filters)."""
    toks = ws_tokens(text)
    n = F.size(toks).cast("long")
    n_uniq = F.size(F.array_distinct(toks)).cast("long")
    n_chars = F.length(text).cast("long")
    alpha = F.length(F.regexp_replace(text, "[^a-zA-Z]", "")).cast("long")
    punct = F.length(F.regexp_replace(text, "[^.,;:!?]", "")).cast("long")
    return {
        "n_tokens": n,
        "n_unique_tokens": n_uniq,
        "n_chars": n_chars,
        "alpha_ratio": F.round(alpha / F.greatest(n_chars, F.lit(1)), 4),
        "punct_ratio": F.round(punct / F.greatest(n_chars, F.lit(1)), 4),
        "uniq_ratio": F.round(n_uniq / F.greatest(n, F.lit(1)).cast("double"), 4),
        "mean_token_len": F.round(
            (n_chars - n + 1) / F.greatest(n, F.lit(1)).cast("double"), 4
        ),
    }
