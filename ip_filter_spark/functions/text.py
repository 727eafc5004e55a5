"""Text-analysis column expressions — the training-data-pipeline basics.

Everything here is a pure ``pyspark.sql.functions`` composition: JVM-side,
whole-stage-codegen'd, no UDFs. Each expression has an exact ANSI-SQL
twin used by the DuckDB oracle in ``__spark_entry__.py`` — keep the two
in sync when editing.
"""

from __future__ import annotations

from pyspark.sql import functions as F

MOD = 1_000_000_007

# tiny per-language stopword marker sets for the n-gram-free heuristic
LANG_MARKERS = {
    "en": ["the", "and", "of"],
    "de": ["der", "und", "die"],
    "fr": ["le", "et", "les"],
    "es": ["el", "que", "los"],
    "zh": ["de", "shi", "le"],
}


def tokens_expr(col):
    """Whitespace tokenization; empty string → empty array."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.trim(c), r"\s+"), lambda x: x != "")


def token_count_expr(col):
    return F.size(tokens_expr(col))


def quality_exprs(col) -> dict:
    """Document quality signals: length, token stats, punctuation /
    digit / whitespace ratios. All exact and oracle-checkable."""
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c)
    toks = tokens_expr(col)
    n_tok = F.size(toks)
    punct = n - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    digits = n - F.length(F.regexp_replace(c, r"[0-9]", ""))
    return {
        "n_chars_calc": n.cast("long"),
        "n_tokens": n_tok.cast("long"),
        "avg_token_len": F.round(
            F.when(n_tok > 0, (n - (n_tok - 1)) / n_tok).otherwise(F.lit(0.0)), 6
        ),
        "punct_ratio": F.round(F.when(n > 0, punct / n).otherwise(F.lit(0.0)), 6),
        "digit_ratio": F.round(F.when(n > 0, digits / n).otherwise(F.lit(0.0)), 6),
    }


def lang_id_expr(col):
    """Marker-word language heuristic: count marker hits per language,
    argmax with deterministic tie-break on language code order."""
    c = F.col(col) if isinstance(col, str) else col
    lowered = F.lower(c)
    scores = []
    for lang, markers in sorted(LANG_MARKERS.items()):
        s = None
        for m in markers:
            cnt = F.size(F.split(F.concat(F.lit(" "), lowered, F.lit(" ")), rf"\s{m}\s")) - 1
            s = cnt if s is None else (s + cnt)
        scores.append((lang, s))
    best = F.lit("unk")
    best_score = F.lit(-1)
    # iterate reversed so earlier languages win ties (strictly-greater compare)
    for lang, s in reversed(scores):
        take = s > best_score
        best = F.when(take, F.lit(lang)).otherwise(best)
        best_score = F.when(take, s).otherwise(best_score)
    return F.when(best_score > 0, best).otherwise(F.lit("unk"))


def ngrams_expr(col, n: int):
    """Token n-grams as space-joined strings; fewer than ``n`` tokens →
    empty array. Pure expression (sequence + slice inside transform, all
    whole-stage-codegen'd). DuckDB twin used by the oracles:
    ``array_to_string(arr[i:i+n-1], ' ')`` over ``range(1, len-n+2)``
    (DuckDB list slices are 1-based and end-inclusive)."""
    toks = tokens_expr(col)
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def fingerprint_expr(col):
    """Order-sensitive rolling document fingerprint.

    fp = sum over tokens of (position * (length(token) * 131 + ascii(token)))
    mod 1e9+7 — deliberately built from functions with exact DuckDB
    equivalents (list_transform with index + list_sum)."""
    toks = tokens_expr(col)
    contrib = F.transform(
        toks, lambda x, i: ((i + 1) * ((F.length(x) * 131 + F.ascii(x)) % MOD)) % MOD
    )
    return F.aggregate(contrib, F.lit(0).cast("long"), lambda acc, x: (acc + x) % MOD)


# -------------------------------------------------------------------- PII
# Patterns restricted to syntax with identical semantics in Java regex
# (Spark JVM) and RE2 (DuckDB): character classes, bounded repetition,
# non-capturing groups. No backrefs, no lookaround.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"(?:[0-9]{1,3}\.){3}[0-9]{1,3}",
}


def pii_counts_exprs(col) -> dict:
    """Per-row PII hit counts, one long column per pattern — JVM
    ``regexp_extract_all`` (codegen'd, no UDF). DuckDB twin:
    ``len(regexp_extract_all(col, pattern))``."""
    c = F.col(col) if isinstance(col, str) else col
    return {
        f"n_{name}": F.size(F.regexp_extract_all(c, F.lit(pat), F.lit(0))).cast("long")
        for name, pat in PII_PATTERNS.items()
    }


def redact_pii_expr(col):
    """Replace every PII span with ``[<NAME>]``. Spark's regexp_replace
    is global; the DuckDB twin needs the explicit ``'g'`` flag. Email
    runs first so the ipv4 pattern cannot bite a dotted-quad-looking
    fragment inside an already-redacted address."""
    c = F.col(col) if isinstance(col, str) else col
    out = c
    for name in ("email", "ipv4"):
        out = F.regexp_replace(out, PII_PATTERNS[name], f"[{name.upper()}]")
    return out


def char_entropy_expr(col):
    """Shannon entropy (bits) of the per-document character distribution
    — the classic gibberish / low-diversity quality filter — as a pure
    JVM expression, no UDF and no per-char explode:

        H = log2(N) - (1/N) * sum over distinct chars c of n_c*log2(n_c)
        n_c = len(text) - len(replace(text, c, ''))

    O(len * distinct_chars) per row, embarrassingly parallel, zero
    shuffle — the shape that survives 100 TB. DuckDB twin used by the
    oracle: its native ``entropy()`` aggregate over unnested characters
    (also log2-based). Empty/NULL text → 0.0."""
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c)
    chars = F.array_distinct(F.split(c, ""))
    contrib = F.aggregate(
        F.transform(
            chars,
            lambda ch: (n - F.length(F.replace(c, ch))).cast("double"),
        ),
        F.lit(0.0),
        lambda acc, cnt: acc + cnt * F.log2(cnt),
    )
    return F.when(n > 0, F.log2(n.cast("double")) - contrib / n).otherwise(F.lit(0.0))
