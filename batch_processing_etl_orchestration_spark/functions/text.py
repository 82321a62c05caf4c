"""Text-analysis expression library (SURVEY §2.10 text operators).

Reusable Column builders behind the registered text queries — the API
surface a corpus pipeline composes: token counts, lexical diversity,
quality flags, stopword votes, char-n-gram profiles, fingerprints.
Everything is a JVM-side expression (codegen'd); nothing touches
Python per row.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def ws_tokens(col: Column | str) -> Column:
    """Whitespace tokens (single-space corpus convention)."""
    return F.split(_c(col), " ")


def ws_token_count(col: Column | str) -> Column:
    return F.size(ws_tokens(col))


REGEX_TOKEN_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def regex_token_count(col: Column | str) -> Column:
    """BPE-ish token count: letter runs | digit runs | single other
    glyph, over lowercased text. Pattern uses only constructs with
    identical Java-regex/RE2 semantics."""
    return F.size(F.regexp_extract_all(F.lower(_c(col)), F.lit(REGEX_TOKEN_PATTERN), 0))


def uniq_token_ratio(col: Column | str) -> Column:
    """Type-token ratio — lexical diversity."""
    toks = ws_tokens(col)
    return F.size(F.array_distinct(toks)).cast("double") / F.size(toks).cast("double")


def quality_score(
    col: Column | str,
    min_chars: int = 100,
    max_chars: int = 450,
    min_tokens: int = 20,
    min_uniq_ratio: float = 0.15,
) -> Column:
    """Integer quality score 0-3: length band + token floor + lexical
    diversity floor. Exact integer arithmetic in any engine."""
    c = _c(col)
    return (
        F.when(F.length(c).between(min_chars, max_chars), 1).otherwise(0)
        + F.when(ws_token_count(c) >= min_tokens, 1).otherwise(0)
        + F.when(uniq_token_ratio(c) >= min_uniq_ratio, 1).otherwise(0)
    )


def stopword_hits(col: Column | str, stopwords: list[str]) -> Column:
    """Count of tokens (with multiplicity) that are in the stopword
    list — the per-language vote of the stopword language-ID."""
    lits = ", ".join(f"'{w}'" for w in stopwords)
    src = _c(col)._jc.toString() if not isinstance(col, str) else col
    return F.expr(
        f"size(filter(split(lower({src}), ' '), w -> array_contains(array({lits}), w)))"
    )


def char_bigrams(col: Column | str) -> Column:
    """All character bigrams of the lowercased text, in order (with
    multiplicity): transform over a position sequence — no UDF."""
    src = _c(col)._jc.toString() if not isinstance(col, str) else col
    return F.expr(
        f"transform(sequence(1, length({src}) - 1), i -> substring(lower({src}), i, 2))"
    )


def char_bigram_hits(col: Column | str, profile: list[str]) -> Column:
    """Occurrences of profile bigrams in the text — the per-language
    vote of the char-n-gram language-ID."""
    lits = ", ".join("'" + b.replace("'", "''") + "'" for b in profile)
    src = _c(col)._jc.toString() if not isinstance(col, str) else col
    return F.expr(
        f"size(filter(transform(sequence(1, length({src}) - 1), "
        f"i -> substring(lower({src}), i, 2)), b -> array_contains(array({lits}), b)))"
    )


def argmax_label(scores: dict[str, Column | str], default: str = "und") -> Column:
    """CASE-chain argmax over named score columns; earlier keys win
    ties (deterministic, mirrors a SQL CASE chain exactly)."""
    names = list(scores)
    pred = F.lit(default)
    for name in reversed(names):
        others = [o for o in names if o != name]
        cond = None
        for o in others:
            c = _c(scores[name]) >= _c(scores[o])
            cond = c if cond is None else (cond & c)
        pred = F.when(cond if cond is not None else F.lit(True), F.lit(name)).otherwise(pred)
    return pred


def normalized_fingerprint(text_col: Column | str, *salt_cols: Column | str) -> Column:
    """md5 of (salt:…:)lowercased text — exact content identity."""
    parts: list[Column] = [_c(s) for s in salt_cols] + [F.lower(_c(text_col))]
    sep = F.lit(":")
    combined = parts[0]
    for p in parts[1:]:
        combined = F.concat(combined, sep, p)
    return F.md5(combined)


# PII scrubbing — the regexes stay inside the Java/RE2 common subset so
# the DuckDB oracle applies the IDENTICAL patterns (no lookaround, no
# possessive quantifiers, no \b differences in scope here).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\d{3}-\d{3}-\d{4}"


def redact_pii(col: Column | str) -> Column:
    """Text with emails → [EMAIL] and phone numbers → [PHONE] — the
    scrub every training corpus runs before anything else sees the
    bytes. Pure JVM-side regexp_replace (codegen, no UDF)."""
    emails_gone = F.regexp_replace(_c(col), EMAIL_RE, "[EMAIL]")
    return F.regexp_replace(emails_gone, PHONE_RE, "[PHONE]")


def pii_counts(col: Column | str) -> tuple[Column, Column]:
    """(n_emails, n_phones) found in the text."""
    return (
        F.size(F.regexp_extract_all(_c(col), F.lit(EMAIL_RE), F.lit(0))),
        F.size(F.regexp_extract_all(_c(col), F.lit(PHONE_RE), F.lit(0))),
    )
