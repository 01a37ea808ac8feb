"""PII redaction for LLM training corpora: scrub emails, IP addresses,
phone numbers, SSNs and long hex secrets from document text before it
reaches a training mix (the standard pre-training hygiene pass, cf. the
BigCode/StarCoder PII pipeline and C4's blocklist filtering — here the
regex tier, which is the part that runs at 100 TB; ML-based NER tiers
sit behind the same interface as a mapInPandas stage if ever needed).

No reference counterpart (the reference repo is selection-only); this
extends the textstats/curation family with the same design rules:

- Pure codegen Column expressions end to end: per-kind match counts via
  ``regexp_count`` and redaction via chained ``regexp_replace`` — zero
  shuffle, zero Python, one projection over the corpus scan.
- Patterns are written in the engine-portable common subset of Java
  regex and RE2 (no backreferences, no lookaround), so the DuckDB gate
  oracle (`pii_redact`) runs the character-identical pattern strings.
- Redaction is ORDERED and counts are INDEPENDENT: counts are measured
  per kind on the original text (overlapping kinds each count their own
  matches), while replacements apply in ``kinds`` order, each on the
  previous kind's output — deterministic, and reproducible in ANSI SQL
  by literal nesting.

Scale: a projection fuses into whatever scan feeds it (one
WholeStageCodegen span, no exchange); at 10^12 documents the cost is
the regex engine alone, embarrassingly parallel per partition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Ordered engine-portable patterns (Java regex ∩ RE2). Deliberately
#: recall-leaning where precision is cheap to give away (an
#: over-redacted all-digit token costs a training corpus nothing; a
#: leaked phone number is not recoverable):
#:
#: - ``email``: practical RFC-lite mailbox@domain.tld.
#: - ``ipv4``: four dotted 1-3 digit octets (no 0-255 range check —
#:   version strings like 1.2.3.4 redact too; documented tradeoff).
#: - ``phone``: NANP-style 3-3-4 groups with ``-``/``.``/space
#:   separators, optional +CC/(area) decoration.
#: - ``ssn``: the 3-2-4 dashed form.
#: - ``hex_secret``: 32+ contiguous hex chars (MD5/SHA/API tokens).
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"(\+\d{1,3}[-. ])?(\(\d{3}\)[-. ]?|\d{3}[-. ])\d{3}[-. ]\d{4}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "hex_secret": r"\b[0-9a-fA-F]{32,}\b",
}

DEFAULT_KINDS = tuple(PII_PATTERNS)


def pii_counts(
    text_col: str | Column = "text", kinds: tuple[str, ...] = DEFAULT_KINDS
) -> list[Column]:
    """Per-kind match-count Columns (``n_<kind>``), measured on the
    text as given — independent per kind, so a token matched by two
    kinds contributes to both counts."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    return [
        F.regexp_count(col, F.lit(PII_PATTERNS[k])).alias(f"n_{k}") for k in kinds
    ]


def redact_text(
    text_col: str | Column = "text",
    kinds: tuple[str, ...] = DEFAULT_KINDS,
    replacement: str = "[{KIND}]",
) -> Column:
    """The redacted-text Column: ``replacement`` (``{KIND}`` expands to
    the upper-cased kind name) substituted for every match, kinds
    applied in order, each on the previous kind's output."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    for k in kinds:
        col = F.regexp_replace(
            col, PII_PATTERNS[k], replacement.replace("{KIND}", k.upper())
        )
    return col


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    kinds: tuple[str, ...] = DEFAULT_KINDS,
    replacement: str = "[{KIND}]",
    with_counts: bool = True,
    out_col: str | None = None,
) -> DataFrame:
    """Redact PII from ``text_col`` in one zero-shuffle projection.

    Replaces ``text_col`` in place (or writes ``out_col`` when given,
    keeping the original) and, with ``with_counts``, appends one
    ``n_<kind>`` int column per kind measured on the ORIGINAL text —
    the audit trail a compliance pass wants (total leakage found, not
    just scrubbed output). Unknown kind names raise.

    The streaming story is free: a stateless projection runs on a
    readStream frame unchanged (same contract as the textstats family).
    """
    unknown = [k for k in kinds if k not in PII_PATTERNS]
    if unknown:
        raise ValueError(
            f"unknown PII kinds {unknown}; known: {sorted(PII_PATTERNS)}"
        )
    if not kinds:
        raise ValueError("kinds must be non-empty")
    cols: list[Column] = [
        F.col(c) if c != text_col or out_col is not None else
        redact_text(text_col, kinds, replacement).alias(text_col)
        for c in df.columns
    ]
    if out_col is not None:
        cols.append(redact_text(text_col, kinds, replacement).alias(out_col))
    if with_counts:
        cols.extend(pii_counts(text_col, kinds))
    return df.select(*cols)
