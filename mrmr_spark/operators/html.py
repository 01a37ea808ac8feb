"""HTML → text extraction: the WET-style first pass over raw crawl
payloads (what CCNet consumes pre-extracted and C4 / RefinedWeb run
trafilatura-class extractors for). A production deployment swaps in a
real DOM extractor where noted; this operator is the regex-portable
core that handles the overwhelmingly common cases — script/style/
comment removal, tag stripping, entity decoding, whitespace collapse —
as ONE pure Column projection: zero shuffles, zero Python, whole-stage
codegen at scan speed, streaming-safe. The reference engine
(kmedved/mrmr) has no text layer; this extends the `documents`-table
curation family.

Every pattern is from the REGEX-PORTABLE subset (no lookaround, no
backreferences; inline ``(?is)`` flags and lazy ``.*?`` are common to
Java regex and RE2), so the gate can verify the full chain against a
by-construction DuckDB truth: the oracle *builds* HTML around known
text and asserts the operator recovers exactly that text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Element content that must vanish wholesale, not just its tags.
# (?is): case-insensitive + dot-matches-newline; .*? lazy so adjacent
# blocks don't merge. Portable across Java regex / RE2 / PCRE.
_BLOCK_RES = (
    r"(?is)<script\b[^>]*>.*?</script>",
    r"(?is)<style\b[^>]*>.*?</style>",
    r"(?s)<!--.*?-->",
)
_TAG_RE = r"(?s)<[^>]*>"
_WS_RE = r"[ \t\r\n]+"

# Minimal entity set (the ones that appear in running text); a real
# extractor decodes the full table — same expression shape, bigger map.
_ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),  # LAST, so '&amp;lt;' decodes to '&lt;' not '<'
)


def html_to_text(col: str | Column) -> Column:
    """The extraction chain as a reusable Column expression: drop
    script/style/comment blocks, replace remaining tags with a space
    (so ``</p><p>`` never glues words), decode the common entities
    (``&amp;`` last), collapse ASCII whitespace runs, trim."""
    c = F.col(col) if isinstance(col, str) else col
    for pat in _BLOCK_RES:
        c = F.regexp_replace(c, pat, " ")
    c = F.regexp_replace(c, _TAG_RE, " ")
    for ent, ch in _ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(c, _WS_RE, " "))


def strip_html(
    df: DataFrame,
    html_col: str = "text",
    out_col: str | None = None,
) -> DataFrame:
    """Replace ``html_col`` with its extracted text (or write to
    ``out_col`` if given, keeping the raw payload). Pure projection —
    composes with the rest of the curation pipeline at scan speed."""
    out = out_col or html_col
    return df.withColumn(out, html_to_text(html_col))
