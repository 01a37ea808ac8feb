"""URL / domain operators for web-corpus curation: parse URLs into
typed parts, roll up per-domain statistics, and apply domain
block/allow lists.

The standard first pass over a crawled corpus (C4 and RefinedWeb both
filter on a URL blocklist before any text heuristic runs; Penedo et al.
2023 §3.1) — the reference engine (kmedved/mrmr) has no web layer, so
these have no reference counterpart; they extend the `documents`-table
curation family.

Everything here is built from the REGEX-PORTABLE subset (no lookaround,
no backreferences — Java regex ∩ RE2 ∩ PCRE agree on these patterns),
so an ANSI/DuckDB oracle evaluating the character-identical pattern
strings reproduces the results bit-for-bit; both engines return '' on
no-match.

Scale design (100 TB):

- :func:`url_parts` is a PURE Column projection — zero shuffles, zero
  Python, whole-stage codegen at scan speed.
- :func:`filter_by_domains` with a literal list compiles to an
  ``IN``-filter Catalyst pushes into the scan; with a DataFrame list it
  is a broadcast semi/anti join (the list side is always the small one).
- :func:`domain_stats` is one key-partitioned aggregate with map-side
  partial combine; domain key skew (half the web is a handful of hosts)
  is exactly the shape AQE's skew handling and the two-stage salted agg
  in `operators/skew.py` exist for — at the default it relies on partial
  aggregation, which already collapses each task's rows to one row per
  domain before the exchange.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Pattern strings shared verbatim with the SQL oracle (gate `url_parts`).
# Scheme and authority are case-insensitive per RFC 3986 (matched both
# cases, lowercased after extraction); the path keeps its case.
SCHEME_RE = "^([a-zA-Z][a-zA-Z0-9+.-]*)://"
HOST_RE = "^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@]*@)?([^/?#]+)"
PATH_RE = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)"

# Minimal common-suffix list for registered-domain extraction: the
# frequent two-label public suffixes. A production deployment swaps in
# the full Public Suffix List (publicsuffix.org) — same expression shape,
# bigger literal set; kept small here so the gate oracle can restate it
# as a plain IN list.
COMMON_TWO_LABEL_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.br", "com.cn", "com.mx", "co.in", "co.kr", "co.za",
)


def url_parts(
    df: DataFrame,
    url_col: str = "url",
    suffixes: tuple[str, ...] = COMMON_TWO_LABEL_SUFFIXES,
) -> DataFrame:
    """Add ``scheme, host, path, registered_domain, tld`` parsed from
    ``url_col``. Unparseable URLs yield '' parts (never NULL), so
    downstream filters stay total functions.

    ``host`` is lowercased with any userinfo and port stripped;
    ``registered_domain`` is the last two host labels — three when the
    last two are a known two-label public suffix (``suffixes``); a
    dotless host (``localhost``) is its own registered domain.
    """
    url = F.col(url_col)
    raw_host = F.lower(F.regexp_extract(url, HOST_RE, 1))
    host = F.split(raw_host, ":").getItem(0)
    labels = F.split(host, "\\.")
    n = F.size(labels)
    last2 = F.concat_ws(".", F.element_at(labels, -2), F.element_at(labels, -1))
    last3 = F.concat_ws(
        ".", F.element_at(labels, -3), F.element_at(labels, -2), F.element_at(labels, -1)
    )
    reg = (
        F.when(n <= 1, host)
        .when((n >= 3) & last2.isin(*suffixes), last3)
        .otherwise(last2)
    )
    return df.select(
        "*",
        F.lower(F.regexp_extract(url, SCHEME_RE, 1)).alias("scheme"),
        host.alias("host"),
        F.regexp_extract(url, PATH_RE, 1).alias("path"),
        F.when(host == "", F.lit("")).otherwise(reg).alias("registered_domain"),
        F.when(host == "", F.lit(""))
        .otherwise(F.element_at(labels, -1))
        .alias("tld"),
    )


def filter_by_domains(
    df: DataFrame,
    domains,
    domain_col: str = "registered_domain",
    mode: str = "block",
) -> DataFrame:
    """Drop (``mode="block"``) or keep only (``mode="allow"``) rows whose
    ``domain_col`` is in ``domains``.

    ``domains`` may be a Python sequence (compiles to an IN filter the
    scan can evaluate — use for lists that fit in the plan, up to ~10k)
    or a one-column DataFrame (broadcast left-anti / left-semi join —
    use for the multi-million-entry blocklists real crawls carry; the
    list side is broadcast, the corpus is never shuffled).
    """
    if mode not in ("block", "allow"):
        raise ValueError(f"Unknown mode: {mode!r}")
    if isinstance(domains, DataFrame):
        if len(domains.columns) != 1:
            raise ValueError("domains DataFrame must have exactly one column")
        right = F.broadcast(
            domains.toDF("_dom").select(F.col("_dom").cast("string"))
        )
        how = "leftanti" if mode == "block" else "leftsemi"
        return df.join(right, df[domain_col] == right["_dom"], how)
    domains = list(domains)
    if not domains:
        raise ValueError("domains must be non-empty")
    cond = F.col(domain_col).isin(*domains)
    return df.where(~cond if mode == "block" else cond)


def domain_stats(
    df: DataFrame,
    domain_col: str = "registered_domain",
    text_col: str = "text",
    split: str = " ",
) -> DataFrame:
    """Per-domain corpus statistics: document count, token and char
    totals, mean tokens per document — the frame a mixture recipe or a
    per-domain cap (RefinedWeb caps any single domain's share) is
    computed from. One map-side-combined aggregate; output is ∝ distinct
    domains, not corpus.

    To ENFORCE a per-domain cap, compose with the existing exact
    sampler — ``stratified_sample_exact(df, domain_col, cap)`` keeps
    min(cap, size) documents per domain in seed-free hash order — or
    with ``mix_to_token_budget`` for token-denominated caps.
    """
    import re as _re

    n_tok = F.size(F.split(F.col(text_col), _re.escape(split))).cast("bigint")
    return (
        df.groupBy(domain_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(n_tok).cast("bigint").alias("n_tokens"),
            F.sum(F.length(text_col)).cast("bigint").alias("n_chars"),
            (F.sum(n_tok) / F.count(F.lit(1))).alias("mean_tokens"),
        )
    )


# Tracking parameters stripped by normalize_url's defaults: the common
# click/campaign identifiers (any utm_* plus these names).
DEFAULT_DROP_PARAMS = ("gclid", "fbclid", "msclkid", "mc_eid", "ref")
DEFAULT_DROP_PARAM_PREFIXES = ("utm_",)


def normalize_url(
    df: DataFrame,
    url_col: str = "url",
    out_col: str = "url_norm",
    drop_params: tuple[str, ...] = DEFAULT_DROP_PARAMS,
    drop_param_prefixes: tuple[str, ...] = DEFAULT_DROP_PARAM_PREFIXES,
    strip_fragment: bool = True,
    strip_www: bool = False,
) -> DataFrame:
    """Append ``out_col`` = the canonical form of ``url_col`` — the
    standard pass BEFORE URL-level exact dedup (the same page arrives
    from a crawl under dozens of tracking-param/fragment variants):

    - fragment stripped (``#...``; off via ``strip_fragment=False``),
    - scheme+authority lowercased (path and query keep their case),
    - the scheme's default port dropped (``:80`` for http, ``:443``
      for https),
    - tracking query parameters removed — any name in ``drop_params``
      or starting with a ``drop_param_prefixes`` entry — with ``?``
      itself dropped when nothing survives; parameter ORDER among the
      survivors is preserved (full param sorting is deliberately not
      done: it changes semantics on duplicate keys),
    - optional ``strip_www``: a leading ``www.`` label dropped from the
      host (off by default; documented no-op when userinfo precedes the
      host).

    URLs that don't parse (no scheme) pass through unchanged. Pure
    Column expression — zero shuffles, zero Python, streaming-safe;
    compose as ``dedup_documents`` / ``exact_dedup`` keyed on
    ``url_norm`` for crawl-level URL dedup.
    """
    url = F.col(url_col)
    # Always normalize the pre-fragment part; with strip_fragment=False the
    # fragment is held aside (original case) and re-appended at the end —
    # folding it into the prefix/path arithmetic would lowercase it.
    base = F.split(url, "#").getItem(0)
    frag = (
        F.lit("")
        if strip_fragment
        else F.when(
            url.contains("#"),
            F.concat(F.lit("#"), F.substring(url, F.length(base) + 2, F.length(url))),
        ).otherwise(F.lit(""))
    )
    pre_q = F.split(base, "\\?").getItem(0)
    has_q = base.contains("?")
    q = F.when(
        has_q, F.substring(base, F.length(pre_q) + 2, F.length(base))
    ).otherwise(F.lit(""))

    scheme = F.lower(F.regexp_extract(base, SCHEME_RE, 1))
    path = F.regexp_extract(base, PATH_RE, 1)
    prefix = F.substring(pre_q, 1, (F.length(pre_q) - F.length(path)).cast("int"))
    prefix = F.lower(prefix)
    prefix = (
        F.when(scheme == "http", F.regexp_replace(prefix, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(prefix, ":443$", ""))
        .otherwise(prefix)
    )
    if strip_www:
        prefix = F.regexp_replace(prefix, "://www\\.", "://")

    def _keep_param(p: Column) -> Column:
        name = F.split(p, "=").getItem(0)
        cond = ~name.isin(*drop_params) if drop_params else F.lit(True)
        for pref in drop_param_prefixes:
            cond = cond & ~name.startswith(pref)
        return cond

    kept_q = F.array_join(F.filter(F.split(q, "&"), _keep_param), "&")
    norm = F.concat(
        prefix,
        path,
        F.when(has_q & (kept_q != ""), F.concat(F.lit("?"), kept_q)).otherwise(
            F.lit("")
        ),
        frag,
    )
    return df.select(
        "*", F.when(scheme == "", url).otherwise(norm).alias(out_col)
    )
