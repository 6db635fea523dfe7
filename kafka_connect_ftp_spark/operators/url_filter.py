"""URL / domain blocklist filtering — the curation step that drops
documents from known-bad hosts before any content-level gate runs (C4
applied a badwords/URL blocklist; RefinedWeb and the UT1-blacklist
pipelines filter by registered domain first because it is the cheapest
highest-precision signal in the stack).

Everything is a codegen'd column expression (the url_norm.py contract:
no UDF, no shuffle, fuses into the scan):

- :func:`url_host` — the lowercased authority host (userinfo and port
  stripped); NULL for strings with no ``scheme://authority``;
- :func:`registered_domain` — the "one label below the public suffix"
  heuristic: last two labels, or last three when the last two are a
  multi-label public suffix (``co.uk``-class, literal set below). A
  full public-suffix list is data, not code — pass ``multi_tlds`` to
  extend; the heuristic form keeps the column pure codegen;
- :func:`host_blocked` — membership of a LITERAL blocklist: exact host
  match plus (optionally) any-subdomain match (``ads.example.com``
  blocked by ``example.com``). Literal lists compile to an IN + a
  bounded endswith chain — right for curated lists up to a few hundred
  entries (each entry is one codegen'd comparison per row);
- :func:`filter_by_blocklist` — the SCALE path: a million-entry UT1
  blocklist is a FRAME, not a literal; blocked rows are removed with
  one broadcast anti-join on the registered domain (and exact host),
  so the corpus never shuffles and the list ships once per executor.

Both match semantics are the standard blocklist convention: an entry
matches itself and every subdomain, never a superdomain (blocking
``ads.example.com`` does not block ``example.com``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# multi-label public suffixes the 2-label heuristic would split wrong.
# Deliberately the short high-traffic set — the full PSL is data (pass
# multi_tlds); these cover the overwhelming share of real crawl URLs.
MULTI_LABEL_TLDS: frozenset[str] = frozenset(
    {
        "co.uk", "org.uk", "ac.uk", "gov.uk",
        "com.au", "net.au", "org.au",
        "co.jp", "ne.jp", "or.jp",
        "com.br", "com.cn", "com.mx", "com.tr", "com.ar",
        "co.in", "co.kr", "co.za", "com.sg", "com.hk", "com.tw",
    }
)

_HOST_RX = r"^[^:/?#]+://(?:[^/@?#]*@)?([^/?#:]+)"


def url_host(col: Column | str) -> Column:
    """Lowercased authority host: userinfo and port stripped, NULL when
    the string has no ``scheme://authority`` prefix (relative URLs have
    no host to block on)."""
    c = F.trim(F.col(col) if isinstance(col, str) else col)
    host = F.lower(F.regexp_extract(c, _HOST_RX, 1))
    return F.when(host == "", F.lit(None).cast("string")).otherwise(host)


def registered_domain(
    host_col: Column | str, *, multi_tlds: frozenset[str] = MULTI_LABEL_TLDS
) -> Column:
    """The registrable domain of a host column (module doc heuristic).
    A host with <= 2 labels (or an IP-looking all-digit tail) passes
    through unchanged — blocking decisions on bare TLDs or IPs belong
    to exact-host entries. NULL in -> NULL out."""
    h = F.col(host_col) if isinstance(host_col, str) else host_col
    last2 = F.regexp_extract(h, r"([^.]+\.[^.]+)$", 1)
    last3 = F.regexp_extract(h, r"([^.]+\.[^.]+\.[^.]+)$", 1)
    ip_like = h.rlike(r"^\d{1,3}(\.\d{1,3}){3}$")
    return F.when(h.isNull() | ip_like | (last2 == ""), h).otherwise(
        F.when(
            last2.isin(*sorted(multi_tlds)) & (last3 != ""), last3
        ).otherwise(last2)
    )


def host_blocked(
    host_col: Column | str,
    blocklist: tuple[str, ...] | list[str],
    *,
    include_subdomains: bool = True,
) -> Column:
    """True when the host is a blocklist entry or (by default) any
    subdomain of one. LITERAL-list form — each entry compiles to one
    comparison per row, so keep lists to curated size and use
    :func:`filter_by_blocklist` for blocklist FRAMES. NULL host ->
    false (no host, nothing to block)."""
    if not blocklist:
        raise ValueError("blocklist must be non-empty")
    entries = sorted({b.lower().rstrip(".") for b in blocklist})
    if any(not e for e in entries):
        raise ValueError("blocklist entries must be non-empty hostnames")
    h = F.col(host_col) if isinstance(host_col, str) else host_col
    hit = h.isin(*entries)
    if include_subdomains:
        for e in entries:
            hit = hit | h.endswith("." + e)
    return F.coalesce(hit, F.lit(False))


def filter_by_blocklist(
    df: DataFrame,
    blocklist: DataFrame,
    *,
    url_col: str = "url",
    entry_col: str = "domain",
    keep_blocked: bool = False,
) -> DataFrame:
    """Remove (or, with ``keep_blocked=True``, keep only) rows whose URL
    host or registered domain appears in the ``blocklist`` frame — the
    scale path for list sizes where a literal expression is wrong
    (UT1-class lists run to millions of entries).

    Matching is the FULL standard blocklist semantics: an entry blocks
    its exact host and every subdomain at any depth — the row's host is
    expanded into its dot-suffix chain (``cdn.src3.example.org`` →
    itself, ``src3.example.org``, ``example.org``) and any suffix
    hitting the entry set blocks the row. Suffixes keep >= 2 labels, so
    a bare-TLD entry can never match (blocklists don't ship those); a
    single-label host (``localhost``) matches only itself.

    Plan shape — equi-joins only (an OR/array-membership condition
    would silently degrade to a nested-loop join):
    1. DISTINCT hosts (one shuffle, bounded by distinct-host
       cardinality — short strings, ~10^7-10^8 rows at crawl scale,
       never corpus-proportional) explode into their suffix chains
       (bounded by host label depth, ~3-6);
    2. a broadcast left-semi against the (lowercased, deduped) entry
       set yields the BLOCKED host set — bounded by distinct blocked
       hosts;
    3. one broadcast equi left-join marks corpus rows; the corpus
       itself never shuffles and never multiplies.
    For entry sets too big to broadcast, pre-bucket hosts and entries
    on the registered domain (the bucket_state pattern) — the
    semantics here don't change."""
    clash = {"_ufb_host", "_ufb_hit", "_ufb_sfx", "_ufb_entry"} & set(df.columns)
    if clash:
        raise ValueError(f"df carries reserved column(s) {sorted(clash)}")
    entries = (
        blocklist.select(
            F.lower(F.trim(F.col(entry_col))).alias("_ufb_entry")
        )
        .filter(F.col("_ufb_entry") != "")
        .distinct()
    )
    probed = df.withColumn("_ufb_host", url_host(url_col))
    # all dot-suffixes with >= 2 labels, plus the host itself
    sfx = F.expr(
        "array_union(array(_ufb_host), transform("
        " sequence(1, greatest(size(split(_ufb_host, '[.]')) - 2, 0)),"
        " i -> array_join(slice(split(_ufb_host, '[.]'), i + 1, 1000), '.')))"
    )
    bad_hosts = (
        probed.select("_ufb_host")
        .filter(F.col("_ufb_host").isNotNull())
        .distinct()
        .select("_ufb_host", F.explode(sfx).alias("_ufb_sfx"))
        .join(
            F.broadcast(entries), F.col("_ufb_sfx") == F.col("_ufb_entry"), "left_semi"
        )
        .select(F.col("_ufb_host").alias("_ufb_hit"))
        .distinct()
    )
    marked = probed.join(
        F.broadcast(bad_hosts), F.col("_ufb_host") == F.col("_ufb_hit"), "left"
    )
    blocked = F.col("_ufb_hit").isNotNull()
    out = marked.filter(blocked if keep_blocked else ~blocked)
    return out.drop("_ufb_host", "_ufb_hit")
