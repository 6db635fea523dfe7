"""URL normalization: the canonical-form step URL-level dedup keys on
(C4 deduplicated at URL granularity; RefinedWeb/CCNet normalize URLs
before any content fetch or dedup decision — otherwise the same page
re-enters the corpus under trivially-different spellings).

``normalize_url`` is a pure codegen ``regexp_replace`` chain (no UDF,
no shuffle — the html_text.py design contract), applying, in order:

1. drop the fragment (``#...`` — never sent to the server);
2. lowercase the scheme and authority (host names are
   case-insensitive; path/query case is PRESERVED — it is significant);
3. strip userinfo (``user:pw@`` — credentials are not identity, and
   carrying them into a dedup key would leak them into state tables);
4. strip default ports (``http://…:80``, ``https://…:443``);
5. remove tracking parameters (``utm_*``, ``fbclid``, ``gclid``,
   ``ref_src``) wherever they appear in the query, tidying separators;
6. an empty path becomes ``/`` (``http://h`` and ``http://h/`` are the
   same resource per RFC 3986 §6.2.3).

Deliberately NOT done: path case-folding, trailing-slash collapse on
non-empty paths, query-param reordering — each conflates URLs that can
be genuinely different resources. A string without a
``scheme://authority`` prefix passes through with only the fragment /
tracking cleanup (relative URLs have no authority to normalize).

``dedup_by_url`` composes it with the standard first-arrival decision:
one representative per normalized URL (min tie-break key — deterministic,
not "first seen", which is partition-layout-dependent).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TRACKING = "(utm_[^=&]*|fbclid|gclid|ref_src)"


def normalize_url(col: Column | str) -> Column:
    """The normalization chain (module doc). NULL in → NULL out."""
    # regexp strip, not F.trim: trim() removes only the space character,
    # and crawl data pads URLs with tabs/newlines too
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, r"^\s+|\s+$", "")
    c = F.regexp_replace(c, r"#.*$", "")  # 1: fragment
    prefix = F.lower(F.regexp_extract(c, r"^([^:/?#]+://[^/?#]*)", 1))
    rest = F.regexp_replace(c, r"^[^:/?#]+://[^/?#]*", "")
    prefix = F.regexp_replace(prefix, r"^([a-z0-9+.-]+://)[^/@]*@", "$1")  # 3
    # 4: the host alternative admits bracketed IPv6 literals, whose
    # colons are address bytes — a plain [^:]* can never reach the port
    # and http://[2001:db8::1]:80/ would keep its default port
    prefix = F.regexp_replace(prefix, r"^(http://(?:\[[^\]]*\]|[^:]*)):80$", "$1")
    prefix = F.regexp_replace(prefix, r"^(https://(?:\[[^\]]*\]|[^:]*)):443$", "$1")
    # 5: tracking params — applied to the QUERY alone (a literal
    # '&utm_x=' inside the PATH is part of the resource name; running
    # the '&p=v' removal over path+query would delete from there to the
    # next '&', collapsing distinct URLs): split at the first '?', scrub
    # the query — non-first (&p=v), first-with-successor (?p=v& -> ?),
    # then a lone ?p=v — and recombine
    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    query = F.regexp_replace(rest, r"^[^?]*", "")
    query = F.regexp_replace(query, rf"&{_TRACKING}=[^&]*", "")
    query = F.regexp_replace(query, rf"\?{_TRACKING}=[^&]*&", "?")
    query = F.regexp_replace(query, rf"\?{_TRACKING}=[^&]*$", "")
    rest = F.concat(path, query)
    # 6: empty path (authority followed by nothing or directly by a
    # query) -> '/'; only meaningful when an authority was found
    rest = F.when(
        (prefix != "") & ((rest == "") | rest.startswith("?")),
        F.concat(F.lit("/"), rest),
    ).otherwise(rest)
    return F.concat(prefix, rest)


def dedup_by_url(
    df: DataFrame,
    *,
    url_col: str = "url",
    tie_col: str = "doc_id",
) -> DataFrame:
    """One representative row per ``normalize_url(url_col)`` — the
    URL-grain dedup pass (C4's granularity). The keeper is the min
    ``tie_col`` row (a crawl would pass its fetch timestamp to keep the
    earliest capture); EQUAL ties — two captures in the same tick —
    fall through to the full-row lexicographic order, so the decision
    is deterministic across partitionings even under tie collisions
    (the replay-safety bar every keeper decision in this repo meets).
    Adds ``url_norm``; the min-struct aggregate shuffles one (key, tie,
    payload-ref) row per input row and keeps text out of wide state the
    same way span_dedup's decision aggregate does."""
    w_cols = [c for c in df.columns]
    keyed = df.withColumn("url_norm", normalize_url(url_col))
    keeper = keyed.groupBy("url_norm").agg(
        F.min_by(
            F.struct(*w_cols),
            # struct ordering is lexicographic: tie_col first, then the
            # remaining columns as a total-order tiebreak
            F.struct(F.col(tie_col), *[F.col(c) for c in w_cols if c != tie_col]),
        ).alias("_row")
    )
    return keeper.select("url_norm", "_row.*")
