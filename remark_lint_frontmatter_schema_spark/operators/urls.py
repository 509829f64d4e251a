"""URL canonicalization + canonical-URL dedup.

Web-crawl corpora carry the same page under many spellings — scheme/host
case, default ports, fragments, tracking parameters, param order,
trailing slashes. Exact text dedup misses all of them; canonicalizing
the URL first is the standard cheap pass BEFORE content dedup (it needs
no shingling and no pair join — one projection plus the exact-dedup
groupBy).

Everything here is a pure JVM Column expression (regexp + higher-order
array functions) — no UDFs, fully pushdown/codegen friendly. The rules
(lowercase scheme+host, drop fragment, drop default port, drop tracking
params, sort remaining params, strip trailing slash) follow the
conservative subset of RFC 3986 §6 normalization plus the de-facto
tracking-param strip; anything unparseable (no ``scheme://``) passes
through trimmed, untouched — a canonicalizer must never corrupt what it
does not understand.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# parameters that never identify content (analytics click-tracking)
TRACKING_PARAM_RE = r"^(utm_[^=]*|fbclid|gclid|msclkid|mc_eid|ref_src)(=.*)?$"
_SCHEME_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://"


def canonical_url(col) -> Column:
    """The canonical spelling of a URL column (see module docstring for
    the rule set). NULL in -> NULL out; non-URL strings pass through
    trimmed."""
    u = F.trim(col if isinstance(col, Column) else F.col(col))
    # fragment never reaches the server — drop it before parsing
    u2 = F.regexp_replace(u, r"#.*$", "")
    scheme = F.lower(F.regexp_extract(u2, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    rest = F.regexp_replace(u2, _SCHEME_RE, "")
    hostport = F.lower(F.regexp_extract(rest, r"^([^/?]*)", 1))
    host = _strip_default_port(scheme, hostport)
    pathq = F.substring(rest, F.length(hostport) + 1, F.lit(1 << 30))
    path = F.regexp_extract(pathq, r"^([^?]*)", 1)
    query = F.regexp_extract(pathq, r"\?(.*)$", 1)
    # trailing-slash strip ("/a/b/" == "/a/b"; bare "/" folds to "")
    path = F.regexp_replace(path, r"/+$", "")
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE))
    canon_q = F.array_join(F.array_sort(params), "&")
    rebuilt = F.concat(
        scheme, F.lit("://"), host, path,
        F.when(canon_q != "", F.concat(F.lit("?"), canon_q))
         .otherwise(F.lit("")))
    return F.when(u.isNull(), F.lit(None).cast("string")) \
            .when(scheme == "", u) \
            .otherwise(rebuilt)


def _strip_default_port(scheme: Column, hostport: Column) -> Column:
    return (F.when((scheme == "http"),
                   F.regexp_replace(hostport, r":80$", ""))
             .when((scheme == "https"),
                   F.regexp_replace(hostport, r":443$", ""))
             .otherwise(hostport))


def url_groups(df: DataFrame, url_col: str, id_col: str) -> DataFrame:
    """Canonical-URL duplicate groups: ``(canon_url, n_urls, keep_id)``
    for every canonical URL appearing more than once — the exact-dedup
    groupBy over the canonicalized projection (shuffles the canonical
    string + id only; survivor = smallest id, reruns stable)."""
    keyed = (df.where(F.col(url_col).isNotNull())
               .select(canonical_url(url_col).alias("canon_url"),
                       F.col(id_col)))
    return (keyed.groupBy("canon_url")
                 .agg(F.count(F.lit(1)).alias("n_urls"),
                      F.min(id_col).alias("keep_id"))
                 .where(F.col("n_urls") > 1))


def url_dedup(df: DataFrame, url_col: str, id_col: str) -> DataFrame:
    """Rows surviving canonical-URL dedup: the smallest-id row per
    canonical URL plus every row whose URL is unique or NULL."""
    groups = url_groups(df, url_col, id_col)
    losers = (df.select(canonical_url(url_col).alias("canon_url"),
                        F.col(id_col))
                .join(groups, "canon_url")
                .where(F.col(id_col) != F.col("keep_id"))
                .select(id_col))
    return df.join(losers, id_col, "left_anti")
