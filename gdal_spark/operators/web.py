"""Web-corpus hygiene operators: URL canonicalization + URL-level
dedup (the CCNet/RefinedWeb front door), PII redaction, and Unicode
NFC cleanup.

Everything except the NFC pass is JVM-side built-ins (parse_url /
regexp / sort_array / concat — whole-stage codegen, no Python). NFC
has no Spark built-in, so it is the one Arrow-batched pandas UDF here
(unicodedata.normalize over a whole column batch); ASCII-only batches
short-circuit to a no-copy passthrough.

Scale notes
-----------
* ``normalize_url`` is a pure per-row projection: no shuffle, runs
  inside the scan stage.
* ``url_dedup`` shuffles only (url_norm, order-key) pairs — one hash
  aggregation with map-side combine, the minimum possible traffic for
  exact URL-level dedup. Hot hosts skew the *domain* distribution but
  not the dedup key (full URL), so no salting is needed here.
* ``redact_pii`` / ``nfc_clean`` are per-row projections (no shuffle).
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# query params dropped during canonicalization (click-tracking noise
# that makes otherwise-identical pages look distinct to exact dedup)
TRACKING_PARAM_RE = r"^(utm_[^=]*|fbclid|gclid|msclkid|ref)(=.*)?$"

_DEFAULT_PORTS = {"http": "80", "https": "443"}


def _part(url: Column, part: str) -> Column:
    return F.parse_url(url, F.lit(part))


def normalize_url(url: Column) -> Column:
    """Canonical form of a URL (one JVM expression tree, no Python):

    * scheme and host lowercased,
    * default port dropped (``:80`` http / ``:443`` https),
    * fragment dropped,
    * tracking query params dropped (``utm_*``, ``fbclid``, ...),
    * remaining query params sorted byte-wise,
    * trailing slashes collapsed (``/a/b/`` == ``/a/b``, root ``/``
      kept).

    The param *sort* makes canonicalization order-insensitive, which
    is what lets ``url_dedup`` use a plain hash equi-key."""
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*):", 1))
    host = F.lower(_part(url, "HOST"))
    # parse_url HOST excludes the port; recover it from AUTHORITY
    port = F.regexp_extract(_part(url, "AUTHORITY"), r":(\d+)$", 1)
    default_port = (
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
        | (port == "")
    )
    port_part = F.when(default_port, F.lit("")).otherwise(
        F.concat(F.lit(":"), port)
    )
    raw_path = F.coalesce(_part(url, "PATH"), F.lit(""))
    path = F.regexp_replace(raw_path, r"/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    params = F.split(F.coalesce(_part(url, "QUERY"), F.lit("")), "&")
    kept = F.sort_array(
        F.filter(
            params,
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    qs = F.array_join(kept, "&")
    query_part = F.when(qs == "", F.lit("")).otherwise(
        F.concat(F.lit("?"), qs)
    )
    return F.concat(scheme, F.lit("://"), host, port_part, path, query_part)


def registrable_domain(url: Column) -> Column:
    """Last-two-labels registrable domain (public-suffix-lite: exact
    PSL handling of multi-label suffixes like ``co.uk`` would swap in
    a broadcast suffix set; the column shape is identical)."""
    host = F.lower(_part(url, "HOST"))
    labels = F.split(host, r"\.")
    n = F.size(labels)
    return F.when(n <= 2, host).otherwise(
        F.concat_ws(".", F.element_at(labels, -2), F.element_at(labels, -1))
    )


def url_dedup(
    df: DataFrame,
    url_col: str = "url",
    order_col: str | None = None,
    norm_col: str = "url_norm",
) -> DataFrame:
    """Exactly one row per canonical URL (CCNet-style URL-level dedup).

    The kept row is the minimum of ``(order_col, url)`` within each
    canonical group — deterministic under any partitioning. Emits the
    surviving rows plus ``n_dups`` (group size). ONE shuffle on the
    canonical URL; the min-struct aggregation combines map-side, so
    at 10^12 rows the reduce traffic is ~one record per distinct URL."""
    keyed = df.withColumn(norm_col, normalize_url(F.col(url_col)))
    payload = [c for c in df.columns]
    order = [F.col(order_col).alias("__o")] if order_col else []
    packed = F.struct(
        *order,
        F.col(url_col).alias("__tie"),
        *[F.col(c).alias(f"__p_{c}") for c in payload],
    )
    agg = keyed.groupBy(norm_col).agg(
        F.min(packed).alias("__keep"),
        F.count(F.lit(1)).alias("n_dups"),
    )
    return agg.select(
        norm_col,
        *[F.col(f"__keep.__p_{c}").alias(c) for c in payload],
        "n_dups",
    )


# RE2-compatible (the DuckDB oracle runs the same patterns): no
# backreferences, no lookaround. IPv4 octets are range-checked so
# "999.999.999.999" is NOT treated as an address.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_OCT = r"(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
IPV4_RE = rf"\b{_OCT}\.{_OCT}\.{_OCT}\.{_OCT}\b"


def redact_pii(
    df: DataFrame, text_col: str = "text", out_col: str = "text_redacted"
) -> DataFrame:
    """Replace emails / IPv4 literals with typed placeholders and
    count what was removed. Pure JVM regexp — no Python in the path."""
    t = F.col(text_col)
    n_emails = F.regexp_count(t, F.lit(EMAIL_RE))
    redacted = F.regexp_replace(t, EMAIL_RE, "<EMAIL>")
    n_ips = F.regexp_count(redacted, F.lit(IPV4_RE))
    redacted = F.regexp_replace(redacted, IPV4_RE, "<IP>")
    return df.withColumns(
        {
            "n_emails": n_emails.cast("long"),
            "n_ips": n_ips.cast("long"),
            out_col: redacted,
        }
    )


def nfc_clean(
    df: DataFrame, text_col: str, out_col: str = "text_clean"
) -> DataFrame:
    """Unicode NFC normalization + whitespace collapse.

    NFC runs in an Arrow-batched pandas UDF (no Spark built-in exists);
    an all-ASCII batch is returned untouched without calling
    ``unicodedata`` at all, so the common web-corpus case is one
    vectorized ``is-ascii`` check. Whitespace collapse stays JVM-side."""

    @F.pandas_udf("string")
    def _nfc(s: pd.Series) -> pd.Series:
        ascii_mask = s.str.len() == s.str.encode("utf-8").str.len()
        if bool(ascii_mask.all()):
            return s
        out = s.copy()
        nonascii = ~ascii_mask & s.notna()
        out[nonascii] = [
            unicodedata.normalize("NFC", v) for v in s[nonascii]
        ]
        return out

    collapsed = F.regexp_replace(_nfc(F.col(text_col)), r"\s+", " ")
    return df.withColumn(out_col, F.trim(collapsed))
