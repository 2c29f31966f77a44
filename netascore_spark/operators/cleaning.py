"""Corpus-cleaning operators: PII scrubbing, URL canonicalization, and
repetition-based quality signals (the Gopher-rules family).

All native ``pyspark.sql.functions`` Columns — map-only, whole-stage
codegen, no UDFs: at 10^12 documents these run at scan speed and never
shuffle.  Patterns are deliberately conservative (precision over recall):
a cleaning pass that mangles non-PII text corrupts training data silently.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# conservative PII patterns (precision-first)
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
# lookarounds (not \b) so a longer dotted run like 1.2.3.4.5 — a version
# string, not an address — is rejected outright instead of partially masked
IPV4_RE = r"(?<![\d.])(?:(?:25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])\.){3}(?:25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])(?![\d.])"
# international-ish phone: +CC then 7-14 digits with optional separators
PHONE_RE = r"\+[1-9][0-9]{0,2}[ .-]?(?:\(?[0-9]{1,4}\)?[ .-]?){2,5}[0-9]{2,4}"


def scrub_pii(text: Column) -> Column:
    """Mask emails, IPv4 addresses and international phone numbers with
    typed placeholders (<EMAIL>/<IP>/<PHONE>).  Order matters: emails
    first (an email's host could otherwise partially match), phones last
    (their separators never overlap the other two)."""
    out = F.regexp_replace(text, EMAIL_RE, "<EMAIL>")
    out = F.regexp_replace(out, IPV4_RE, "<IP>")
    return F.regexp_replace(out, PHONE_RE, "<PHONE>")


def pii_counts(text: Column) -> Column:
    """struct<n_emails, n_ips, n_phones> — audit signal for routing docs
    to review rather than silently rewriting them."""
    return F.struct(
        F.regexp_count(text, F.lit(EMAIL_RE)).alias("n_emails"),
        F.regexp_count(text, F.lit(IPV4_RE)).alias("n_ips"),
        F.regexp_count(text, F.lit(PHONE_RE)).alias("n_phones"),
    )


def normalize_url(url: Column) -> Column:
    """Canonical URL for dedup joins: lowercase scheme+host, default ports
    stripped, fragment dropped, tracking params (utm_*, fbclid, gclid,
    msclkid) removed, trailing '?'/'&' and trailing slash on a bare path
    tidied.  Pure regexp chain — no parser state, so malformed URLs pass
    through minimally changed instead of erroring."""
    u = F.regexp_replace(url, r"#.*$", "")  # fragment
    # lowercase scheme://host (keep path case: it is significant)
    u = F.concat(
        F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1)),
        F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", ""),
    )
    u = F.regexp_replace(u, r"^(https://[^/:?#]+):443(?=[/?]|$)", r"$1")
    u = F.regexp_replace(u, r"^(http://[^/:?#]+):80(?=[/?]|$)", r"$1")
    # tracking params, wherever they sit in the query string
    u = F.regexp_replace(u, r"[?&](?:utm_[A-Za-z]+|fbclid|gclid|msclkid)=[^&#]*", "")
    # if the first surviving param lost its '?', restore it — FIRST '&'
    # only (an anchored capture; a bare replace-all would turn every
    # subsequent separator into '?')
    u = F.regexp_replace(u, r"^([^?&]*)&", r"$1?")
    u = F.regexp_replace(u, r"[?&]$", "")
    return F.regexp_replace(u, r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]+)/$", r"$1")


def repetition_stats(text: Column) -> Column:
    """struct<dup_line_frac, max_line_len, alpha_frac, mean_word_len> —
    the repetition/character-quality signals used for corpus filtering
    (boilerplate pages have high duplicate-line fractions; binary junk has
    low alpha fractions)."""
    lines = F.filter(F.split(text, "\n"), lambda ln: F.trim(ln) != "")
    n_lines = F.size(lines)
    dup_frac = F.when(n_lines <= 0, 0.0).otherwise(
        1.0 - F.size(F.array_distinct(lines)) / n_lines.cast("double")
    )
    max_line = F.when(n_lines <= 0, 0).otherwise(
        F.array_max(F.transform(lines, F.length))
    )
    n_chars = F.length(text)
    alpha = F.when(n_chars <= 0, 0.0).otherwise(
        F.length(F.regexp_replace(text, r"[^\p{L}]", "")) / n_chars.cast("double")
    )
    words = F.filter(F.split(text, r"[ \t\n\f\r]+"), lambda w: w != "")
    mean_wl = F.when(F.size(words) <= 0, 0.0).otherwise(
        F.aggregate(
            words, F.lit(0), lambda acc, w: acc + F.length(w)
        ).cast("double")
        / F.size(words)
    )
    return F.struct(
        F.round(dup_frac, 6).alias("dup_line_frac"),
        max_line.alias("max_line_len"),
        F.round(alpha, 6).alias("alpha_frac"),
        F.round(mean_wl, 6).alias("mean_word_len"),
    )


def with_cleaning(docs: DataFrame, text_col: str = "text") -> DataFrame:
    t = F.col(text_col)
    return (
        docs.withColumn("text_scrubbed", scrub_pii(t))
        .withColumn("pii", pii_counts(t))
        .withColumn("rep", repetition_stats(t))
    )


def domain_of(url: Column) -> Column:
    """Registrable-host extraction for per-domain grouping: lowercase host
    with any leading 'www.' stripped (full public-suffix parsing needs the
    PSL table — ship it as a broadcast dim when precision matters)."""
    host = F.lower(F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)", 1))
    return F.when(host == "", None).otherwise(
        F.regexp_replace(host, r"^www\.", "")
    )


def domain_stats(
    docs: DataFrame, url_col: str = "url", text_col: str = "text"
) -> DataFrame:
    """Per-domain corpus profile: doc count, mean quality signals, PII
    density — the table a pipeline thresholds to drop whole domains
    (one shuffle on the domain key; partial aggregation does the heavy
    lifting map-side, so hot domains cost bandwidth not memory)."""
    t = F.col(text_col)
    per_doc = docs.select(
        domain_of(F.col(url_col)).alias("domain"),
        repetition_stats(t).alias("rep"),
        pii_counts(t).alias("pii"),
        F.length(t).alias("n_chars"),
    ).filter(F.col("domain").isNotNull())
    return per_doc.groupBy("domain").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("rep.dup_line_frac"), 6).alias("avg_dup_line_frac"),
        F.round(F.avg("rep.alpha_frac"), 6).alias("avg_alpha_frac"),
        F.round(F.avg("n_chars"), 2).alias("avg_chars"),
        F.sum(
            F.col("pii.n_emails") + F.col("pii.n_ips") + F.col("pii.n_phones")
        ).alias("n_pii_hits"),
    )
