"""URL normalization ops (F14) as native regex expressions.

Reference semantics: tables/other/url_solver.py:7-70 (arXiv-id extraction,
.pdf match, URL finder, trailing-punctuation strip, wiley rewrite, candidate
selection). Pure-deterministic string work → stays JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_ARXIV_RE = r"arxiv\.org/(?:abs|pdf|html)/([0-9]{4}\.[0-9]{4,5}(?:v[0-9]{0,2})?)"
_URL_RE = r"https?://[^\s,;]+"


def strip_trailing_punct_col(c: Column) -> Column:
    """rstrip(' \\t\\r\\n).,;:!?]') — reference url_solver.py:33, 51."""
    return F.regexp_replace(c, r"[ \t\r\n).,;:!?\]]+$", "")


def arxiv_id_col(c: Column) -> Column:
    """Extract the first arXiv id, NULL if absent (url_solver.py:7, 59)."""
    return F.nullif(F.regexp_extract(c, _ARXIV_RE, 1), F.lit(""))


def is_pdf_url_col(c: Column) -> Column:
    """^https?://.+\\.pdf($|[?#]) case-insensitive (url_solver.py:8)."""
    return c.rlike(r"(?i)^https?://.+\.pdf($|[?#])")


def first_url_col(c: Column) -> Column:
    """First http(s) URL in free text, trailing punct stripped, comma-bearing
    candidates rejected (url_solver.py:16-42)."""
    raw = F.regexp_extract(c, _URL_RE, 0)
    cleaned = strip_trailing_punct_col(raw)
    return F.when(
        (F.length(cleaned) > 0) & ~cleaned.contains(","), cleaned
    ).otherwise(F.lit(None).cast("string"))


def solve_url_col(c: Column) -> Column:
    """Candidate-selection composition (url_solver.py:45-70):
    wiley full→pdf rewrite, then arXiv-id → canonical pdf URL, then direct
    .pdf URLs, then first line; falls back to first URL found anywhere."""
    cleaned = strip_trailing_punct_col(F.trim(c))
    wiley = F.regexp_replace(
        cleaned, r"onlinelibrary\.wiley\.com/doi/full/", "onlinelibrary.wiley.com/doi/pdf/"
    )
    arxiv = arxiv_id_col(wiley)
    first_line = F.split(wiley, r"\r?\n").getItem(0)
    candidate = (
        F.when(arxiv.isNotNull(), F.concat(F.lit("https://arxiv.org/pdf/"), arxiv, F.lit(".pdf")))
        .when(is_pdf_url_col(wiley), wiley)
        .otherwise(first_line)
    )
    probable = candidate.rlike(r"(?i)^https?://\S+$") & ~candidate.contains(",")
    return F.when(probable, candidate).otherwise(first_url_col(wiley))


def canonical_url_col(c: Column) -> Column:
    """Canonical URL for dedup keys (round 3): lowercase scheme+host, drop
    the fragment, drop utm_*/fbclid/gclid tracking params, drop default
    ports (:80 http / :443 https), strip a single trailing slash on the
    path. Pure regexp chain — codegen'd, and replicable verbatim in the
    DuckDB oracle. NULL/empty and non-http(s) inputs pass through NULL."""
    u = F.trim(F.coalesce(c, F.lit("")))
    valid = u.rlike(r"(?i)^https?://")
    # 1. drop fragment
    x = F.regexp_replace(u, r"#.*$", "")
    # 2. lowercase scheme+authority (group 1), keep the rest as-is
    scheme_host = F.lower(F.regexp_extract(x, r"^([^/]+//[^/?#]+)", 1))
    rest = F.regexp_replace(x, r"^[^/]+//[^/?#]+", "")
    # 3. default ports
    scheme_host = F.regexp_replace(scheme_host, r"^(http://[^:/]+):80$", r"$1")
    scheme_host = F.regexp_replace(scheme_host, r"^(https://[^:/]+):443$", r"$1")
    # 4. tracking params (any position; adjacent removals leave ?&&/&&
    # runs, so collapse & runs FIRST, then the ?& seam, then trailing
    # separators — property-tested idempotent in test_functions.py)
    rest = F.regexp_replace(
        rest, r"([?&])(?i:utm_[a-z_]+|fbclid|gclid)=[^&#]*", r"$1"
    )
    rest = F.regexp_replace(rest, r"&&+", "&")
    rest = F.regexp_replace(rest, r"\?&", "?")
    rest = F.regexp_replace(rest, r"[?&]+$", "")
    # 5. trailing slash RUN on the path (a single strip is not idempotent
    # when the path ends '//', e.g. from empty segments — property test);
    # the bare root '/' survives
    rest = F.regexp_replace(rest, r"^(/[^?]*?)/+(\?|$)", r"$1$2")
    return F.when(valid, F.concat(scheme_host, rest)).otherwise(
        F.lit(None).cast("string")
    )
