"""Text scrubbing: regex redaction of common sensitive patterns.

A training pipeline's first text pass usually masks emails, phone-ish
number runs, and bare IP addresses before anything else sees the text.
Pure ``regexp_replace`` chains — JVM codegen, order-sensitive (emails
before phones so a number inside an address is not half-masked), and
deliberately conservative: patterns favor precision over recall, and
the replacement tokens are greppable sentinels.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
# 7+ digit runs with optional separators — phone-shaped, after emails/IPs
PHONE_RE = r"\+?\d[\d\s().-]{5,}\d"

EMAIL_TOKEN = "<EMAIL>"
IP_TOKEN = "<IP>"
PHONE_TOKEN = "<PHONE>"


def scrub_text(col: Column) -> Column:
    """Mask emails, then IPs, then phone-shaped digit runs."""
    out = F.regexp_replace(col, EMAIL_RE, EMAIL_TOKEN)
    out = F.regexp_replace(out, IPV4_RE, IP_TOKEN)
    return F.regexp_replace(out, PHONE_RE, PHONE_TOKEN)


def scrub_counts(col: Column) -> Column:
    """(n_emails, n_ips, n_phones) struct — audit metrics per row,
    computed on the ORIGINAL text (same masking order semantics)."""
    after_email = F.regexp_replace(col, EMAIL_RE, EMAIL_TOKEN)
    after_ip = F.regexp_replace(after_email, IPV4_RE, IP_TOKEN)
    return F.struct(
        F.size(F.regexp_extract_all(col, F.lit(EMAIL_RE), 0))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(after_email, F.lit(IPV4_RE), 0))
        .cast("long")
        .alias("n_ips"),
        F.size(F.regexp_extract_all(after_ip, F.lit(PHONE_RE), 0))
        .cast("long")
        .alias("n_phones"),
    )
