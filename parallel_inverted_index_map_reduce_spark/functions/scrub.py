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
# Phone numbers must show actual phone STRUCTURE, not just 7+ digit-ish
# chars (the old pattern masked '2020-2021', '3.14159265', '1000000').
# Four precise shapes, guarded by lookarounds so a match can neither
# start inside a longer digit/decimal run nor continue into one:
#   +40721234567          international, compact (7-15 digits)
#   +40 721 234 567       international, space/dash grouped
#   (555) 123-4567        NANP with area-code parens
#   555-123-4567          3-3-4 with -, . or space separators
# Deliberately NOT matched (precision over recall): bare digit runs
# ('5551234567' could be an id), 4-3-3 European groupings (collide with
# year ranges), and date shapes (4-2-2 never fits 3-3-4).
PHONE_RE = (
    r"(?<!\d)(?<!\d\.)"
    r"(?:\+\d{1,3}[\s-]\d(?:[\s-]?\d){5,12}"
    r"|\+\d{7,15}"
    r"|\(\d{3}\)[\s.-]?\d{3}[\s.-]?\d{4}"
    r"|\d{3}[\s.-]\d{3}[\s.-]\d{4})"
    r"(?!\.?\d)"
)

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
