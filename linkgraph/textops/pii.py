"""PII detection and redaction over the documents table.

The scrub every LLM training-data pipeline runs before text leaves the
ingest zone: find emails / IPv4s / phone-shaped digit runs, count them
per document, and replace them with typed placeholder tokens.

Spark-first shape: the whole operator is ONE pure projection — three
`regexp_extract_all` counts and three chained `regexp_replace` passes,
all JVM-side codegen expressions.  Zero shuffle, zero UDF, zero state:
each document is scrubbed where it already sits, so at 100 TB the plan
is exactly one mapper wave over the parquet scan with `text` as the
only wide column read (column pruning keeps the rest out of the scan).

Pattern portability: the three regexes use only syntax shared by Java
`java.util.regex` (Spark codegen) and RE2 (DuckDB) — character classes,
bounded repetition, `\\b` word boundaries, no lookaround, no
backreferences — so the DuckDB oracle (`regexp_replace(..., 'g')`,
`len(regexp_extract_all(...))`) reproduces counts and scrubbed text
byte-for-byte.  Replacement order is fixed (email → ipv4 → phone) in
both engines: an email's digits can never be re-matched as a phone
because the email token is swapped out first.

Redaction is deliberately pattern-level, not NER-level: names and
addresses need a model pass (the multimodal-style plug-in point); the
regex layer is the deterministic, auditable floor that runs on every
byte.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Shared Java-regex/RE2 subset — see module docstring.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
# +optional country code, then >=8 total digits allowing separators -, space, ().
PHONE_RE = r"\+?[0-9][0-9() -]{6,}[0-9]\b"

EMAIL_TOKEN = "<EMAIL>"
IPV4_TOKEN = "<IP>"
PHONE_TOKEN = "<PHONE>"


def pii_scrub(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Returns (doc_id, n_emails, n_ipv4, n_phones, n_pii, clean_text)
    for every document; `clean_text` has each match replaced by its
    typed token.  Counts and replacements follow the same chain
    (email → ipv4 → phone): each stage counts on the previous stage's
    scrubbed text, so an email's digit run is never double-counted as
    a phone.  Order-stable across engines."""
    t = F.col(text_col)
    n_email = F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), 0))
    no_email = F.regexp_replace(t, EMAIL_RE, EMAIL_TOKEN)
    n_ip = F.size(F.regexp_extract_all(no_email, F.lit(IPV4_RE), 0))
    no_ip = F.regexp_replace(no_email, IPV4_RE, IPV4_TOKEN)
    n_phone = F.size(F.regexp_extract_all(no_ip, F.lit(PHONE_RE), 0))
    clean = F.regexp_replace(no_ip, PHONE_RE, PHONE_TOKEN)
    return docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        n_email.cast("long").alias("n_emails"),
        n_ip.cast("long").alias("n_ipv4"),
        n_phone.cast("long").alias("n_phones"),
        (n_email + n_ip + n_phone).cast("long").alias("n_pii"),
        clean.alias("clean_text"),
    )


def k_anonymity(
    df: DataFrame, quasi_cols: list[str], k: int = 10
) -> DataFrame:
    """k-anonymity audit over a quasi-identifier combination: one row per
    equivalence class, (quasi..., group_n, at_risk) with at_risk = 1 when
    the class has fewer than k members (Sweeney 2002) — those rows are
    re-identifiable by joining the quasi-identifiers against any outside
    table and must be suppressed or generalized before release.

    One hash aggregate on the quasi-identifier tuple; the class table is
    |distinct combinations| rows (bounded by the dimension product), so
    the audit costs one shuffle regardless of table size.
    """
    if not quasi_cols:
        raise ValueError("k_anonymity: need at least one quasi-identifier")
    if k < 1:
        raise ValueError("k_anonymity: k must be >= 1")
    return df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).cast("long").alias("group_n"),
        F.when(F.count(F.lit(1)) < k, F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("at_risk"),
    )


def l_diversity(
    df: DataFrame, quasi_cols: list[str], sensitive_col: str, l: int = 2
) -> DataFrame:
    """l-diversity audit [Machanavajjhala et al., ICDE'06] — the
    standard escalation of k_anonymity: an equivalence class can be
    large (k-safe) yet still leak the sensitive attribute if everyone
    in it shares one value.  One row per quasi-identifier class:
    (quasi..., group_n, n_sensitive, at_risk) with at_risk = 1 when the
    class carries fewer than `l` DISTINCT sensitive values.

    Same single-shuffle rollup as k_anonymity with a two-phase distinct
    aggregate riding along; class-table cardinality bounds the output.
    """
    if not quasi_cols:
        raise ValueError("l_diversity: need at least one quasi-identifier")
    if l < 1:
        raise ValueError("l_diversity: l must be >= 1")
    nd = F.countDistinct(sensitive_col)
    return df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).cast("long").alias("group_n"),
        nd.cast("long").alias("n_sensitive"),
        F.when(nd < l, F.lit(1)).otherwise(F.lit(0)).cast("long").alias("at_risk"),
    )
