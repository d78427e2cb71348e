"""PII redaction over a text column (training-data scrubbing stage).

Emails, NANP-style phone numbers and IPv4 addresses are replaced with
``<EMAIL>`` / ``<PHONE>`` / ``<IP>`` tokens, and per-kind match counts
are reported.  Everything is vectorized with ``pyarrow.compute`` RE2
kernels (``replace_substring_regex`` / ``count_substring_regex``) — no
Python loop touches the text.  DuckDB's ``regexp_replace`` is also
RE2, so the exact same patterns serve as the SQL oracle
(``__ray_entry__.oracle_sql()['pii_redact']``).

Redaction order is part of the spec: emails first (so a phone-looking
local part is consumed by ``<EMAIL>``), then phones, then IPs.

``plant_pii`` is the deterministic synthetic fixture: the driver's
``documents.text`` contains no PII, so the query plants one email, one
phone and (for ``doc_id % 3 == 0``) one IP per document with rules
modular in ``doc_id`` — reproducible in pure SQL on the oracle side
(CLAUDE.md invariant: the synth rules ARE the oracle).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

__all__ = ["EMAIL_RE", "PHONE_RE", "IP_RE", "plant_pii", "redact_pii_batch",
           "redact_pii"]

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"[0-9]{3}-[0-9]{3}-[0-9]{4}"
IP_RE = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"


def plant_pii(doc_id: int, text: str) -> str:
    """Deterministically append synthetic PII to one document's text."""
    s = (f"{text} Contact user{doc_id}@mail{doc_id % 7}.example.com "
         f"or call 555-{doc_id % 1000:03d}-{doc_id % 10000:04d}")
    if doc_id % 3 == 0:
        s += f" from 10.0.{doc_id % 256}.{(doc_id * 7) % 256}"
    return s


def redact_pii_batch(batch: pa.Table, column: str = "text") -> pa.Table:
    """Vectorized per-batch redaction: counts first, then replaces."""
    col = batch.column(column)
    n_emails = pc.count_substring_regex(col, EMAIL_RE)
    n_phones = pc.count_substring_regex(col, PHONE_RE)
    n_ips = pc.count_substring_regex(col, IP_RE)
    clean = pc.replace_substring_regex(col, EMAIL_RE, "<EMAIL>")
    clean = pc.replace_substring_regex(clean, PHONE_RE, "<PHONE>")
    clean = pc.replace_substring_regex(clean, IP_RE, "<IP>")
    out = batch.drop_columns([column])
    out = out.append_column("clean_text", clean)
    out = out.append_column("n_emails", pc.cast(n_emails, pa.int64()))
    out = out.append_column("n_phones", pc.cast(n_phones, pa.int64()))
    return out.append_column("n_ips", pc.cast(n_ips, pa.int64()))


def redact_pii(ds: rd.Dataset, column: str = "text") -> rd.Dataset:
    """Scrub a text column across the corpus.

    Pure per-row map — no shuffle, streams at any scale; the RE2
    automata compile once per pattern inside Arrow's kernel cache.
    """
    return ds.map_batches(lambda t: redact_pii_batch(t, column),
                          batch_format="pyarrow")
