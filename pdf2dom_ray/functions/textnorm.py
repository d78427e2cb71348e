"""Unicode text normalization — the standard web-text cleanup pass.

Crawled text arrives with decomposed accents (NFD from Mac filesystems
and sloppy encoders), stray C0 control characters, and ragged
whitespace; training pipelines canonicalize before tokenization so
that byte-identical strings mean identical text. The pass:

1. Unicode **NFC** composition (``unicodedata.normalize`` — this
   container's Arrow ``utf8_normalize(form='NFC')`` does NOT compose
   combining sequences, verified empirically, so the stdlib does this
   one step; the column is narrow text and the C-level call is cheap),
2. strip C0/C1 control characters except tab/newline (Arrow RE2
   kernel),
3. collapse ``[ \\t\\n]+`` runs to one space and trim (Arrow kernels).

Each step has an exact DuckDB twin (``nfc_normalize`` +
``regexp_replace``/``trim``), so the oracle is byte-identical.
"""

from __future__ import annotations

import unicodedata

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

__all__ = ["normalize_batch", "normalize_text"]

_CTRL_RE = r"[\x00-\x08\x0b-\x1f\x7f-\x9f]"
_WS_RE = r"[ \t\n]+"


def normalize_batch(t: pa.Table, *, col: str = "text",
                    out: str = "clean_text") -> pa.Table:
    s = t.column(col)
    n0 = pc.utf8_length(s)
    s = pa.array([unicodedata.normalize("NFC", x) if x is not None
                  else None for x in s.to_pylist()], pa.string())
    s = pc.replace_substring_regex(s, pattern=_CTRL_RE, replacement="")
    s = pc.replace_substring_regex(s, pattern=_WS_RE, replacement=" ")
    s = pc.utf8_trim(s, characters=" ")
    return t.append_column(out, s).append_column(
        "n_chars_in", n0.cast(pa.int64())).append_column(
        "n_chars_out", pc.utf8_length(s).cast(pa.int64()))


def normalize_text(ds: rd.Dataset, *, col: str = "text") -> rd.Dataset:
    """Row-local, shuffle-free; scales like any map stage."""
    return ds.map_batches(lambda t: normalize_batch(t, col=col),
                          batch_format="pyarrow")
