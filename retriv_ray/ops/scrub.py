"""PII / pattern scrubbing for training-data pipelines.

Per-batch pure-``pyarrow.compute`` regex ops (RE2 — the same engine
DuckDB uses, so every count and every replacement is SQL-checkable
verbatim). No shuffle, no Python row loop: ``count_substring_regex``
and ``replace_substring_regex`` run vectorized over the Arrow string
column, so the op streams at decompress speed and holds at 100 TB
(embarrassingly parallel map).

The reference engine (AmenRa/retriv) has no scrubbing stage; this is
part of the training-data operator family the engine adds (like
``ops/dedup.py`` / ``ops/textstats.py``).
"""

from __future__ import annotations

from typing import Dict, Optional

import pyarrow as pa
import pyarrow.compute as pc

# Canonical PII patterns, RE2 syntax (no lookaround — RE2 has none,
# which is exactly what keeps DuckDB parity possible). Dict order is
# the REDACTION order: e-mail before ipv4 before bare numbers, so a
# narrower pattern never eats part of a wider one's match.
DEFAULT_PATTERNS: Dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "number": r"\d+",
}


def _repl_token(name: str) -> str:
    # letters only: a token containing a digit (e.g. <IPV4>) would be
    # re-matched and mangled by a later \d+ pass
    return "<" + "".join(c for c in name.upper() if c.isalpha()) + ">"


def pattern_scrub(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    patterns: Optional[Dict[str, str]] = None,
    redact: bool = True,
):
    """(id, n_<name>... [, redacted]) — per-row non-overlapping match
    counts for each named pattern, plus (optionally) the text with
    every match replaced by ``<NAME>``, applied in dict order.

    Both the counts and the sequential replacement semantics are
    bit-reproducible in DuckDB (``len(regexp_extract_all(...))`` and
    chained ``regexp_replace(..., 'g')`` — same RE2 dialect, same
    leftmost non-overlapping scan).
    """
    pats = dict(patterns or DEFAULT_PATTERNS)

    def scrub(batch: pa.Table) -> pa.Table:
        txt = batch.column(text_col)
        cols = [batch.column(id_col)]
        names = [id_col]
        for name, pat in pats.items():
            cols.append(pc.cast(pc.count_substring_regex(txt, pat), pa.int64()))
            names.append(f"n_{name}")
        if redact:
            red = txt
            for name, pat in pats.items():
                red = pc.replace_substring_regex(red, pat, _repl_token(name))
            cols.append(red)
            names.append("redacted")
        return pa.Table.from_arrays(cols, names=names)

    return ds.map_batches(scrub, batch_format="pyarrow")
