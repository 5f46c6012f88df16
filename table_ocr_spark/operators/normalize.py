"""Text canonicalization for crawl corpora: Unicode NFC normalization,
control-character stripping, whitespace collapsing.

Crawl text mixes precomposed and decomposed Unicode (é vs e+U+0301),
carries stray C0 controls from broken encoders, and hides duplicate
content behind byte-level differences that are canonically equal —
every exact-dedup hash and every byte-identity contract upstream of
training data wants ONE canonical byte form first. The reference never
needs this (its text comes out of its own renderer); a Common-Crawl
pipeline does it before anything keyed on text bytes.

Engine split, per the measured doctrine (textstats/webfilter):
- NFC itself has no Spark builtin → one Arrow-batched ``pandas_udf``
  calling CPython's C-level ``unicodedata.normalize`` (map-only, no
  exchange; the per-row call is a C function, not interpreted Python).
- control stripping and whitespace collapsing are pinned-regex
  ``regexp_replace`` expressions — JVM-side, fused into codegen,
  and exactly mirrorable in DuckDB/RE2 for the oracle.

Pinned semantics:
- ``strip_controls``: remove the C0 controls EXCEPT ``\\t`` and
  ``\\n`` (layout-bearing), plus DEL — the explicit class
  ``[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]``; ``\\r`` dies here too
  (CRLF → LF), so line splits downstream see one newline dialect.
- ``collapse_ws``: runs of spaces/tabs → one space, then per-line
  edge trim; newlines are NEVER collapsed (paragraph structure is
  load-bearing for the repetition/boilerplate operators).
- ``changed`` flags rows whose bytes moved (audit column — at crawl
  scale the changed-fraction is itself a corpus-health metric).

Cross-engine oracle: DuckDB ships ``nfc_normalize``, so the contract
row is a genuine independent-implementation differential (ICU vs
CPython unicodedata), not a twin of our own code.
"""

import pandas as pd  # module-level: pandas_udf resolves the PEP-563
# stringified 'pd.Series' hints against the function's globals

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CONTROLS_RE = "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]|\\r"
WS_RUN_RE = "[ \\t]+"
EDGE_WS_RE = "(?m)^ | $"


def strip_control_chars(col: Column) -> Column:
    """C0-control removal per the pinned class; CR normalizes away."""
    return F.regexp_replace(col, CONTROLS_RE, "")


def collapse_whitespace(col: Column) -> Column:
    """Space/tab runs → one space, then strip line-edge spaces.
    Newlines survive untouched."""
    return F.regexp_replace(
        F.regexp_replace(col, WS_RUN_RE, " "), EDGE_WS_RE, ""
    )


def nfc_udf(form: str = "NFC"):
    """Arrow-batched NFC/NFD/NFKC/NFKD normalizer column function."""
    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"unknown normalization form {form!r}")

    @F.pandas_udf("string")
    def _norm(s: pd.Series) -> pd.Series:
        import unicodedata

        return s.map(
            lambda x: None if x is None else unicodedata.normalize(form, x)
        )

    return _norm


def normalize_text(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    form: str = "NFC",
    strip_controls: bool = True,
    collapse_ws: bool = False,
) -> DataFrame:
    """→ (id_col, text_norm, changed). Map-only; the NFC hop is the
    single Arrow stage, the regex passes fuse into JVM codegen on
    either side of it. Order pinned: controls → NFC → whitespace
    (control bytes could otherwise split a whitespace run; NFC before
    collapse so compatibility spaces introduced by NFKC fold too)."""
    c: Column = F.col(text_col)
    if strip_controls:
        c = strip_control_chars(c)
    c = nfc_udf(form)(c)
    if collapse_ws:
        c = collapse_whitespace(c)
    return df.select(
        F.col(id_col),
        c.alias("text_norm"),
        (~c.eqNullSafe(F.col(text_col))).alias("changed"),
    )
