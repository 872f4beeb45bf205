"""Text normalization for lexical matching (SURVEY.md C1).

The reference grounds names through a gilda-style grounder whose index keys
are normalized text (used at predict/lexical.py:188,229). We define our own
deterministic normalization — lowercase/casefold, dash-family and
whitespace collapse to single spaces, Greek letters spelled out, outer
punctuation stripped — available BOTH as a JVM column expression (for
index build / SQL parity) and as a plain Python function (for use inside
the Aho–Corasick pandas UDFs), with a property test asserting the two
agree byte-for-byte.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["normalize_text", "norm_text_col", "GREEK_MAP"]

#: Greek letters spelled out, mirroring gilda's treatment of e.g.
#: ``α-tocopherol`` ≡ ``alpha-tocopherol``.
GREEK_MAP = {
    "α": "alpha",
    "β": "beta",
    "γ": "gamma",
    "δ": "delta",
    "ε": "epsilon",
    "κ": "kappa",
    "λ": "lambda",
    "μ": "mu",
    "ω": "omega",
}

_DASHES = "‐‑‒–—−"  # unicode dash family → ASCII hyphen
# ASCII whitespace only: Java regex \s (used in the column expression) is
# ASCII-only by default, so the Python path must match exactly.
_WS_RE = re.compile(r"[ \t\n\r\f\v]+")
_WS_CHARS = " \t\n\r\f\v"


def normalize_text(text: str | None) -> str | None:
    """Driver/executor-side normalization (inside pandas UDFs)."""
    if text is None:
        return None
    # NFC normalization is deliberately NOT applied: it has no JVM
    # column-expression equivalent, and the two paths must agree exactly.
    s = text
    for greek, spelled in GREEK_MAP.items():
        s = s.replace(greek, spelled)
        s = s.replace(greek.upper(), spelled)
    for dash in _DASHES:
        s = s.replace(dash, "-")
    s = s.lower()
    s = s.replace("-", " ")
    s = _WS_RE.sub(" ", s).strip(_WS_CHARS)
    return s


def norm_text_col(col: Column | str) -> Column:
    """The same normalization as a JVM column expression.

    Used to key the broadcast lexical index so index build stays inside
    whole-stage codegen; must agree byte-for-byte with
    :func:`normalize_text` (tested in tests/test_functions.py).
    """
    c = F.col(col) if isinstance(col, str) else col
    out = c
    for greek, spelled in GREEK_MAP.items():
        out = F.replace(out, F.lit(greek), F.lit(spelled))
        out = F.replace(out, F.lit(greek.upper()), F.lit(spelled))
    out = F.translate(out, _DASHES, "-" * len(_DASHES))
    out = F.lower(out)
    out = F.replace(out, F.lit("-"), F.lit(" "))
    out = F.trim(F.regexp_replace(out, r"\s+", " "))
    return out
