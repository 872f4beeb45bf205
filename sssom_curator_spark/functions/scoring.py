"""Entity-link match scoring (SURVEY.md C2) — vectorized, deterministic.

The reference scores lexical matches with gilda's scorer
(predict/lexical.py:247-253; asymmetry FIXME noted at :251) and rounds
confidence to 3 places (:253,302). The north rule replaces that with a
logistic combination of explicit lexical-mapping features: token Jaccard,
common-prefix/suffix ratios, exact-normalized-equality, length ratio, and
(when available) embedding cosine.

Scale posture: ``lexical_features`` iterates pairs inside the Arrow batch
(set ops + affix scans are per-pair by nature), so its CALLERS must feed
it dimension-sized inputs only — the mention path scores once per
lexical-index row and the confidence rides the broadcast join
(``operators/grounding.py``), and the candidate path scores all-by-all
pairs (index-bucket-sized). It is never applied per corpus row.

Orientation is preserved: ``query`` is the subject/source side, ``candidate``
the lexical-index (object/target) hit, so the asymmetric features match the
reference's subject=source, object=index-hit convention.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["SCORING_WEIGHTS", "lexical_features", "score_match_batch", "confidence_band"]

#: Fixed logistic-regression weights (feature order below). Deterministic
#: constants — a stand-in for the reference's trained gilda scorer; tuned so
#: exact normalized matches score ≈0.95+ and weak partial matches fall
#: under the 0.65 default cutoff (predict/embedding.py:53-54).
SCORING_WEIGHTS = {
    "bias": -4.0,
    "exact": 5.5,
    "jaccard": 3.0,
    "prefix": 1.5,
    "suffix": 1.0,
    "len_ratio": 1.0,
    "cosine": 2.0,
}

_FEATURES = ["exact", "jaccard", "prefix", "suffix", "len_ratio", "cosine"]


def _common_affix_ratio(a: str, b: str, *, suffix: bool) -> float:
    if not a or not b:
        return 0.0
    if suffix:
        a, b = a[::-1], b[::-1]
    n = min(len(a), len(b))
    i = 0
    while i < n and a[i] == b[i]:
        i += 1
    return i / max(len(a), len(b))


def lexical_features(query: pd.Series, candidate: pd.Series) -> pd.DataFrame:
    """Per-pair feature frame over normalized-text batches."""
    rows = []
    for q, c in zip(query.fillna(""), candidate.fillna("")):
        qt, ct = set(q.split()), set(c.split())
        union = qt | ct
        rows.append(
            (
                1.0 if q == c and q else 0.0,
                (len(qt & ct) / len(union)) if union else 0.0,
                _common_affix_ratio(q, c, suffix=False),
                _common_affix_ratio(q, c, suffix=True),
                (min(len(q), len(c)) / max(len(q), len(c))) if q and c else 0.0,
            )
        )
    return pd.DataFrame(rows, columns=_FEATURES[:-1], index=query.index)


def score_match_batch(
    query: pd.Series,
    candidate: pd.Series,
    cosine: pd.Series | None = None,
) -> pd.Series:
    """Logistic score over a batch, rounded to 3 places (C3 semantics).

    ``cosine`` is optional embedding similarity for the combined
    lexical+embedding confidence (SURVEY.md §7 step 5).
    """
    feats = lexical_features(query, candidate)
    feats["cosine"] = (
        cosine.fillna(0.0).astype(float) if cosine is not None else 0.0
    )
    z = np.full(len(feats), SCORING_WEIGHTS["bias"])
    for name in _FEATURES:
        z = z + SCORING_WEIGHTS[name] * feats[name].to_numpy()
    return pd.Series(np.round(1.0 / (1.0 + np.exp(-z)), 3), index=query.index)


def confidence_band(col) -> "Column":
    """C11 confidence banding for presentation (reference renders the
    prediction progress bar green/yellow/red at >85% / >60% / else —
    web/templates/home.html:7-15 ``progress_color``). JVM-side
    ``when`` chain; null confidence yields null band."""
    from pyspark.sql import functions as F

    c = F.col(col) if isinstance(col, str) else col
    # the reference truncates to int percent BEFORE comparing
    # (`((confidence | float) * 100) | int`), so 0.855 → 85 → warning
    pct = F.floor(c * 100)
    return (
        F.when(c.isNull(), F.lit(None).cast("string"))
        .when(pct > 85, F.lit("success"))
        .when(pct > 60, F.lit("warning"))
        .otherwise(F.lit("danger"))
    )
