"""S9 chart rendering as dependency-free SVG (reference export/charts.py:
32-184 renders the three Counter series and the component-size histogram
with matplotlib/PNG; matplotlib is not in this container, so the renderer
emits deterministic standalone SVG — same visual artifact role, fully
golden-testable XML).

Visual spec (single-series bar charts): one categorical hue with neutral
ink for all text (values/labels never wear the series color), thin bars
with a 4px rounded data-end anchored to the baseline and ≥2px gaps,
recessive 1px gridlines behind the marks, a selective direct label on the
maximum bar only, and a native ``<title>`` tooltip per bar. A single
series needs no legend — the chart title names it. Colors are the
pre-validated reference palette instance (series blue #2a78d6 on the
#fcfcfb light surface; text #0b0b0b / #52514e) — with one series there
are no adjacent categorical pairs to separate.
"""

from __future__ import annotations

import math
import os
from xml.sax.saxutils import escape

from pyspark.sql import DataFrame

__all__ = ["render_bar_chart_svg", "render_chart_sinks"]

_SURFACE = "#fcfcfb"
_SERIES = "#2a78d6"
_INK = "#0b0b0b"
_INK_2 = "#52514e"
_GRID = "#e5e4e0"

_W, _H = 640, 360
_M_LEFT, _M_RIGHT, _M_TOP, _M_BOTTOM = 52, 16, 48, 44


def _nice_max(value: float) -> float:
    """Smallest 1/2/5 × 10^k ≥ value (axis headroom without odd ticks).

    Non-finite inputs (inf/NaN — e.g. a degenerate series from upstream
    division) clamp to 1.0 instead of looping forever / silently yielding
    a bogus axis; render_bar_chart_svg is public API."""
    if not math.isfinite(value) or value <= 0:
        return 1.0
    exp = 0
    v = float(value)
    while v > 10:
        v /= 10
        exp += 1
    while v <= 1:
        v *= 10
        exp -= 1
    for step in (1.0, 2.0, 5.0, 10.0):
        if v <= step:
            return step * (10.0 ** exp)
    return 10.0 ** (exp + 1)


def _fmt(value: float) -> str:
    return f"{value:g}"


def _bar_path(x: float, y: float, w: float, h: float, baseline: float) -> str:
    """Rounded-top bar anchored flat to the baseline (4px data-end)."""
    r = min(4.0, w / 2, h)
    return (
        f"M{x:.2f},{baseline:.2f} "
        f"V{y + r:.2f} Q{x:.2f},{y:.2f} {x + r:.2f},{y:.2f} "
        f"H{x + w - r:.2f} Q{x + w:.2f},{y:.2f} {x + w:.2f},{y + r:.2f} "
        f"V{baseline:.2f} Z"
    )


def render_bar_chart_svg(
    items: list[tuple[str, float]], *, title: str, path: str | None = None
) -> str:
    """Render ``(label, value)`` pairs as a standalone SVG bar chart.

    Deterministic: identical input → byte-identical SVG. Returns the SVG
    text; also writes it to ``path`` when given.
    """
    plot_w = _W - _M_LEFT - _M_RIGHT
    plot_h = _H - _M_TOP - _M_BOTTOM
    baseline = _M_TOP + plot_h
    n = len(items)
    top = _nice_max(max((v for _, v in items), default=0.0))
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" viewBox="0 0 {_W} {_H}" '
        f'font-family="system-ui, sans-serif" role="img" '
        f'aria-label="{escape(title, {chr(34): "&quot;"})}">',
        f'<rect width="{_W}" height="{_H}" fill="{_SURFACE}"/>',
        f'<text x="{_M_LEFT}" y="24" font-size="16" font-weight="600" '
        f'fill="{_INK}">{escape(title)}</text>',
    ]
    # recessive grid + y tick labels (quarters of the nice max)
    for i in range(5):
        frac = i / 4
        y = baseline - frac * plot_h
        if i > 0:
            parts.append(
                f'<line x1="{_M_LEFT}" y1="{y:.2f}" x2="{_W - _M_RIGHT}" '
                f'y2="{y:.2f}" stroke="{_GRID}" stroke-width="1"/>'
            )
        parts.append(
            f'<text x="{_M_LEFT - 6}" y="{y + 4:.2f}" font-size="11" '
            f'text-anchor="end" fill="{_INK_2}">{_fmt(frac * top)}</text>'
        )
    parts.append(
        f'<line x1="{_M_LEFT}" y1="{baseline:.2f}" x2="{_W - _M_RIGHT}" '
        f'y2="{baseline:.2f}" stroke="{_INK_2}" stroke-width="1"/>'
    )
    if n:
        gap = 2.0
        slot = plot_w / n
        bar_w = min(max(slot - gap, 1.0), 48.0)
        label_every = max(1, (n + 7) // 8)  # ≤8 x labels, evenly thinned
        max_idx = max(range(n), key=lambda i: (items[i][1], -i))
        for i, (label, value) in enumerate(items):
            x = _M_LEFT + i * slot + (slot - bar_w) / 2
            h = 0.0 if top <= 0 else max(0.0, value / top) * plot_h
            y = baseline - h
            tooltip = f"{label}: {_fmt(value)}"
            parts.append(
                f'<path d="{_bar_path(x, y, bar_w, h, baseline)}" '
                f'fill="{_SERIES}"><title>{escape(tooltip)}</title></path>'
            )
            if i == max_idx and value > 0:
                # selective direct label: the maximum only, in ink not hue
                parts.append(
                    f'<text x="{x + bar_w / 2:.2f}" y="{y - 5:.2f}" '
                    f'font-size="11" text-anchor="middle" fill="{_INK}">'
                    f"{_fmt(value)}</text>"
                )
            if i % label_every == 0:
                shown = label if len(label) <= 12 else label[:11] + "…"
                parts.append(
                    f'<text x="{x + bar_w / 2:.2f}" y="{baseline + 16:.2f}" '
                    f'font-size="11" text-anchor="middle" fill="{_INK_2}">'
                    f"{escape(shown)}</text>"
                )
    parts.append("</svg>")
    text = "\n".join(parts) + "\n"
    if path is not None:
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        with open(path, "w", encoding="utf-8") as fh:
            fh.write(text)
    return text


def render_chart_sinks(
    repository: DataFrame, directory: str, *, components: DataFrame | None = None
) -> dict[str, str]:
    """Render the reference's three chart artifacts (charts.py:32-184) to
    ``{directory}/{component_sizes,prefixes,relations}.svg``.

    The distributed work is :func:`~sssom_curator_spark.export.summary.
    chart_data` (the aggregations); rendering consumes the collected
    counter dicts, which are chart-axis-sized. Returns name → file path.
    """
    from sssom_curator_spark.export.summary import chart_data

    data = chart_data(repository, components=components)
    titles = {
        "component_sizes": "Positive mapping component sizes",
        "prefixes": "Mappings per prefix (positive)",
        "relations": "Mappings per relation (positive)",
    }
    out: dict[str, str] = {}
    for name, series in data.items():
        path = os.path.join(directory, f"{name}.svg")
        render_bar_chart_svg(
            [(str(k), float(v)) for k, v in series.items()],
            title=titles[name],
            path=path,
        )
        out[name] = path
    return out
