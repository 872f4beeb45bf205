"""Exports: merge sink, YAML summary, component/anomaly reports, SVG charts."""

from sssom_curator_spark.export.charts_svg import render_chart_sinks
from sssom_curator_spark.export.merge import merge_to_tsv
from sssom_curator_spark.export.summary import component_stats, summarize

__all__ = ["merge_to_tsv", "summarize", "component_stats", "render_chart_sinks"]
