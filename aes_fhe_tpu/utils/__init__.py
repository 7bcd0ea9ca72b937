"""Profiling and observability utilities."""

from .profiling import Span, span_report

__all__ = ["Span", "span_report"]
