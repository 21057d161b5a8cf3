"""Columnar function library: audio decode invariants, text analysis."""
