"""Structured Streaming integration for the validation engine."""
