"""Structured Streaming surface: windowed/sessionized event aggregation."""
