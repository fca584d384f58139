"""Structured Streaming variants of the extraction stages."""
