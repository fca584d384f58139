"""Catalyst expression helpers and the engine's (small) vectorized UDF surface."""
