"""Reusable relational/streaming operators of the engine."""
