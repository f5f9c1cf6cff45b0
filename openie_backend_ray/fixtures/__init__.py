"""Fixture parsers and deterministic synthetic-corpus generators."""
