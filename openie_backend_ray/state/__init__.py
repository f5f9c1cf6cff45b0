"""Checkpointing, lineage, and broadcast-state helpers."""
