"""Utilities: structured logging, profiling, checkpointing."""
