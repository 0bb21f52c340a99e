"""Observability, timers, checkpointing."""
