"""Serialization, checkpointing, misc utilities."""
__all__ = []
