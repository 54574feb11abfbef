"""Streaming operators (M4)."""
