"""Placeholder — filled in M3."""
