"""Plan-inspection helpers (M5)."""
