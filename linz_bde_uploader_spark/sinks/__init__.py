"""Staging + target-table sinks (reference S4/S5)."""
