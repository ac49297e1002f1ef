"""Structured-Streaming flavor of the polling loop (SURVEY §2.8)."""
