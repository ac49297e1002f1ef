"""Metadata/control store (reference schema ``bde_control``)."""
