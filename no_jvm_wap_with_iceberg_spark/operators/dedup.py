"""Filled in by operators build-out."""
