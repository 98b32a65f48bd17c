"""Vendored public data snapshots (public-suffix list subset)."""
