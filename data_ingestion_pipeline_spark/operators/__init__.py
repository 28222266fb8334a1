"""Relational query operators (DataFrame-first, Catalyst-optimized)."""
