"""Relational operators: enrich, flags, router, aggregates, dedup, similarity."""
