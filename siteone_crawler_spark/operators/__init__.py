"""Frontier-engine operators: ordering, seen-set, candidate pipeline,
politeness, dedup family, similarity search, analyzer aggregations."""
