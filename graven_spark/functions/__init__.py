"""Scalar/column functions: URL canonicalization, Arrow extraction UDFs,
GAV parsing, timestamp parsing (SURVEY.md §2.8)."""
