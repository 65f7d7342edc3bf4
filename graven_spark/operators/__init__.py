"""Relational/custom operators: seen-set dedup (Bloom pre-filter + exact
anti-join), per-host politeness token buckets, scalable global FIFO ranking
(SURVEY.md §2.2-2.7)."""
