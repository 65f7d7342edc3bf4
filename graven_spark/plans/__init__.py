"""Logical round plans & the iterative crawl driver (SURVEY.md §3.1-3.3)."""
