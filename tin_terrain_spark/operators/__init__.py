"""DataFrame-level operators — the distributed realization of
SURVEY.md §2's operator inventory."""
