"""Query library: the reference's canonical query set (SURVEY.md §2.3) plus the
large-scale training-data-pipeline extensions, each with a DuckDB oracle."""
