"""Source/sink layer (SURVEY.md §2.1).

File-based scans with the reference's ingestion disciplines — delimiter
sniffing, header-signature grouping, snake_case normalization,
latest-export selection, recursive lookup — plus partitioned parquet /
CTAS sinks and append-only log tables.
"""
