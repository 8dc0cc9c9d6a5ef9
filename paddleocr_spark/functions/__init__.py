"""DataFrame builders for corpus analytics (dedup, similarity, text
quality). Each builder has a matching ANSI-SQL oracle string so the
driver can verify it against DuckDB on the same parquet tables."""
