"""Spark column-expression helpers and their DuckDB-SQL twins."""
