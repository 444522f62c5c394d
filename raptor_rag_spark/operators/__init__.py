"""DataFrame operators: chunk/embed/assign, rollups, kNN joins, dedup, text ops."""
