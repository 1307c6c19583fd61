"""Engine operators beyond the reference surface: deduplication,
similarity search, text analysis, interval joins, sessionization —
the training-data-pipeline layer (BASELINE.json north star)."""
