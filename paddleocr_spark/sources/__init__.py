"""Deterministic corpus synthesis (the `pages` table) from the driver's
testdata parquet — no external data, seeded by row keys."""
