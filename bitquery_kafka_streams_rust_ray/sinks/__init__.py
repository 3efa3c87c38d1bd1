"""Sinks: exactly-once two-phase-commit Parquet output."""
