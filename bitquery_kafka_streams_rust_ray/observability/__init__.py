"""Metrics, lineage counters, and Prometheus-style export."""
