"""Keyed state stores and watermark tracking for the streaming pipeline."""
