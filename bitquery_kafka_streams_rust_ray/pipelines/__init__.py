"""Pipelines: the micro-batch streaming driver and flagship pages pipeline."""
