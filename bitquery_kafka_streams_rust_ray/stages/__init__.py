"""Dataset-level operators: dedup, windows, joins, near-dup, ANN, multimodal."""
