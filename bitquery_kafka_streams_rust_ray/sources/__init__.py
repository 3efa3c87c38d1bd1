"""Sources: deterministic synthetic pages/host_metadata generators + readers."""
