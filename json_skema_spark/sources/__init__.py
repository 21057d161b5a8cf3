"""Sources: deterministic synthetic fixtures + driver-table loaders."""
