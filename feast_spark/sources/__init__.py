"""Data sources & sinks: layout, manifest-pruned scans, streaming."""
