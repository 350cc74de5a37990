"""Sources/sinks: deterministic generator + table-format seam."""
