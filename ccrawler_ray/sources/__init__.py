"""Sources/sinks: corpus readers, seed readers, testdata adapters."""
