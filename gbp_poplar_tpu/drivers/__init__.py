"""Command-line drivers mirroring the reference's `ba` and `slam` binaries."""
