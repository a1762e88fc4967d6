"""End-to-end plans: the batch extraction pipeline + lineage/metrics sidecar."""
