"""Query plans: the per-batch augmented-diff pipeline, lineage/metrics
bookkeeping, and the resumable batch runner."""
