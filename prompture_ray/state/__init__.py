"""Run state: per-partition lineage/metrics checkpoints, resume manifests."""
