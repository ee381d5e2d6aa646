"""Execution plumbing: checkpointed runs, lineage and metrics tables."""
