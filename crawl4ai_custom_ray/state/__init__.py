"""Checkpoint manifests, lineage and metrics tables."""
