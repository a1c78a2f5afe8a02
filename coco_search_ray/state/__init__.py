"""Lineage manifests + checkpoint/resume helpers."""
