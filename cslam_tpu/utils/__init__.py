"""Shared utilities: edge containers, labeled keys, misc helpers."""
