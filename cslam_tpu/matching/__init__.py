"""Descriptor databases and loop-closure sparse matching."""
