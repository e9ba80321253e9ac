"""Budgeted loop-closure selection: MAC solver, connectivity bookkeeping,
vertex-cover brokerage."""
