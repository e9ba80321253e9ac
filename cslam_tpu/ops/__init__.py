"""JAX/Pallas compute ops: SE(3), kNN matching, Laplacian/Fiedler,
Scan Context, registration. All functions are jit-compatible, batched, and
static-shape (padded + masked) by design.
"""
