"""Flax/JAX perception models: CosPlace/EigenPlaces-style global
descriptors, NetVLAD, Scan Context."""
