"""Swarm runtime communication: typed message schema, pub/sub bus
(in-process for tests, C++ TCP for deployment), neighbor liveness,
simulated rendezvous fault injection."""
