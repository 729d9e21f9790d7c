"""Vectorized geometry / optimization / signal ops (JAX)."""
