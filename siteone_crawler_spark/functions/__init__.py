"""Vectorized scalar kernels (pandas/Arrow UDFs + native column expressions)."""
