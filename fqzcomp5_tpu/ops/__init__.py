"""Device (JAX/XLA/Pallas) compute kernels."""
