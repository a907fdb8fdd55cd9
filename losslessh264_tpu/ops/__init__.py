"""JAX/Pallas pixel-domain kernels: transform, prediction, MC, deblock."""
