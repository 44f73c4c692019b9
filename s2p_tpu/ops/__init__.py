"""Device compute kernels (JAX / Pallas): warps, census, SGM, SIFT, splats."""
