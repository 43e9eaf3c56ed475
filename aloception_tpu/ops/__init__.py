"""Pure jit-compatible compute ops (jnp + Pallas kernels)."""
