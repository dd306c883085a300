"""Mesh axis names (dependency-free so both render.wavefront and
parallel.mesh can import them without a package cycle)."""

RAY_AXIS = "rays"
SAMPLE_AXIS = "spp"
