"""Device kernels: intersections, shading, temporal filters, BVH traversal.

Each module here is the TPU-native counterpart of one GLSL module in the
reference's `shaders/rt/` tree (see module docstrings for the mapping).
"""
