"""Measured-but-unwired implementations kept for future hardware.

Everything here was benchmarked against the production paths on the
tunneled v5e dev slice and lost (see PERF.md "negative results"); the
modules are kept runnable because the tradeoffs are bandwidth/overhead
ratios that can flip on full-HBM hardware:

  * bvh_pallas  — shared-scalar-cursor packet BVH walk (scalar-core
    control flow cost ~450ns/node dominates on the slice).
  * compaction  — compacted-wavefront masked shading (scatter/gather
    lowering cost exceeds the masked over-compute it avoids: 157ms vs
    41ms at 1080p baseline).
"""
