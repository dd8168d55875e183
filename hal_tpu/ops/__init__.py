"""Traversal/analysis ops over the columnar alignment model.

Host reference implementations live alongside batched JAX/Pallas versions;
tests cross-check them. Layout:

  validate     — vectorized structural invariants (reference api/impl/halValidate.cpp)
  segmap_host  — clear per-interval segment mapper (reference halSegmentMapper.cpp)
  segmap       — batched JAX liftover kernel
  column       — column engine for MAF/depth/SNP extraction
"""
