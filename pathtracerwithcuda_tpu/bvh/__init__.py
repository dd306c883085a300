from pathtracerwithcuda_tpu.bvh.build_sah import build_sah_bvh
from pathtracerwithcuda_tpu.bvh.flatten import FlatBVH, concatenate_bvhs, refit_affine

__all__ = ["build_sah_bvh", "FlatBVH", "concatenate_bvhs", "refit_affine"]
