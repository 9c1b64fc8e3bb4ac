"""Dense image-processing ops (the reference's L2 layer, frangi.cpp/toolbox.cpp).

All ops are pure JAX array programs over (Z, Y, X)-ordered volumes,
designed to fuse under `jit` and shard under `shard_map`.
"""

from pnr_tpu.ops.gaussian import gaussian_kernel, imgaussian2d, imgaussian3d, imgaussian_xy
from pnr_tpu.ops.hessian import hessian2d, hessian3d
from pnr_tpu.ops.eig3 import eigh3x3_vessel
from pnr_tpu.ops.frangi import frangi2d, frangi3d, normalize_to_u8
from pnr_tpu.ops.morphology import imdilate_xy, imerode_xy, imerode_xyz
from pnr_tpu.ops.thresholds import histogram256, intermodes_th, maxentropy_th, otsu_th
from pnr_tpu.ops.interp import trilinear
from pnr_tpu.ops.zncc import ZnccTemplates, zncc_batch

__all__ = [
    "gaussian_kernel",
    "imgaussian2d",
    "imgaussian3d",
    "imgaussian_xy",
    "hessian2d",
    "hessian3d",
    "eigh3x3_vessel",
    "frangi2d",
    "frangi3d",
    "normalize_to_u8",
    "imerode_xy",
    "imerode_xyz",
    "imdilate_xy",
    "histogram256",
    "maxentropy_th",
    "otsu_th",
    "intermodes_th",
    "trilinear",
    "ZnccTemplates",
    "zncc_batch",
]
