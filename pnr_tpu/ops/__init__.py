"""Dense image-processing ops (the reference's L2 layer, frangi.cpp/toolbox.cpp).

All ops are pure JAX array programs over (Z, Y, X)-ordered volumes,
designed to fuse under `jit` and shard under `shard_map`.

Re-exports resolve lazily (PEP 562): importing a jax-free submodule
(ops.zncc_model) must not pull the whole jax op surface — the host
one-shot engine's import budget depends on it.
"""

_EXPORTS = {
    "gaussian_kernel": "pnr_tpu.ops.gaussian",
    "imgaussian2d": "pnr_tpu.ops.gaussian",
    "imgaussian3d": "pnr_tpu.ops.gaussian",
    "imgaussian_xy": "pnr_tpu.ops.gaussian",
    "hessian2d": "pnr_tpu.ops.hessian",
    "hessian3d": "pnr_tpu.ops.hessian",
    "eigh3x3_vessel": "pnr_tpu.ops.eig3",
    "frangi2d": "pnr_tpu.ops.frangi",
    "frangi3d": "pnr_tpu.ops.frangi",
    "normalize_to_u8": "pnr_tpu.ops.frangi",
    "imdilate_xy": "pnr_tpu.ops.morphology",
    "imerode_xy": "pnr_tpu.ops.morphology",
    "imerode_xyz": "pnr_tpu.ops.morphology",
    "histogram256": "pnr_tpu.ops.thresholds",
    "intermodes_th": "pnr_tpu.ops.thresholds",
    "maxentropy_th": "pnr_tpu.ops.thresholds",
    "otsu_th": "pnr_tpu.ops.thresholds",
    "trilinear": "pnr_tpu.ops.interp",
    "ZnccTemplates": "pnr_tpu.ops.zncc_model",
    "zncc_batch": "pnr_tpu.ops.zncc",
}

__all__ = list(_EXPORTS)


def __getattr__(name):
    if name in _EXPORTS:
        import importlib

        return getattr(importlib.import_module(_EXPORTS[name]), name)
    raise AttributeError(name)
