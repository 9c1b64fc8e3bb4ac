"""Shared phantom + config for the multi-process tests: the child
processes and the in-process reference run must reconstruct the SAME
input with the SAME parameters for the bitwise comparison to mean
anything."""

import numpy as np

from pnr_tpu.config import PNRConfig

MP_CFG = PNRConfig(
    sigmas=(2.0, 3.0), somaradius=4, tolerance=10.0, znccth=0.4, kappa=2.0,
    step=2, ni=16, np=8, zdist=2.0, nodepervol=4, vol=9, wave_size=16,
    zncc_mode="tube", tree_size_min=3,
)


MP_CFG_2D = PNRConfig(
    sigmas=(2.0,), tolerance=10.0, znccth=0.4, kappa=2.0, step=2,
    ni=16, np=8, zdist=2.0, nodepervol=4, vol=9, wave_size=16,
    zncc_mode="tube", tree_size_min=3,
)


def mp_phantom_2d() -> np.ndarray:
    """Single-slice (1, Y, X) image — the reference's first-class 2-D
    path; Y = 50 does not divide 8, exercising the Y replicate-pad."""
    shape_yx = (50, 56)
    rng = np.random.default_rng(1)
    y, x = np.meshgrid(np.arange(shape_yx[0]), np.arange(shape_yx[1]),
                       indexing="ij")
    img = 200.0 * np.exp(-((y - 25) ** 2) / (2 * 2.5**2)) * (
        0.7 + 0.3 * np.sin(x / 4.0)
    ) * (x > 6) * (x < 50)
    return np.clip(
        img + rng.normal(0, 5, shape_yx), 0, 255
    ).astype(np.uint8)[None]


def mp_phantom() -> np.ndarray:
    """Soma blob + bounded tube, (16, 32, 56) = 8 shards x 2 slices —
    the dryrun phantom geometry (__graft_entry__.py), which reliably
    yields a non-trivial traced tree at MP_CFG."""
    shape = (16, 32, 56)
    rng = np.random.default_rng(0)
    z, y, x = np.meshgrid(*[np.arange(s) for s in shape], indexing="ij")
    zc = shape[0] / 2
    soma = 240.0 * np.exp(
        -((x - 10) ** 2 + (y - 16) ** 2 + ((z - zc) * 2.0) ** 2) / (2 * 4.5**2)
    )
    tube = 190.0 * np.exp(
        -((y - 16) ** 2 + ((z - zc) * 2.0) ** 2) / (2 * 2.5**2)
    ) * (x > 14) * (x < 50)
    return np.clip(soma + tube + rng.normal(0, 5, shape), 0, 255).astype(np.uint8)
