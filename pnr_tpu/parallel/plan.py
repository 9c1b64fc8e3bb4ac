"""HBM feasibility planning for sharded reconstructions.

The BASELINE north-star config includes ">2048^3 volumes sharded across
a v5e pod" — a size nobody should discover OOMs on by launching it.
`plan_sharded` computes the per-shard device-memory peak of each
pipeline stage of `reconstruction_func_sharded` from the buffer shapes
the code actually allocates, and `min_devices` inverts it: the smallest
1-D Z mesh on which a given (volume, config) fits a chip's HBM.

All formulas are per SHARD (one device of the Z mesh; the 2-D P == 1
path shards over Y — the same slab math applies with Y in the sharded
role). Constants are anchored in measured numbers recorded in PARITY.md:

- the unfused XLA `frangi3d` jit's temp arena, from the TPU backend's
  own `compile().memory_analysis()` (measured 2026-08-19 at 25.7 Mvox:
  65.5 B/voxel for 2 sigmas, 93.2 for 3; 4.2 Mvox compiles come out
  ~30% leaner — the planner uses the conservative large-shape fit
  `10 + 28*len(sigmas)` B/voxel);
- `frangi3d_blocked` bounds that temp to one (block_z + 2*halo) slab;
- the tube likelihood field is 3 convolution maps per sigma
  (`ops/zncc_fast.build_tube_maps_packed`): 12 * len(sigmas) B/voxel
  f32, or 6 * len(sigmas) bfloat16 once the f32 field would exceed
  4 GB (the r5 scale lever — `PNRConfig.tube_map_dtype` auto routing,
  mirrored here), on the TRACE-halo slab; the exact engine's field is
  the raw uint8 slab itself (`smc/tracker.py prepare_field`);
- stage halos: `parallel.sharded.frangi_halo` and
  `parallel.handoff.required_trace_halo`.

The estimate is deliberately a PEAK-RESIDENT model (inputs + outputs +
temp arena of the heaviest live stage), not a transfer model; XLA may
do somewhat better via buffer reuse, so `usable_fraction` (default
0.85 of HBM, leaving room for the runtime's own reservations and the
trace state) is the safety margin, and `fits` errs conservative.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

from pnr_tpu.config import PNRConfig


def _frangi_temp_b_per_vox(n_sigmas: int) -> float:
    """Temp arena of the unfused XLA frangi3d jit, per voxel.

    Fit to the TPU backend's compile().memory_analysis() at 25.7 Mvox
    (the conservative large-shape regime): 65.5 B/vox at 2 sigmas,
    93.2 at 3 — linear in sigma count.
    """
    return 10.0 + 28.0 * n_sigmas


#: J float32 + three quantized direction volumes (uint8); J8 is
#: produced after the filter jit and accounted in the seeds stage
_FRANGI_OUT_B_PER_VOX = 4.0 + 3.0
#: J8 + three direction volumes kept live through seeds/tracing
_SEED_MAPS_B_PER_VOX = 4.0
#: per-lane particle-filter state (pos/dir/weights/keys, float32)
_TRACE_STATE_B_PER_LANE_PARTICLE = 64.0

V5E_HBM_GB = 16.0


@dataclasses.dataclass(frozen=True)
class ShardPlan:
    """Per-shard memory plan for one (volume, config, mesh) choice."""

    shape: Tuple[int, int, int]
    n_devices: int
    stages: Dict[str, int]  # stage name -> peak bytes per shard
    hbm_bytes: int
    usable_fraction: float

    @property
    def peak_bytes(self) -> int:
        return max(self.stages.values())

    @property
    def peak_stage(self) -> str:
        return max(self.stages, key=self.stages.get)

    @property
    def fits(self) -> bool:
        return self.peak_bytes <= self.hbm_bytes * self.usable_fraction

    def summary(self) -> str:
        gib = 1 << 30
        lines = [
            f"volume {self.shape} over {self.n_devices} device(s), "
            f"HBM {self.hbm_bytes / gib:.0f} GiB "
            f"(usable {self.usable_fraction:.0%}):"
        ]
        for name, b in sorted(self.stages.items(), key=lambda kv: -kv[1]):
            lines.append(f"  {name:<28s} {b / gib:7.2f} GiB/shard")
        verdict = "fits" if self.fits else "DOES NOT FIT"
        lines.append(
            f"  peak = {self.peak_stage} -> {self.peak_bytes / gib:.2f} "
            f"GiB/shard: {verdict}"
        )
        return "\n".join(lines)


def _shard_extent(axis_len: int, n: int) -> int:
    # reconstruction_func_sharded replicate-pads the sharded axis to a
    # mesh multiple (_pad_axis_replicate)
    return -(-axis_len // n)


def plan_sharded(
    shape: Tuple[int, int, int],
    cfg: PNRConfig,
    n_devices: int,
    hbm_gb: float = V5E_HBM_GB,
    usable_fraction: float = 0.85,
    stage_iters: int = 8,
    blocked_frangi: Optional[bool] = None,
    frangi_block_z: int = 32,
) -> ShardPlan:
    """Per-shard HBM plan of `reconstruction_func_sharded`.

    `blocked_frangi=None` picks whichever filter variant fits (the
    plain jit when its temp arena fits, else the Z-blocked one);
    True/False forces the choice. `stage_iters` matches the driver's
    knob (larger = bigger trace halo).
    """
    z, y, x = (int(s) for s in shape)
    is2d = z == 1
    axis_len = y if is2d else z  # the sharded axis (Y for P == 1)
    plane = (z * x) if is2d else (y * x)  # voxels per sharded slice

    if is2d:
        from pnr_tpu.parallel.sharded import frangi2d_halo

        hf = frangi2d_halo(cfg.sigmas)
    else:
        from pnr_tpu.parallel.sharded import frangi_halo

        hf = frangi_halo(cfg.sigmas, cfg.zdist)
    from pnr_tpu.parallel.handoff import required_trace_halo

    ht = required_trace_halo(cfg, stage_iters)

    ext = _shard_extent(axis_len, n_devices)
    vox = ext * plane  # owned voxels per shard
    slab_f = (ext + 2 * hf) * plane  # frangi halo slab
    slab_t = (ext + 2 * ht) * plane  # trace halo slab

    stages: Dict[str, int] = {}

    # --- filter: input slab (u8) + outputs + the jit's temp arena.
    # Mirrors the code's actual engine choice (parallel/sharded.py,
    # pipeline/reconstruct.py): plain monolithic jit up to 80 Mvox per
    # slab; above that the 2-axis aligned-window tiler when pick_blocks
    # finds divisors, else the Z-only streaming variant.
    temp_vox = _frangi_temp_b_per_vox(len(cfg.sigmas))
    # the filter computes on the halo slab (outputs are slab-sized
    # before the crop)
    out_b = slab_f + _FRANGI_OUT_B_PER_VOX * slab_f
    usable = hbm_gb * (1 << 30) * usable_fraction
    slab_shape = (
        (slab_f // plane, z, x) if is2d else (slab_f // plane, y, x)
    )
    tiled_blocks = None
    if blocked_frangi is None:
        blocked_frangi = slab_f > 80_000_000
    if blocked_frangi and not is2d:
        from pnr_tpu.ops.frangi_blocked import (
            frangi_halo_y,
            frangi_halo_z,
            pick_blocks,
        )

        tiled_blocks = pick_blocks(slab_shape, cfg.sigmas, cfg.zdist)
    elif blocked_frangi and is2d:
        from pnr_tpu.ops.frangi_blocked import frangi_halo_y, pick_blocks_2d

        tiled_blocks = pick_blocks_2d((slab_shape[0], x), cfg.sigmas)
    if not blocked_frangi:
        name = "frangi"
        temp = temp_vox * slab_f
    elif tiled_blocks is not None:
        # 2-axis fori-loop tiler: outputs are written in place into the
        # loop carries, so temp is ONE tile's arena regardless of
        # volume size. Calibrated against the v5e executable's
        # memory_analysis: (150, 2048, 2048) measured 6.82 GiB total
        # vs 7.6 modeled; (1024, 1024, 1024) measured 10.12 vs 10.9
        # (+8-11% conservative).
        bz, by = tiled_blocks
        hy2 = 2 * frangi_halo_y(cfg.sigmas)
        if is2d:  # (block_y, block_x) over the (Y, X) slab plane
            tile_vox = (min(bz, slab_shape[0]) + hy2) * (min(by, x) + hy2)
        else:
            tile_vox = (
                (min(bz, slab_shape[0])
                 + 2 * frangi_halo_z(cfg.sigmas, cfg.zdist))
                * (min(by, y) + hy2) * x
            )
        temp = temp_vox * tile_vox
        name = f"frangi (tiled, bz={bz}, by={by})"
    else:
        # Z-only streaming: temp is one (bz + 2*halo) plane run of the
        # monolithic jit. Measured on v5e at 4.2-Mvox planes: the REAL
        # executable needs 14-19 GiB temp at bz 4-16 (the compiler holds
        # ~2 tiles live) — model 2 live tiles, which is why pod-scale
        # planes route to the tiled variant above.
        for bz in (32, 16, 8, 4, 2, 1):
            frangi_block_z = bz
            if (
                out_b + 2 * temp_vox * (bz + 2 * hf) * plane <= usable
            ):
                break
        temp = 2 * temp_vox * (frangi_block_z + 2 * hf) * plane
        name = f"frangi (Z-blocked, bz={frangi_block_z})"
    stages[name] = int(out_b + temp)

    # --- seeds: J8 + direction maps live; the flood runs on host —
    # single-process fetches J8, multi-process floods each shard's own
    # slab (no gather, no device working set beyond the live maps)
    stages["seeds"] = int(slab_f + _SEED_MAPS_B_PER_VOX * vox)

    # --- likelihood field + tracing: the field lives on the TRACE halo
    # slab next to the u8 slab it was built from; J8/dir maps stay live
    # for the commit bookkeeping
    if cfg.zncc_mode == "tube":
        # mirror BatchedTracker.prepare_field's routing: the bfloat16
        # field (6*S B/voxel, r5 scale lever) kicks in when the f32
        # field would exceed 4 GB (or tube_map_dtype forces it)
        bpv = 12.0 * len(cfg.sigmas)
        pref = getattr(cfg, "tube_map_dtype", "auto")
        if pref == "bf16" or (pref == "auto" and bpv * slab_t > 4 * (1 << 30)):
            bpv = 6.0 * len(cfg.sigmas)
        field_b = bpv * slab_t
    else:  # exact engine samples the raw volume
        field_b = 1.0 * slab_t
    lanes = max(64, cfg.wave_size)
    state_b = lanes * cfg.np * _TRACE_STATE_B_PER_LANE_PARTICLE
    stages[f"tracing ({cfg.zncc_mode})"] = int(
        field_b + slab_t + _SEED_MAPS_B_PER_VOX * vox + state_b
    )

    return ShardPlan(
        shape=(z, y, x),
        n_devices=n_devices,
        stages=stages,
        hbm_bytes=int(hbm_gb * (1 << 30)),
        usable_fraction=usable_fraction,
    )


def min_devices(
    shape: Tuple[int, int, int],
    cfg: PNRConfig,
    hbm_gb: float = V5E_HBM_GB,
    max_devices: int = 8192,
    **kw,
) -> ShardPlan:
    """Smallest power-of-two Z mesh on which (shape, cfg) fits.

    Raises ValueError when even one-slice-per-shard shards don't fit —
    the per-slice plane itself is the irreducible resident (the Z-mesh
    can't shard within a slice); the message says which stage binds.
    """
    n = 1
    while True:
        plan = plan_sharded(shape, cfg, n, hbm_gb=hbm_gb, **kw)
        if plan.fits:
            return plan
        axis_len = shape[1] if shape[0] == 1 else shape[0]
        if n >= max_devices or _shard_extent(axis_len, n) == 1:
            raise ValueError(
                f"volume {tuple(shape)} cannot fit {hbm_gb:.0f} GiB HBM on "
                f"a 1-D mesh (tried up to {n} devices; binding stage: "
                f"{plan.peak_stage} at {plan.peak_bytes / (1 << 30):.2f} "
                "GiB/shard). The slab's per-slice plane is the "
                "irreducible resident — reduce sigmas (smaller halos), "
                "use zncc_mode='exact' (no tube maps), or tile the plane."
            )
        n *= 2
