"""Batched sequential-Monte-Carlo neurite tracer.

Parity target: `Tracker::trackPos`/`iter0New`/`iterINew`
(pnr-vaa3d/tracker.cpp:825-933, 1001-1198). The reference advances one
trace at a time, one particle loop per iteration, with `srand(time)`
re-seeded every iteration. This implementation is the TPU redesign
(SURVEY.md §7 step 3): a whole wave of traces advances in lockstep —
`vmap` over traces, `lax.scan` over iterations, masked termination —
with keyed, reproducible PRNG (jax.random) instead of the reference's
irreproducible stream.

Per iteration and particle:
* transition: pick the prior row by the nearest codebook direction of
  the (possibly resampled) parent particle, draw one offset by inverse
  CDF over the row's cumulative weights, move, adopt the offset's unit
  direction (iterINew :1104-1132); iteration 0 instead draws all
  particles systematically from the isotropic cloud around the seed
  with the seed's direction (iter0New :1009-1033);
* weight: prev * (prior / sum prior) * exp(Kc * zncc), normalized;
  Neff = 1 / sum w^2 (:1140-1159);
* estimate: weighted centroid of positions/directions; the emitted
  radius and correlation come from the ZNCC at the centroid — the
  reference overwrites the centroid's sig with the argmax sigma via
  the by-reference out-param (zncc2 call :1072, :1177);
* stop: centroid rounds out of bounds or corr < znccth (:1180-1184);
* systematic resampling when Neff/np < neff_ratio (:1187-1195).

Soma/density suppression is NOT part of the device loop: the particle
evolution never reads the mutable maps, so traces are computed
speculatively in waves and truncated/committed sequentially on host
(pnr_tpu.pipeline), which reproduces the reference's first-come-first-
served semantics exactly while keeping the hot math on the TPU.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pnr_tpu.config import PNRConfig
from pnr_tpu.smc.priors import PriorTables, build_prior_tables
from pnr_tpu.ops.zncc import ZnccTemplates, make_zncc_fn


def _round_half_away(x: jax.Array) -> jax.Array:
    """C++ round(): half away from zero (jnp.round is half-to-even)."""
    return jnp.where(x >= 0, jnp.floor(x + 0.5), jnp.ceil(x - 0.5))


def _systematic_indices(csw: jax.Array, u0: jax.Array, n: int) -> jax.Array:
    """Systematic (stratified) sampling: indices of csw bins for (i + u0)/n."""
    ui = (jnp.arange(n, dtype=jnp.float32) + u0) / n
    return jnp.clip(jnp.searchsorted(csw, ui, side="left"), 0, csw.shape[0] - 1)


@dataclasses.dataclass
class TraceResult:
    """Per-wave trace estimates, host-side numpy."""

    pos: np.ndarray  # (T, ni, 3) centroid positions (x, y, z)
    dir: np.ndarray  # (T, ni, 3) unit directions
    sig: np.ndarray  # (T, ni) radius estimates (argmax-sigma of centroid zncc)
    corr: np.ndarray  # (T, ni) centroid correlations
    valid: np.ndarray  # (T, ni) bool — estimate survives the stop criteria


class BatchedTracker:
    """Lockstep SMC tracer for a fixed config and volume geometry."""

    def __init__(self, cfg: PNRConfig, is2d: bool):
        self.cfg = cfg
        self.is2d = is2d
        self.tables: PriorTables = build_prior_tables(cfg.step, cfg.kappa, cfg.zdist, is2d)
        self.templates = ZnccTemplates(cfg.sigmas, is2d)
        self._field_packed = False
        if cfg.zncc_mode == "tube":
            from pnr_tpu.ops.zncc_fast import (
                TubeZnccModel,
                build_tube_maps_packed,
                make_tube_patch_engine,
                make_tube_zncc_fn,
            )

            model = TubeZnccModel(cfg.sigmas, is2d)
            self._zncc = make_tube_zncc_fn(model)
            # gather-free per-trace-patch engine for the wave hot loop;
            # the global gather fn above stays for scattered queries
            # (seed scoring) where there is no cluster structure. The
            # field is the PACKED (S, Z, Y, 3X) map stack — extract
            # slices are the MXU operands directly (no per-iteration
            # channel-pack transpose).
            self._patch_engine = make_tube_patch_engine(
                model, cfg.step, cfg.zdist, reuse=cfg.patch_reuse
            )
            from pnr_tpu.ops.zncc_fast import build_tube_maps_packed_blocked

            s_count = len(cfg.sigmas)
            dtype_pref = cfg.tube_map_dtype

            def _prep(im):
                # static trace-time routing on the volume shape: the f32
                # monolithic build's temp arena (~100 B/voxel) and the
                # f32 field (12*S B/voxel) both cap near ~250-350
                # Mvox/chip; beyond a 4-GB f32 field, auto switches to
                # the Z-streamed bfloat16 field (O(block) arena, 6*S
                # B/voxel — measured 1.8e-3 corr err / 0.13% sigma
                # flips). bf16/f32 force an engine.
                size = 1
                for d in im.shape[-3:]:
                    size *= int(d)
                f32_field_bytes = 12 * s_count * size
                use_bf16 = dtype_pref == "bf16" or (
                    dtype_pref == "auto" and f32_field_bytes > 4 * (1 << 30)
                )
                # adaptive block: ~0.8 GB of per-block f32 slab temps
                plane = int(im.shape[-1]) * int(im.shape[-2])
                bz = max(8, min(64, int(0.8e9 / max(1, plane * 4 * 7))))
                if use_bf16:
                    return build_tube_maps_packed_blocked(
                        im, model, dtype=jnp.bfloat16, block_z=bz
                    )
                if size > 100_000_000:
                    # f32 field fits but the monolithic build arena
                    # would not: stream the build, keep the f32 field
                    return build_tube_maps_packed_blocked(
                        im, model, dtype=jnp.float32, block_z=bz
                    )
                return build_tube_maps_packed(im, model)

            self._prepare_field = jax.jit(_prep)
            self._field_is_maps = True
            self._field_packed = True
        else:
            self._zncc = make_zncc_fn(self.templates)
            import os

            if os.environ.get("PNR_TPU_EXACT_ENGINE", "1") != "0":
                # Pallas per-trace-patch engine: full-sample-count znccBBB
                # restructured for the MXU (ops/zncc_exact.py). The field
                # is the raw volume with a leading channel axis so the
                # map-stack calling conventions apply unchanged.
                from pnr_tpu.ops.zncc_exact import make_exact_patch_engine

                self._patch_engine = make_exact_patch_engine(
                    self.templates, cfg.step, hi_lo=cfg.zncc_exact_hilo
                )
                self._prepare_field = (
                    lambda im: jnp.asarray(im)[None] if im.ndim == 3 else im
                )
                self._field_is_maps = True
                self.STAGE_ITERS = 8
            else:
                self._patch_engine = None
                self._prepare_field = lambda im: im
                self._field_is_maps = False

        t = self.tables
        self._p = jnp.asarray(t.p)
        self._u = jnp.asarray(t.u)
        self._w0 = jnp.asarray(t.w0)
        self._w0_cws = jnp.asarray(t.w0_cws)
        self._v = jnp.asarray(t.v)
        self._w = jnp.asarray(t.w)
        self._w_cws = jnp.asarray(t.w_cws)

        init_fn, stage_fn = self._build_trace_wave()
        self._trace_init = jax.jit(init_fn)
        self._trace_stage = jax.jit(stage_fn)

    def prepare_field(self, img):
        """Build the likelihood field for a volume: the volume itself in
        exact mode, or the precomputed tube-ZNCC map stack in tube mode."""
        return self._prepare_field(img)

    def warm_async(self, field):
        """Pre-trace + pre-load the wave executables in a background
        thread while the caller's front half (seed flood, scoring)
        still runs.

        On a fresh process the first tracing stage pays several seconds
        of python tracing + persistent-cache executable loading even
        with every compile cached (measured ~5 s of the r5 first-stack
        cost); the front half's own waits are IO/native (GIL released),
        so this overlaps for free. Pure compute on the field — no
        state, results discarded. Returns the thread (callers may join;
        the first real wave simply blocks on jax's per-jit compile lock
        otherwise). Disable with PNR_TPU_NO_WARM_ASYNC=1."""
        import os
        import threading

        if os.environ.get("PNR_TPU_NO_WARM_ASYNC"):
            return None

        def _warm():
            try:
                t = self.TRACE_CHUNK
                sp = jnp.ones((t, 3), jnp.float32)
                sd = jnp.tile(
                    jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32), (t, 1)
                )
                keys = jax.vmap(
                    lambda i: jax.random.fold_in(jax.random.key(0), i)
                )(jnp.arange(t, dtype=jnp.uint32))
                carry, _ = self._trace_init(field, sp, sd, keys)
                self._trace_stage(
                    field, keys, carry,
                    jnp.arange(1, 1 + self.STAGE_ITERS),
                    jnp.zeros(t, jnp.bool_),
                )
            except Exception:
                pass  # warmup is advisory

        th = threading.Thread(target=_warm, daemon=True)
        th.start()
        return th

    # ------------------------------------------------------------------
    def _build_trace_wave(self):
        """Explicitly batched wave tracer.

        All arrays carry (T, P) leading dims rather than a vmapped
        per-trace program: every gather in the hot path gets 1-D
        indices and the directional-prior row lookup becomes a one-hot
        matmul on the MXU — both avoid XLA:TPU's pathological handling
        of multi-dimensional gather indices (see ops/interp.py).
        """
        cfg = self.cfg
        npart = cfg.np
        ni = cfg.ni
        kc = cfg.kc
        znccth = cfg.znccth
        neff_ratio = cfg.neff_ratio
        p_tab, u_tab = self._p, self._u
        w0_tab, w0_cws = self._w0, self._w0_cws
        v_tab, w_tab, w_cws_tab = self._v, self._w, self._w_cws
        sz = int(p_tab.shape[0])
        ndir = int(v_tab.shape[0])
        w_flat = w_tab.reshape(-1)  # (D*S,)
        zncc = self._zncc
        field_is_maps = self._field_is_maps
        field_packed = self._field_packed

        def in_bounds(cpos, shape_zyx):
            l, h, w = shape_zyx
            x1 = _round_half_away(cpos[:, 0])
            y1 = _round_half_away(cpos[:, 1])
            z1 = _round_half_away(cpos[:, 2])
            return (
                (x1 >= 0) & (x1 < w) & (y1 >= 0) & (y1 < h) & (z1 >= 0) & (z1 < l)
            )

        def flat_zncc(img, pos, dirs):
            t, p, _ = pos.shape
            corr, sig = zncc(img, pos.reshape(t * p, 3), dirs.reshape(t * p, 3))
            return corr.reshape(t, p), sig.reshape(t, p)

        # tube mode: one patch extraction feeds `patch_reuse` consecutive
        # iterations (the engine's window allowance grows by
        # (reuse-1)*step to cover the cloud's drift from the stale
        # corner). The exact engine sizes its windows for a single
        # iteration, so it stays at 1.
        reuse = (
            max(1, int(cfg.patch_reuse)) if cfg.zncc_mode == "tube" else 1
        )

        if self._patch_engine is not None:
            engine = self._patch_engine

            def eval_particles(img, pos, dirs):
                # one patch per trace, centred on the particle cloud;
                # every zncc of this iteration is evaluated inside it
                center = jnp.mean(pos, axis=1)
                patches, corner = engine.extract(img, center)
                corr, sig = engine.corr(
                    _shape_of(img), patches, corner, pos, dirs
                )
                return corr, sig, (patches, corner)

            def eval_with_ctx(img, ctx, pos, dirs):
                patches, corner = ctx
                return engine.corr(_shape_of(img), patches, corner, pos, dirs)

            def zncc_center(img, ctx, cpos, cdir):
                # the centroid lies in the particle hull — same patch
                # (a separate tight per-centroid extract measured SLOWER:
                # the second vmapped dynamic_slice costs more than
                # re-reading the CSE-shared patch)
                patches, corner = ctx
                c, s = engine.corr(
                    _shape_of(img), patches, corner,
                    cpos[:, None, :], cdir[:, None, :],
                )
                return c[:, 0], s[:, 0]

        else:

            def eval_particles(img, pos, dirs):
                corr, sig = flat_zncc(img, pos, dirs)
                return corr, sig, None

            def eval_with_ctx(img, ctx, pos, dirs):  # reuse==1: never hit
                return flat_zncc(img, pos, dirs)

            def zncc_center(img, ctx, cpos, cdir):
                return zncc(img, cpos, cdir)

        def estimate(img, ctx, pos, dirs, wgt):
            # pos/dirs (T, P, 3), wgt (T, P) -> per-trace centroid (T, 3)
            cpos = jnp.sum(wgt[..., None] * pos, axis=1)
            cdir = jnp.sum(wgt[..., None] * dirs, axis=1)
            cdir = cdir / jnp.linalg.norm(cdir, axis=-1, keepdims=True)
            ccorr, csig = zncc_center(img, ctx, cpos, cdir)
            return cpos, cdir, ccorr, csig

        def _shape_of(img):
            # the field is (Z, Y, X) in legacy exact mode, (1, Z, Y, X)
            # with the exact patch engine, (S, Z, Y, 3X) packed in tube
            # mode — the lane dim folds three channels per column there
            l, h, w = img.shape[-3:]
            return (l, h, w // 3) if field_packed else (l, h, w)

        def _uniforms(keys, step, shape):
            ks = jax.vmap(lambda k: jax.random.fold_in(k, step))(keys)
            return jax.vmap(lambda k: jax.random.uniform(k, shape[1:]))(ks)

        def trace_init(img, seed_pos, seed_dir, keys):
            # seed_pos/seed_dir (T, 3); keys (T,) PRNG keys
            # `img` is the likelihood field: the raw volume (exact mode)
            # or the precomputed map stack (tube mode)
            shape_zyx = _shape_of(img)
            t = seed_pos.shape[0]
            uniforms = lambda step, shape: _uniforms(keys, step, shape)

            # ---- iteration 0 (iter0New, tracker.cpp:1001-1094) ----
            u0 = uniforms(0, (t,))  # (T,)
            ui = (jnp.arange(npart, dtype=jnp.float32)[None, :] + u0[:, None]) / npart
            # systematic sampling by rank count: s = #\{cws < ui\} (== searchsorted left)
            s = jnp.sum(w0_cws[None, None, :] < ui[..., None], axis=-1)
            s = jnp.clip(s, 0, sz - 1)  # (T, P)
            s_flat = s.reshape(-1)
            pos = seed_pos[:, None, :] + p_tab[s_flat].reshape(t, npart, 3)
            have_dir = ~jnp.any(jnp.isnan(seed_dir), axis=-1)  # (T,)
            dirs = jnp.where(
                have_dir[:, None, None],
                jnp.broadcast_to(seed_dir[:, None, :], (t, npart, 3)),
                u_tab[s_flat].reshape(t, npart, 3),
            )
            prior = w0_tab[s_flat].reshape(t, npart)

            corr, _, ctx = eval_particles(img, pos, dirs)
            lhood = jnp.exp(kc * corr)
            wgt = (1.0 / npart) * (prior / jnp.sum(prior, axis=1, keepdims=True)) * lhood
            wgt = wgt / jnp.sum(wgt, axis=1, keepdims=True)
            neff = 1.0 / jnp.sum(wgt * wgt, axis=1)  # (T,)

            cpos, cdir, ccorr, csig = estimate(img, ctx, pos, dirs, wgt)
            ok0 = in_bounds(cpos, shape_zyx) & (ccorr >= znccth)

            resampled = neff / npart < neff_ratio
            res_u = uniforms(1, (t,))
            csw = jnp.cumsum(wgt, axis=1)
            ridx = jnp.sum(
                csw[:, None, :]
                < ((jnp.arange(npart, dtype=jnp.float32)[None, :] + res_u[:, None]) / npart)[
                    ..., None
                ],
                axis=-1,
            )
            res_idx = jnp.clip(ridx, 0, npart - 1)

            # pack the estimate into one array: each device->host fetch is
            # a full RPC round-trip on remote runtimes, so ship one buffer
            est0 = jnp.concatenate(
                [cpos, cdir, csig[:, None], ccorr[:, None], ok0[:, None].astype(jnp.float32)],
                axis=1,
            )  # (T, 9)
            carry0 = (pos, dirs, wgt, resampled, res_idx, ok0)
            return carry0, est0

        def trace_stage(img, keys, carry, iter_idx, kill):
            # ---- iterations iter_idx[0]..iter_idx[-1] (iterINew,
            # tracker.cpp:1096-1198); PRNG streams key on the ABSOLUTE
            # iteration, so staging never changes results. `kill` (T,)
            # retires traces whose committed prefix already stopped
            # (soma/density) so they cost no further compute ----
            shape_zyx = _shape_of(img)
            t = carry[0].shape[0]
            carry = carry[:5] + (carry[5] & ~kill,)

            def one_iter(carry, i, ctx):
                """One SMC iteration. With ctx=None a fresh per-trace
                patch is extracted after the transition (the start of a
                reuse group); otherwise the group's patch is reused —
                the engine's window allowance covers the cloud drift."""
                pos, dirs, wgt, resampled, res_idx, alive = carry
                u1 = _uniforms(keys, 2 * i, (t, npart))
                res_u = _uniforms(keys, 2 * i + 1, (t,))

                k1 = jnp.where(resampled[:, None], res_idx, jnp.arange(npart)[None, :])
                gather_idx = (jnp.arange(t)[:, None] * npart + k1).reshape(-1)
                base_pos = pos.reshape(t * npart, 3)[gather_idx].reshape(t, npart, 3)
                base_dir = dirs.reshape(t * npart, 3)[gather_idx].reshape(t, npart, 3)

                # nearest codebook direction, then the prior row via one-hot
                # matmul (MXU) instead of a (T, P, S) row gather
                dots = jnp.matmul(
                    base_dir.reshape(t * npart, 3), v_tab.T,
                    precision=jax.lax.Precision.HIGHEST,
                )  # (TP, D) — f32: bf16 dots can flip near-tie argmax
                vi = jnp.argmax(dots, axis=1)  # (TP,)
                onehot = jax.nn.one_hot(vi, ndir, dtype=jnp.float32)  # (TP, D)
                rows = jnp.matmul(
                    onehot, w_cws_tab, precision=jax.lax.Precision.HIGHEST
                )  # (TP, S) — f32: bf16 would quantize the CDF rows

                s = jnp.sum(rows < u1.reshape(t * npart, 1), axis=-1)
                s = jnp.clip(s, 0, sz - 1)  # (TP,)

                new_pos = base_pos + p_tab[s].reshape(t, npart, 3)
                new_dir = u_tab[s].reshape(t, npart, 3)
                prior = w_flat[vi * sz + s].reshape(t, npart)

                if ctx is None:
                    corr, _, ctx = eval_particles(img, new_pos, new_dir)
                else:
                    corr, _ = eval_with_ctx(img, ctx, new_pos, new_dir)
                lhood = jnp.exp(kc * corr)
                prev_w = jnp.where(resampled[:, None], 1.0 / npart, wgt)
                wnew = prev_w * (prior / jnp.sum(prior, axis=1, keepdims=True)) * lhood
                wnew = wnew / jnp.sum(wnew, axis=1, keepdims=True)
                neff = 1.0 / jnp.sum(wnew * wnew, axis=1)

                cpos, cdir, ccorr, csig = estimate(img, ctx, new_pos, new_dir, wnew)
                ok = in_bounds(cpos, shape_zyx) & (ccorr >= znccth)
                alive_new = alive & ok

                resampled_new = neff / npart < neff_ratio
                csw = jnp.cumsum(wnew, axis=1)
                ridx = jnp.sum(
                    csw[:, None, :]
                    < (
                        (jnp.arange(npart, dtype=jnp.float32)[None, :] + res_u[:, None])
                        / npart
                    )[..., None],
                    axis=-1,
                )
                res_idx_new = jnp.clip(ridx, 0, npart - 1)

                carry_new = (new_pos, new_dir, wnew, resampled_new, res_idx_new, alive_new)
                return carry_new, (cpos, cdir, csig, ccorr, alive_new), ctx

            def body_group(carry, ivec):
                # one extraction feeds this whole (statically unrolled)
                # group of iterations; the patch never enters the scan
                # carry — it lives only inside the group's graph
                ests = []
                ctx = None
                for j in range(ivec.shape[0]):
                    carry, est, ctx = one_iter(carry, ivec[j], ctx)
                    ests.append(est)
                return carry, tuple(jnp.stack(e, 0) for e in zip(*ests))

            n_it = int(iter_idx.shape[0])
            kr = max(1, min(reuse, n_it))
            g, rem = divmod(n_it, kr)
            parts = []
            if g:
                carry, em = jax.lax.scan(
                    body_group, carry, iter_idx[: g * kr].reshape(g, kr)
                )
                # (g, kr, T, ...) -> (g*kr, T, ...)
                parts.append(tuple(e.reshape((g * kr,) + e.shape[2:]) for e in em))
            if rem:
                carry, er = body_group(carry, iter_idx[g * kr :])
                parts.append(er)
            ests = (
                parts[0]
                if len(parts) == 1
                else tuple(jnp.concatenate(es, 0) for es in zip(*parts))
            )
            # stacked along axis 0 (iterations); move to (T, STAGE, ...)
            # and pack into one (T, STAGE, 9) buffer (single host fetch)
            cpos, cdir, csig, ccorr, ok = (jnp.moveaxis(e, 0, 1) for e in ests)
            packed = jnp.concatenate(
                [cpos, cdir, csig[..., None], ccorr[..., None], ok[..., None].astype(jnp.float32)],
                axis=2,
            )
            return carry, packed

        return trace_init, trace_stage

    #: Fixed device batch: every trace_wave launch runs at this T so only
    #: one shape ever compiles. XLA:TPU compile time/stability for the
    #: tracer graph is erratically shape-dependent (T=256 on large
    #: volumes crashed the remote worker; T=128 is validated).
    TRACE_CHUNK = 128
    #: Iterations per staged device call; between stages the (tiny) alive
    #: mask is fetched and an all-dead chunk stops early. With the patch
    #: engine an iteration costs ~5 ms at wave 128 while a launch costs
    #: ~40 ms on the remote runtime — 16 keeps launch overhead ~1/3.
    STAGE_ITERS = 16

    # ------------------------------------------------------------------
    def trace_wave(
        self,
        img: jax.Array,
        seed_pos: np.ndarray,
        seed_dir: np.ndarray,
        base_key: jax.Array,
        trace_ids: np.ndarray,
        staged: bool = True,
    ) -> TraceResult:
        """Trace a wave of seeds in lockstep; returns host-side estimates.

        seed_pos/seed_dir: (T, 3) in (x, y, z) order. trace_ids give each
        trace a stable PRNG stream (reproducible across wave shapes:
        chunking to TRACE_CHUNK never changes a trace's PRNG key).
        """
        t = len(seed_pos)
        ni = self.cfg.ni
        if t == 0:  # e.g. every seed filtered out: empty result, not a crash
            e = np.zeros((0, ni), np.float32)
            return TraceResult(
                pos=np.zeros((0, ni, 3), np.float32),
                dir=np.zeros((0, ni, 3), np.float32),
                sig=e, corr=e, valid=e > 0.5,
            )
        # pad small batches to the next power of two (bounded shape set),
        # large ones chunk at TRACE_CHUNK
        chunk = self.TRACE_CHUNK
        if t < chunk:
            chunk = 1 << max(0, (t - 1).bit_length())
        stage = self.STAGE_ITERS
        outs = []
        for beg in range(0, t, chunk):
            end = min(beg + chunk, t)
            pad = chunk - (end - beg)
            sp = np.asarray(seed_pos[beg:end], np.float32)
            sd = np.asarray(seed_dir[beg:end], np.float32)
            ids = np.asarray(trace_ids[beg:end], np.uint32)
            if pad:
                sp = np.concatenate([sp, np.repeat(sp[:1], pad, 0)], 0)
                sd = np.concatenate([sd, np.repeat(sd[:1], pad, 0)], 0)
                ids = np.concatenate([ids, np.zeros(pad, np.uint32)])
            keys = jax.vmap(lambda i: jax.random.fold_in(base_key, i))(
                jnp.asarray(ids, jnp.uint32)
            )
            # Staged execution with early exit: most traces die long
            # before ni iterations (corr < znccth / out of bounds), so
            # run STAGE_ITERS at a time and stop the chunk when every
            # trace is dead. PRNG keys on absolute iteration indices, so
            # results are identical to a monolithic run. On runtimes with
            # high per-launch latency, staged=False runs each chunk in
            # two launches instead (no early exit).
            carry, est0 = self._trace_init(img, jnp.asarray(sp), jnp.asarray(sd), keys)
            blocks = [np.asarray(est0)[:, None, :]]  # (T, 1, 9)
            it = 1
            step = stage if staged else max(1, ni - 1)
            while it < ni:
                n_it = min(step, ni - it)
                carry, packed = self._trace_stage(
                    img, keys, carry, jnp.arange(it, it + step),
                    jnp.zeros(chunk, jnp.bool_),
                )
                blk = np.asarray(packed)[:, :n_it]
                blocks.append(blk)
                it += n_it
                if staged and not blk[: end - beg, -1, 8].any():
                    break  # real lanes only: pad lanes must not keep the loop alive

            n = end - beg
            packed_all = np.concatenate(blocks, axis=1)[:n]  # (n, done, 9)
            done = packed_all.shape[1]
            if done < ni:  # keep the (T, ni) contract; the tail is invalid
                packed_all = np.pad(packed_all, ((0, 0), (0, ni - done), (0, 0)))
            outs.append(
                (
                    packed_all[:, :, 0:3],
                    packed_all[:, :, 3:6],
                    packed_all[:, :, 6],
                    packed_all[:, :, 7],
                    packed_all[:, :, 8] > 0.5,
                )
            )
        return TraceResult(
            pos=np.concatenate([o[0] for o in outs]),
            dir=np.concatenate([o[1] for o in outs]),
            sig=np.concatenate([o[2] for o in outs]),
            corr=np.concatenate([o[3] for o in outs]),
            valid=np.concatenate([o[4] for o in outs]),
        )
