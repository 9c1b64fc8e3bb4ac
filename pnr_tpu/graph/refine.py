"""Node-graph refinement: interpolation, mean-shift, grouping.

Parity targets (pnr-vaa3d/Advantra_plugin.cpp):
* `interpolate_nodelist` (:780-861) — insert nodes so every
  bidirectional link is at most `step` long;
* `non_blurring` (:968-1052) — per-node mean-shift over the ORIGINAL
  node positions with radius SIG2RADIUS * current sigma, iterated up
  to REFINE_ITER times or until the move^2 <= EPSILON2. The reference
  is an O(N^2)-per-iteration scalar loop; here it is a blocked
  pairwise computation on the MXU: |a-b|^2 via |a|^2+|b|^2-2ab^T and
  masked means as a mask @ P matmul, processed in row blocks to bound
  memory;
* `group1` (:1566-1642) — greedy sphere grouping, delegated to the
  native C++ runtime (grid-accelerated), followed by link remapping
  and `check_nbr`.
"""

from __future__ import annotations

from functools import partial

import numpy as np

from pnr_tpu import native
from pnr_tpu.graph.nodes import AXON, SOMA, NodeList

# jax is imported lazily (_get_mean_shift_device): every other function
# in this module is pure numpy/native, and the host one-shot engine
# (pnr_tpu.hostpath) shares them without paying the ~1.8 s jax import.


# ---------------------------------------------------------------------------
# interpolation


def interpolate_nodelist(nodes: NodeList, step: float) -> None:
    """Insert interpolated nodes on every (bidirectional) link longer
    than `step`, preserving bidirectionality (Advantra_plugin.cpp:780-861)."""
    checked = [[False] * len(n) for n in nodes.nbr]
    init_size = len(nodes)
    for i in range(1, init_size):
        for j in range(len(nodes.nbr[i])):
            if checked[i][j]:
                continue
            i1 = nodes.nbr[i][j]
            try:
                j1 = nodes.nbr[i1].index(i)
            except ValueError:
                continue
            checked[i][j] = True
            checked[i1][j1] = True

            dx = nodes.x[i1] - nodes.x[i]
            dy = nodes.y[i1] - nodes.y[i]
            dz = nodes.z[i1] - nodes.z[i]
            vnorm = float(np.sqrt(dx * dx + dy * dy + dz * dz))
            if vnorm == 0:
                continue
            vx, vy, vz = dx / vnorm, dy / vnorm, dz / vnorm
            n = int(np.ceil(vnorm / step))
            for k in range(1, n):
                t = k / float(n)
                nid = nodes.add(
                    nodes.x[i] + k * (vnorm / n) * vx,
                    nodes.y[i] + k * (vnorm / n) * vy,
                    nodes.z[i] + k * (vnorm / n) * vz,
                    vx, vy, vz,
                    corr=nodes.corr[i] + (nodes.corr[i1] - nodes.corr[i]) * t,
                    sig=nodes.sig[i] + (nodes.sig[i1] - nodes.sig[i]) * t,
                    ntype=nodes.type[i] if k <= n // 2 else nodes.type[i1],
                )
                checked.append([])
                if k == 1:
                    nodes.nbr[nid].append(i)
                    checked[nid].append(True)
                    nodes.nbr[i][j] = nid
                else:
                    nodes.nbr[nid].append(nid - 1)
                    nodes.nbr[nid - 1].append(nid)
                    checked[nid].append(True)
                    checked[nid - 1].append(True)
                if k == n - 1:
                    nodes.nbr[nid].append(i1)
                    checked[nid].append(True)
                    nodes.nbr[i1][j1] = nid


# ---------------------------------------------------------------------------
# mean-shift refinement (non-blurring)

_BLOCK = 2048


_mean_shift_device_jit = None


def _get_mean_shift_device():
    """Lazily build + jit the device mean-shift (see module docstring)."""
    global _mean_shift_device_jit
    if _mean_shift_device_jit is not None:
        return _mean_shift_device_jit
    import jax
    import jax.numpy as jnp

    @partial(jax.jit, static_argnames=("max_iter",))
    def _mean_shift_device(p4, sig2rad: float, max_iter: int, eps2: float):
        """Lockstep non-blurring mean shift.

        p4: (N, 4) float32 rows (x, y, z, sig) — the ORIGINAL kernel
        support. Returns the converged (N, 4).
        """
        n = p4.shape[0]
        pts = p4[:, :3]
        pts_norm2 = jnp.sum(pts * pts, axis=1)  # (N,)

        def one_iter(state):
            conv, active, it = state

            def block_update(c_blk):
                # c_blk: (B, 4) current estimates for a block of nodes
                cxyz = c_blk[:, :3]
                r2 = (sig2rad * c_blk[:, 3]) ** 2  # (B,)
                # PRECISION MATTERS: TPU matmuls default to bf16; with
                # coordinates ~100 the d2 error would exceed the kernel
                # radius and nodes with empty masks collapse to the origin.
                d2 = (
                    jnp.sum(cxyz * cxyz, axis=1)[:, None]
                    + pts_norm2[None, :]
                    - 2.0 * jnp.matmul(cxyz, pts.T, precision=jax.lax.Precision.HIGHEST)
                )  # (B, N) — MXU matmul, f32
                mask = (d2 <= r2[:, None]).astype(jnp.float32)
                cnt0 = jnp.sum(mask, axis=1)
                summ = jnp.matmul(mask, p4, precision=jax.lax.Precision.HIGHEST)  # (B, 4)
                nxt = summ / jnp.maximum(cnt0, 1.0)[:, None]
                # a node always covers itself, so an empty mask can only be
                # numeric cancellation in the |c|^2+|p|^2-2cp expansion at
                # extreme coordinate magnitudes — hold position instead of
                # collapsing to the origin (observed on a 12288^2 slide:
                # ulp(|p|^2) ~ 32 exceeded the kernel radius^2)
                return jnp.where(cnt0[:, None] > 0.0, nxt, c_blk)

            nblk = -(-n // _BLOCK)
            pad = nblk * _BLOCK - n
            conv_p = jnp.pad(conv, ((0, pad), (0, 0)))
            blocks = conv_p.reshape(nblk, _BLOCK, 4)
            nxt = jax.lax.map(block_update, blocks).reshape(nblk * _BLOCK, 4)[:n]

            move2 = jnp.sum((nxt[:, :3] - conv[:, :3]) ** 2, axis=1)
            new_conv = jnp.where(active[:, None], nxt, conv)
            new_active = active & (move2 > eps2)
            return new_conv, new_active, it + 1

        def cond(state):
            _, active, it = state
            return (it < max_iter) & jnp.any(active)

        conv, _, _ = jax.lax.while_loop(
            cond, one_iter, (p4, jnp.ones((n,), jnp.bool_), jnp.int32(0))
        )
        return conv

    _mean_shift_device_jit = _mean_shift_device
    return _mean_shift_device


#: Above this node count the O(N^2) blocked device kernel cedes to the
#: native grid engine: at 300k nodes one device block's (2048, N) mask
#: alone is ~2.4 GB of HBM traffic per iteration, while the grid visits
#: only each node's local density. Override with PNR_TPU_REFINE_GRID_N.
REFINE_GRID_CUTOVER = 50_000


def non_blurring(nodes: NodeList, sig2rad: float, max_iter: int, eps2: float) -> NodeList:
    """Mean-shift refine all nodes (incl. soma, as the live reference does:
    the soma exclusions in Advantra_plugin.cpp:987,1007 are commented out).

    Two engines, same reference semantics (Advantra_plugin.cpp:968-1052):
    the MXU-blocked lockstep kernel below the size cutover, and the
    native grid-binned engine above it (O(N * density), scalar-oracle
    double-precision interior — also immune to the coordinate-magnitude
    cancellation the blocked path handles by centroid-centering).
    Agreement is gated at small N in tests/test_graph.py."""
    import os

    out = nodes.copy()
    n = len(nodes)
    if n <= 1:
        return out
    p4 = np.stack(
        [
            np.asarray(nodes.x[1:], np.float32),
            np.asarray(nodes.y[1:], np.float32),
            np.asarray(nodes.z[1:], np.float32),
            np.asarray(nodes.sig[1:], np.float32),
        ],
        axis=-1,
    )
    cutover = int(os.environ.get("PNR_TPU_REFINE_GRID_N", REFINE_GRID_CUTOVER))
    if n - 1 > cutover and native.have_native():
        conv = native.mean_shift_grid(p4, float(sig2rad), int(max_iter), float(eps2))
        if conv is not None:
            out.x[1:] = conv[:, 0].astype(float).tolist()
            out.y[1:] = conv[:, 1].astype(float).tolist()
            out.z[1:] = conv[:, 2].astype(float).tolist()
            out.sig[1:] = conv[:, 3].astype(float).tolist()
            return out
    # bucket N to the next power of two so a streaming batch of stacks
    # with varying node counts does not recompile the blocked kernel per
    # stack (a fresh XLA compile costs ~5-10 s on remote runtimes —
    # observed as an erratic 'reconstruct' stage). Padding rows sit at
    # -1e6 with zero mask overlap against any real kernel radius and
    # contribute exact 0.0 terms to the masked sums, so results are
    # bitwise unchanged; their own updates converge after one iteration.
    # centroid-center the cloud before the MXU distance expansion:
    # |c|^2 + |p|^2 - 2cp cancels catastrophically once coordinates
    # reach ~4k (ulp(|p|^2) rivals the kernel radius^2 — nodes at the
    # far corner of a gigapixel slide saw ±32 of d2 noise against
    # r2 ~ 16). Centering bounds the magnitudes by the cloud's spread;
    # the kernel test is translation-invariant, so results only gain
    # accuracy.
    centroid = p4[:, :3].mean(axis=0, dtype=np.float64).astype(np.float32)
    p4[:, :3] -= centroid
    nr = p4.shape[0]
    npad = max(256, 1 << (nr - 1).bit_length()) - nr
    if npad:
        filler = np.full((npad, 4), -1.0e6, np.float32)
        filler[:, 3] = 1.0
        p4 = np.concatenate([p4, filler], axis=0)
    conv = np.array(  # copy: the device fetch can be read-only
        _get_mean_shift_device()(p4, float(sig2rad), int(max_iter), float(eps2))
    )[:nr]
    conv[:, :3] += centroid
    out.x[1:] = conv[:, 0].tolist()
    out.y[1:] = conv[:, 1].tolist()
    out.z[1:] = conv[:, 2].tolist()
    out.sig[1:] = conv[:, 3].tolist()
    return out


def non_blurring_reference(nodes: NodeList, sig2rad, max_iter, eps2) -> NodeList:
    """Scalar oracle of non_blurring (for tests)."""
    out = nodes.copy()
    n = len(nodes)
    px = np.asarray(nodes.x)
    py = np.asarray(nodes.y)
    pz = np.asarray(nodes.z)
    ps = np.asarray(nodes.sig)
    for i in range(1, n):
        conv = np.array([px[i], py[i], pz[i], ps[i]], np.float64)
        it = 0
        while True:
            r2 = (sig2rad * conv[3]) ** 2
            d2 = (px[1:] - conv[0]) ** 2 + (py[1:] - conv[1]) ** 2 + (pz[1:] - conv[2]) ** 2
            m = d2 <= r2
            cnt = m.sum()
            nxt = np.array(
                [px[1:][m].sum(), py[1:][m].sum(), pz[1:][m].sum(), ps[1:][m].sum()]
            ) / max(cnt, 1)
            move2 = np.sum((nxt[:3] - conv[:3]) ** 2)
            conv = nxt
            it += 1
            if it >= max_iter or move2 <= eps2:
                break
        out.x[i], out.y[i], out.z[i], out.sig[i] = conv.tolist()
    return out


# ---------------------------------------------------------------------------
# grouping


def group1(nodes: NodeList, rad: float) -> NodeList:
    """Greedy sphere grouping + link remap + check_nbr
    (Advantra_plugin.cpp:1566-1642)."""
    n = len(nodes)
    if n <= 1:
        return nodes.copy()
    x = np.asarray(nodes.x[1:], np.float32)
    y = np.asarray(nodes.y[1:], np.float32)
    z = np.asarray(nodes.z[1:], np.float32)
    sig = np.asarray(nodes.sig[1:], np.float32)
    corr = np.asarray(nodes.corr[1:], np.float32)
    is_soma = np.asarray([t == SOMA for t in nodes.type[1:]], np.uint8)

    group_of, groups = native.group_nodes(x, y, z, sig, corr, is_soma, rad)

    out = NodeList()
    g = len(groups)
    for gi in range(g):
        out.add(
            groups[gi, 0], groups[gi, 1], groups[gi, 2],
            corr=groups[gi, 4], sig=groups[gi, 3],
            ntype=SOMA if gi < int(is_soma.sum()) else AXON,
        )
    # accumulate remapped neighbour links of all members
    for i in range(1, n):
        gi = int(group_of[i - 1]) + 1  # group ids are 0-based; +1 for dummy
        for j in nodes.nbr[i]:
            if j == 0:
                continue
            out.nbr[gi].append(int(group_of[j - 1]) + 1)
    out.check_nbr()
    return out


def refine_blurring(nodes: NodeList, sig2rad: float, max_iter: int, eps2: float) -> NodeList:
    """Blurring mean-shift variant (Advantra_plugin.cpp:863-966, the
    alternate to `non_blurring`): all nodes shift together each global
    iteration — the kernel support is the CURRENT (moving) positions —
    soma nodes are frozen and excluded from the averages, and iteration
    stops when the largest move falls below eps2.
    """
    out = nodes.copy()
    n = len(nodes)
    if n <= 1:
        return out
    is_soma = np.asarray([t == SOMA for t in nodes.type[1:]])
    conv = np.stack(
        [
            np.asarray(nodes.x[1:], np.float64),
            np.asarray(nodes.y[1:], np.float64),
            np.asarray(nodes.z[1:], np.float64),
            np.asarray(nodes.sig[1:], np.float64),
        ],
        axis=-1,
    )
    for _ in range(max_iter):
        pts = conv[:, :3]
        r2 = (sig2rad * conv[:, 3]) ** 2
        d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
        mask = (d2 <= r2[:, None]) & (~is_soma)[None, :]
        cnt = np.maximum(mask.sum(1), 1)
        nxt = (mask[..., None] * conv[None, :, :]).sum(1) / cnt[:, None]
        nxt[is_soma] = conv[is_soma]
        move2 = ((nxt[:, :3] - conv[:, :3]) ** 2).sum(1)
        conv = nxt
        if move2.max() <= eps2:
            break
    out.x[1:] = conv[:, 0].tolist()
    out.y[1:] = conv[:, 1].tolist()
    out.z[1:] = conv[:, 2].tolist()
    out.sig[1:] = conv[:, 3].tolist()
    return out


def group0(
    nodes: NodeList, d_axial: float = 2.0, sig2rad: float = 1.0
) -> NodeList:
    """Experimental cylinder grouping (`group0`,
    Advantra_plugin.cpp:1645-1767; unused in the reference's live path,
    reproduced for completeness).

    Nodes are processed by descending correlation; each ungrouped node
    gathers its spherical neighbourhood (the reference compares SQUARED
    distances against the unsquared radius sig2rad*sig — kept), fits
    the local orientation as the largest-|lambda| eigenvector of the
    neighbourhood covariance, and absorbs the ungrouped neighbours
    whose axial distance along that orientation is <= d_axial
    (`is_cross_section`, :1054-1076), iteratively averaging position /
    sig / corr. Divergence from the literal reference: the reference's
    running average uses `+=` where `=` is clearly intended
    (:1747-1751, positions would grow without bound); the intended
    update is implemented.
    """
    n = len(nodes)
    x = np.asarray(nodes.x)
    y = np.asarray(nodes.y)
    z = np.asarray(nodes.z)
    sig = np.asarray(nodes.sig)
    corr = np.asarray(nodes.corr, np.float64)
    corr[0] = np.inf
    order = sorted(range(n), key=lambda i: -corr[i])

    out = NodeList()
    x2y = np.full(n, -1, np.int64)
    x2y[0] = 0

    for ci in order:
        if ci == 0 or x2y[ci] != -1:
            continue
        r2 = sig2rad * sig[ci]  # reference quirk: unsquared threshold
        dx = x - x[ci]
        dy = y - y[ci]
        dz = z - z[ci]
        near = (dx * dx <= r2) & (dx * dx + dy * dy <= r2) & (
            dx * dx + dy * dy + dz * dz <= r2
        )
        near[0] = False
        nci = [ci] + [j for j in np.nonzero(near)[0] if j != ci]
        if len(nci) == 1:
            x2y[ci] = out.add(
                x[ci], y[ci], z[ci], corr=float(corr[ci]), sig=sig[ci],
                ntype=nodes.type[ci],
            )
            out.nbr[x2y[ci]] = list(nodes.nbr[ci])
            continue
        pts = np.stack([x[nci], y[nci], z[nci]], axis=-1)
        mu = pts.mean(axis=0)
        cov = (pts - mu).T @ (pts - mu) / len(nci)
        w, v = np.linalg.eigh(cov)
        vdir = v[:, np.argmax(np.abs(w))]
        gi = out.add(
            x[ci], y[ci], z[ci], corr=float(corr[ci]), sig=sig[ci],
            ntype=nodes.type[ci],
        )
        out.nbr[gi] = list(nodes.nbr[ci])
        x2y[ci] = gi
        gx, gy, gz, gs, gc = x[ci], y[ci], z[ci], sig[ci], float(corr[ci])
        cnt = 1.0
        for j in nci[1:]:
            if x2y[j] != -1:
                continue
            da = (x[j] - x[ci]) * vdir[0] + (y[j] - y[ci]) * vdir[1] + (
                z[j] - z[ci]
            ) * vdir[2]
            if abs(da) > d_axial:
                continue
            x2y[j] = gi
            cnt += 1.0
            a = (cnt - 1.0) / cnt
            b = 1.0 / cnt
            gx = a * gx + b * x[j]
            gy = a * gy + b * y[j]
            gz = a * gz + b * z[j]
            gs = a * gs + b * sig[j]
            gc = a * gc + b * corr[j]
            out.nbr[gi].extend(nodes.nbr[j])
        out.x[gi], out.y[gi], out.z[gi] = float(gx), float(gy), float(gz)
        out.sig[gi], out.corr[gi] = float(gs), float(gc)

    # remap neighbour links into group space and repair
    for i in range(1, len(out)):
        out.nbr[i] = [int(x2y[j]) for j in out.nbr[i] if x2y[j] > 0]
    out.check_nbr()
    return out
