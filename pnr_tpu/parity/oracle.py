"""Build + bind the compiled reference oracle.

Compiles the reference's stdlib-only compute sources
(`frangi.cpp seed.cpp tracker.cpp toolbox.cpp node.cpp` under
``/root/reference/pnr-vaa3d``) together with this package's
``oracle_api.cpp`` shim into one shared library, at test/bench time.
The reference sources stay where they are (read-only); only the ``.so``
artifact lands in a cache dir. Two Vaa3D headers the sources include but
never use (``v3d_interface.h``, ``v3d_message.h`` — the single mention is
commented out, toolbox.cpp:132) are satisfied by empty stand-ins.

If the reference tree or a compiler is unavailable, :func:`get_oracle`
returns ``None`` and parity tests skip.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SHIM = os.path.join(_HERE, "oracle_api.cpp")
REF_DIR = os.environ.get("PNR_REFERENCE_DIR", "/root/reference/pnr-vaa3d")
_REF_SOURCES = ("frangi.cpp", "seed.cpp", "tracker.cpp", "toolbox.cpp", "node.cpp")
_BUILD_DIR = os.path.join(
    os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
    "pnr_tpu_oracle",
)
_LIB_PATH = os.path.join(_BUILD_DIR, "libref_oracle.so")
_LOCK = threading.Lock()
_oracle: "Optional[ReferenceOracle]" = None
_failed: Optional[str] = None

_c_u8p = ctypes.POINTER(ctypes.c_uint8)
_c_f32p = ctypes.POINTER(ctypes.c_float)


def _u8(a: np.ndarray) -> "ctypes._Pointer":
    return a.ctypes.data_as(_c_u8p)


def _f32(a: np.ndarray) -> "ctypes._Pointer":
    return a.ctypes.data_as(_c_f32p)


def _build() -> str:
    """Compile the oracle .so (cached on source mtimes); returns lib path."""
    srcs = [os.path.join(REF_DIR, s) for s in _REF_SOURCES]
    for s in srcs + [_SHIM]:
        if not os.path.exists(s):
            raise FileNotFoundError(s)
    if os.path.exists(_LIB_PATH):
        # staleness must cover the HEADERS the sources include, not just
        # the .cpp files — a header-only edit (struct/inline change)
        # would otherwise silently keep testing against the old binary
        import glob

        deps = srcs + [_SHIM] + glob.glob(os.path.join(REF_DIR, "*.h"))
        newest = max(os.path.getmtime(s) for s in deps)
        if os.path.getmtime(_LIB_PATH) >= newest:
            return _LIB_PATH
    os.makedirs(_BUILD_DIR, exist_ok=True)
    for stub in ("v3d_interface.h", "v3d_message.h"):
        with open(os.path.join(_BUILD_DIR, stub), "w") as f:
            f.write("// empty stand-in: unused by the reference compute sources\n")
    cmd = [
        "g++", "-O2", "-shared", "-fPIC", "-std=c++11",
        "-I", _BUILD_DIR, "-I", REF_DIR,
        # the reference was written for macOS/clang; map its platform-isms
        # to glibc equivalents without touching the read-only sources
        "-include", "climits", "-include", "cmath",
        "-D_isnan(x)=std::isnan(x)",
        _SHIM, *srcs,
        "-o", _LIB_PATH,
    ]
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    return _LIB_PATH


class ReferenceOracle:
    """ctypes facade over the compiled reference plugin compute core."""

    def __init__(self, lib: ctypes.CDLL):
        self._lib = lib
        lib.ref_frangi3d.restype = None
        lib.ref_frangi2d.restype = None
        lib.ref_imgaussian3d.restype = None
        lib.ref_hessian3d.restype = None
        lib.ref_extract_seeds.restype = ctypes.c_long
        for name in ("ref_maxentropy_th", "ref_otsu_th", "ref_intermodes_th"):
            fn = getattr(lib, name)
            fn.restype = ctypes.c_uint8
            fn.argtypes = [_c_u8p, ctypes.c_long]
        lib.ref_tracker_new.restype = ctypes.c_void_p
        lib.ref_tracker_free.argtypes = [ctypes.c_void_p]
        lib.ref_tracker_sz.argtypes = [ctypes.c_void_p]
        lib.ref_tracker_sz.restype = ctypes.c_int
        lib.ref_tracker_ndir.argtypes = [ctypes.c_void_p]
        lib.ref_tracker_ndir.restype = ctypes.c_int
        lib.ref_tracker_zncc.restype = ctypes.c_float
        lib.ref_tracker_getdirection.restype = ctypes.c_int
        lib.ref_tracker_interp.restype = ctypes.c_float
        lib.ref_bessi0.restype = ctypes.c_double
        lib.ref_bessi0.argtypes = [ctypes.c_double]
        lib.ref_trace_all.restype = ctypes.c_long

    # -- dense ops ---------------------------------------------------------
    def frangi3d(self, vol, sigmas, zdist, alpha=0.5, beta=0.5, c=500.0,
                 beta1=0.5, beta2=15.0):
        """Reference Frangi::frangi3d (frangi.cpp:152). vol is (Z, Y, X)
        uint8; returns (J (Z,Y,X) f32, jmin, jmax, Vx, Vy, Vz u8)."""
        vol = np.ascontiguousarray(vol, np.uint8)
        l, h, w = vol.shape  # reference order: w=x, h=y, l=z
        n = vol.size
        J = np.zeros(n, np.float32)
        mm = np.zeros(2, np.float32)
        Vx = np.zeros(n, np.uint8)
        Vy = np.zeros(n, np.uint8)
        Vz = np.zeros(n, np.uint8)
        sig = np.asarray(sigmas, np.float32)
        self._lib.ref_frangi3d(
            _u8(vol.reshape(-1)), w, h, l, _f32(sig), len(sig),
            ctypes.c_float(zdist), ctypes.c_float(alpha), ctypes.c_float(beta),
            ctypes.c_float(c), ctypes.c_float(beta1), ctypes.c_float(beta2),
            _f32(J), _f32(mm), _u8(Vx), _u8(Vy), _u8(Vz),
        )
        shp = (l, h, w)
        return (J.reshape(shp), float(mm[0]), float(mm[1]),
                Vx.reshape(shp), Vy.reshape(shp), Vz.reshape(shp))

    def frangi2d(self, img, sigmas, zdist=1.0, alpha=0.5, beta=0.5, c=500.0,
                 beta1=0.5, beta2=15.0):
        """Reference Frangi::frangi2d (frangi.cpp:392). img is (Y, X) uint8."""
        img = np.ascontiguousarray(img, np.uint8)
        h, w = img.shape
        n = img.size
        J = np.zeros(n, np.float32)
        mm = np.zeros(2, np.float32)
        Vx = np.zeros(n, np.uint8)
        Vy = np.zeros(n, np.uint8)
        Vz = np.zeros(n, np.uint8)
        sig = np.asarray(sigmas, np.float32)
        self._lib.ref_frangi2d(
            _u8(img.reshape(-1)), w, h, 1, _f32(sig), len(sig),
            ctypes.c_float(zdist), ctypes.c_float(alpha), ctypes.c_float(beta),
            ctypes.c_float(c), ctypes.c_float(beta1), ctypes.c_float(beta2),
            _f32(J), _f32(mm), _u8(Vx), _u8(Vy), _u8(Vz),
        )
        return (J.reshape(h, w), float(mm[0]), float(mm[1]),
                Vx.reshape(h, w), Vy.reshape(h, w))

    def imgaussian3d(self, vol, sig, zdist):
        """Reference Frangi::imgaussian 3-D (frangi.cpp:647)."""
        vol = np.ascontiguousarray(vol, np.uint8)
        l, h, w = vol.shape
        F = np.zeros(vol.size, np.float32)
        self._lib.ref_imgaussian3d(
            _u8(vol.reshape(-1)), w, h, l,
            ctypes.c_float(sig), ctypes.c_float(zdist), _f32(F),
        )
        return F.reshape(vol.shape)

    def hessian3d(self, vol, sig, zdist):
        """Reference Frangi::hessian3d (frangi.cpp:291); returns the 6
        components as a dict keyed like the pnr_tpu op."""
        vol = np.ascontiguousarray(vol, np.uint8)
        l, h, w = vol.shape
        bufs = [np.zeros(vol.size, np.float32) for _ in range(6)]
        self._lib.ref_hessian3d(
            _u8(vol.reshape(-1)), w, h, l,
            ctypes.c_float(sig), ctypes.c_float(zdist), *map(_f32, bufs),
        )
        names = ("dzz", "dyy", "dyz", "dxx", "dxy", "dxz")
        return {k: b.reshape(vol.shape) for k, b in zip(names, bufs)}

    def imerode_xy(self, vol, rad):
        vol = np.ascontiguousarray(vol, np.uint8)
        l, h, w = vol.shape
        E = np.zeros(vol.size, np.uint8)
        self._lib.ref_imerode_xy(
            _u8(vol.reshape(-1)), w, h, l, ctypes.c_float(rad), _u8(E))
        return E.reshape(vol.shape)

    def imerode_xyz(self, vol, rad, zdist):
        vol = np.ascontiguousarray(vol, np.uint8)
        l, h, w = vol.shape
        E = np.zeros(vol.size, np.uint8)
        self._lib.ref_imerode_xyz(
            _u8(vol.reshape(-1)), w, h, l,
            ctypes.c_float(rad), ctypes.c_float(zdist), _u8(E))
        return E.reshape(vol.shape)

    def imdilate_xy(self, vol, rad):
        out = np.ascontiguousarray(vol, np.uint8).copy()
        l, h, w = out.shape
        self._lib.ref_imdilate_xy(
            _u8(out.reshape(-1)), w, h, l, ctypes.c_float(rad))
        return out

    # -- seeds -------------------------------------------------------------
    def extract_seeds(self, tolerance, j8, vx, vy, vz, max_out=200_000):
        """Reference SeedExtractor::extractSeeds (seed.cpp:556). Inputs are
        (Z, Y, X) uint8 arrays; returns an (n, 8) float32 array of
        (x, y, z, vx, vy, vz, score, corr) rows in emission order."""
        j8 = np.ascontiguousarray(j8, np.uint8)
        l, h, w = j8.shape
        out = np.zeros((max_out, 8), np.float32)
        n = self._lib.ref_extract_seeds(
            ctypes.c_double(tolerance), _u8(j8.reshape(-1)), w, h, l,
            _u8(np.ascontiguousarray(vx, np.uint8).reshape(-1)),
            _u8(np.ascontiguousarray(vy, np.uint8).reshape(-1)),
            _u8(np.ascontiguousarray(vz, np.uint8).reshape(-1)),
            _f32(out.reshape(-1)), ctypes.c_long(max_out),
        )
        if n > max_out:
            raise RuntimeError(f"seed overflow: {n} > {max_out}")
        return out[:n].copy()

    # -- thresholds ----------------------------------------------------------
    def maxentropy_th(self, img):
        a = np.ascontiguousarray(img, np.uint8).reshape(-1)
        return int(self._lib.ref_maxentropy_th(_u8(a), a.size))

    def otsu_th(self, img):
        a = np.ascontiguousarray(img, np.uint8).reshape(-1)
        return int(self._lib.ref_otsu_th(_u8(a), a.size))

    def intermodes_th(self, img):
        a = np.ascontiguousarray(img, np.uint8).reshape(-1)
        return int(self._lib.ref_intermodes_th(_u8(a), a.size))

    def bessi0(self, x):
        return float(self._lib.ref_bessi0(float(x)))

    # -- tracker -------------------------------------------------------------
    def tracker(self, sigmas, step, npcles, niter, kappa, is2d, znccth,
                kc, neff_ratio, zdist, nodespervol):
        return _RefTracker(self._lib, sigmas, step, npcles, niter, kappa,
                           is2d, znccth, kc, neff_ratio, zdist, nodespervol)


class _RefTracker:
    """Owns one reference Tracker instance (ctor precomputes all tables)."""

    def __init__(self, lib, sigmas, step, npcles, niter, kappa, is2d,
                 znccth, kc, neff_ratio, zdist, nodespervol):
        self._lib = lib
        sig = np.asarray(sigmas, np.float32)
        self._h = ctypes.c_void_p(lib.ref_tracker_new(
            _f32(sig), len(sig), int(step), int(npcles), int(niter),
            ctypes.c_float(kappa), int(bool(is2d)), ctypes.c_float(znccth),
            ctypes.c_float(kc), ctypes.c_float(neff_ratio),
            ctypes.c_float(zdist), int(nodespervol),
        ))
        self.sz = int(lib.ref_tracker_sz(self._h))
        self.ndir = int(lib.ref_tracker_ndir(self._h))

    def __del__(self):
        h, self._h = getattr(self, "_h", None), None
        if h:
            self._lib.ref_tracker_free(h)

    def tables(self):
        """All ctor-precomputed tables (tracker.cpp:376-527) as a dict of
        float32 arrays: p/u (sz,3), w0/w0_cws/d/d0 (sz,), w/w_cws
        (ndir,sz), v (ndir,3)."""
        sz, nd = self.sz, self.ndir
        p = np.zeros((sz, 3), np.float32)
        u = np.zeros((sz, 3), np.float32)
        w0 = np.zeros(sz, np.float32)
        w0c = np.zeros(sz, np.float32)
        w = np.zeros((nd, sz), np.float32)
        wc = np.zeros((nd, sz), np.float32)
        v = np.zeros((nd, 3), np.float32)
        d = np.zeros(sz, np.float32)
        d0 = np.zeros(sz, np.float32)
        self._lib.ref_tracker_tables(
            self._h, _f32(p.reshape(-1)), _f32(u.reshape(-1)), _f32(w0),
            _f32(w0c), _f32(w.reshape(-1)), _f32(wc.reshape(-1)),
            _f32(v.reshape(-1)), _f32(d), _f32(d0),
        )
        return dict(p=p, u=u, w0=w0, w0_cws=w0c, w=w, w_cws=wc, v=v, d=d, d0=d0)

    def zncc(self, x, y, z, vx, vy, vz, vol):
        """Reference znccBBB via zncc2 (tracker.cpp:1881-1964); vol is
        (Z, Y, X) uint8; returns (corr, sigma_hat)."""
        vol = np.ascontiguousarray(vol, np.uint8)
        l, h, w = vol.shape
        sig = ctypes.c_float(0.0)
        c = self._lib.ref_tracker_zncc(
            self._h, *(ctypes.c_float(a) for a in (x, y, z, vx, vy, vz)),
            _u8(vol.reshape(-1)), w, h, l, ctypes.byref(sig),
        )
        return float(c), float(sig.value)

    def getdirection(self, vx, vy, vz):
        return int(self._lib.ref_tracker_getdirection(
            self._h, *(ctypes.c_float(a) for a in (vx, vy, vz))))

    def interp(self, x, y, z, vol):
        vol = np.ascontiguousarray(vol, np.uint8)
        l, h, w = vol.shape
        return float(self._lib.ref_tracker_interp(
            self._h, *(ctypes.c_float(a) for a in (x, y, z)),
            _u8(vol.reshape(-1)), w, h, l))

    def trace_all(self, vol, seeds_raw, znccth, nodepervol, nh_vol,
                  max_trace_count, max_nodes=2_000_000, max_edges=8_000_000):
        """Run the reference seed loop end to end (seed filter + sort +
        trackPos/trackNeg with density maps — Advantra_plugin.cpp:
        2558-2710 via oracle_api.cpp ref_trace_all). `seeds_raw` is the
        (n, 8) array from extract_seeds. Returns (nodes (N, 9) rows
        x,y,z,vx,vy,vz,corr,sig,type incl. the dummy node 0, edges
        (E, 2) int32). Nondeterministic across calls by construction
        (the reference re-seeds srand(time(NULL)) per SMC iteration)."""
        vol = np.ascontiguousarray(vol, np.uint8)
        l, h, w = vol.shape
        seeds_raw = np.ascontiguousarray(seeds_raw, np.float32)
        nodes = np.zeros((max_nodes, 9), np.float32)
        edges = np.zeros((max_edges, 2), np.int32)
        ne = ctypes.c_long(0)
        nn = self._lib.ref_trace_all(
            self._h, _u8(vol.reshape(-1)), w, h, l,
            _f32(seeds_raw.reshape(-1)), ctypes.c_long(len(seeds_raw)),
            ctypes.c_float(znccth), int(nodepervol), int(nh_vol),
            int(max_trace_count), _f32(nodes.reshape(-1)),
            ctypes.c_long(max_nodes),
            edges.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            ctypes.c_long(max_edges), ctypes.byref(ne),
        )
        if nn < 0:
            raise RuntimeError("ref_trace_all: node/edge buffer overflow")
        return nodes[:nn].copy(), edges[: ne.value].copy()


def get_oracle() -> Optional[ReferenceOracle]:
    """Build (once) and return the compiled reference oracle, or None if the
    reference tree / compiler is unavailable (tests then skip)."""
    global _oracle, _failed
    if _oracle is not None or _failed is not None:
        return _oracle
    with _LOCK:
        if _oracle is None and _failed is None:
            try:
                _oracle = ReferenceOracle(ctypes.CDLL(_build()))
            except Exception as e:  # missing ref tree, no g++, ...
                _failed = f"{type(e).__name__}: {e}"
    return _oracle


def unavailable_reason() -> Optional[str]:
    return _failed


class _SilenceStdoutFd:
    """Redirect C-level stdout to /dev/null (the reference tracker
    printf-spams per trace regardless of its verbose flag)."""

    def __enter__(self):
        import sys

        sys.stdout.flush()
        self._saved = os.dup(1)
        self._null = os.open(os.devnull, os.O_WRONLY)
        os.dup2(self._null, 1)
        return self

    def __exit__(self, *exc):
        os.dup2(self._saved, 1)
        os.close(self._saved)
        os.close(self._null)
        return False


def reference_reconstruct_n0(vol: np.ndarray, cfg, max_seeds: int = 200_000):
    """Run the compiled reference end to end on a (Z, Y, X) uint8 volume
    with a PNRConfig: frangi3d -> J8 min-max normalization
    (Advantra_plugin.cpp:2499-2514) -> extractSeeds -> the full seed
    loop (ref_trace_all). Returns (NodeList n0, n_seeds, n_nodes).

    This is the reference-traced node graph the rebuild's tracer is
    scored against (distributionally — the reference RNG is
    irreproducible by construction, SURVEY.md §7 hard-part 6)."""
    from pnr_tpu.graph.nodes import NodeList

    orc = get_oracle()
    if orc is None:
        raise RuntimeError(f"oracle unavailable: {unavailable_reason()}")
    vol = np.ascontiguousarray(vol, np.uint8)
    is2d = vol.shape[0] == 1
    if is2d:
        # the reference's first-class P == 1 path (Advantra_plugin.cpp:
        # 2339): frangi2d + a 2-D tracker (circle codebook, planar
        # priors/templates)
        j, jmin, jmax, vx, vy = orc.frangi2d(
            vol[0], cfg.sigmas, beta1=cfg.frangi_betaone,
            beta2=cfg.frangi_betatwo,
        )
        j, vx, vy = j[None], vx[None], vy[None]
        vz = np.zeros_like(vx)
    else:
        j, jmin, jmax, vx, vy, vz = orc.frangi3d(
            vol, cfg.sigmas, cfg.zdist, cfg.frangi_alpha, cfg.frangi_beta,
            cfg.frangi_c,
        )
    if abs(jmax - jmin) <= 1.175494e-38:
        j8 = np.zeros(vol.shape, np.uint8)
    else:
        j8 = np.clip(
            np.round((j - jmin) / (jmax - jmin) * 255.0), 0, 255
        ).astype(np.uint8)
    seeds = orc.extract_seeds(cfg.tolerance, j8, vx, vy, vz, max_out=max_seeds)
    tr = orc.tracker(
        cfg.sigmas, cfg.step, cfg.np, cfg.ni, cfg.kappa, is2d, cfg.znccth,
        cfg.kc, cfg.neff_ratio, cfg.zdist, cfg.nodepervol,
    )
    with _SilenceStdoutFd():
        nodes, edges = tr.trace_all(
            vol, seeds, cfg.znccth, cfg.nodepervol, cfg.vol,
            cfg.max_trace_count,
        )
    n0 = NodeList.__new__(NodeList)
    n0.x = list(map(float, nodes[:, 0]))
    n0.y = list(map(float, nodes[:, 1]))
    n0.z = list(map(float, nodes[:, 2]))
    n0.vx = list(map(float, nodes[:, 3]))
    n0.vy = list(map(float, nodes[:, 4]))
    n0.vz = list(map(float, nodes[:, 5]))
    n0.corr = list(map(float, nodes[:, 6]))
    n0.sig = list(map(float, nodes[:, 7]))
    n0.type = list(map(int, nodes[:, 8]))
    n0.nbr = [[] for _ in range(len(nodes))]
    for a, b in edges:
        n0.nbr[int(a)].append(int(b))
    return n0, len(seeds), len(nodes)
