"""Device->host fetch helpers (utils/runtime.py): slab-parallel dense
fetch and sparse uint8 fetch must be bitwise equal to np.asarray."""

import jax.numpy as jnp
import numpy as np

from pnr_tpu.utils.runtime import fetch_u8_sparse, fetch_volume


class TestFetchVolume:
    def test_bitwise_identical(self, rng):
        a = rng.integers(0, 256, (37, 64, 96), dtype=np.uint8)
        got = fetch_volume(jnp.asarray(a), slabs=8)
        assert (got == a).all()

    def test_more_slabs_than_leading_axis(self, rng):
        a = rng.integers(0, 256, (3, 64, 64), dtype=np.uint8)
        assert (fetch_volume(jnp.asarray(a), slabs=8) == a).all()

    def test_numpy_passthrough(self, rng):
        a = rng.integers(0, 256, (4, 8, 8), dtype=np.uint8)
        assert (fetch_volume(a) == a).all()

    def test_float_array(self, rng):
        a = rng.random((16, 64, 64)).astype(np.float32)
        assert (fetch_volume(jnp.asarray(a)) == a).all()


class TestFetchU8Sparse:
    def test_sparse_bitwise_identical(self, rng):
        a = np.zeros((32, 128, 128), np.uint8)
        n = 3000
        a[
            rng.integers(0, 32, n), rng.integers(0, 128, n), rng.integers(0, 128, n)
        ] = rng.integers(1, 256, n).astype(np.uint8)
        got = fetch_u8_sparse(jnp.asarray(a), nonzero_cap=1 << 16)
        assert got.dtype == np.uint8 and (got == a).all()

    def test_dense_fallback(self, rng):
        a = rng.integers(0, 256, (32, 128, 128), dtype=np.uint8)
        got = fetch_u8_sparse(jnp.asarray(a), nonzero_cap=1024)
        assert (got == a).all()

    def test_all_zero(self):
        a = np.zeros((32, 128, 128), np.uint8)
        got = fetch_u8_sparse(jnp.asarray(a), nonzero_cap=1 << 16)
        assert (got == a).all()

    def test_chunked_gvox_path(self, rng, monkeypatch):
        """The Z-chunked sparsify (the Gvox OOM guard: jnp.nonzero's
        ~12 B/voxel intermediates) is bitwise the direct path —
        exercised at CI size by shrinking the chunk threshold, incl.
        an uneven tail chunk and a dense chunk falling back to the
        dense fetch."""
        import pnr_tpu.utils.runtime as rt

        monkeypatch.setattr(rt, "_SPARSE_CHUNK_VOX", 5 * 128 * 128)
        a = np.zeros((13, 128, 128), np.uint8)  # 13 = 2 chunks + tail
        n = 800
        a[
            rng.integers(0, 13, n), rng.integers(0, 128, n), rng.integers(0, 128, n)
        ] = rng.integers(1, 256, n).astype(np.uint8)
        a[7] = rng.integers(0, 256, (128, 128), dtype=np.uint8)  # dense slice
        got = rt.fetch_u8_sparse(jnp.asarray(a), nonzero_cap=1 << 14)
        assert got.dtype == np.uint8 and (got == a).all()

    def test_single_slice_giant_plane_no_recursion(self, rng, monkeypatch):
        """A (1, H, W) plane above the chunk threshold must take the
        direct path (a 1-slice chunk would recurse onto itself —
        regression for the gigapixel 2-D hang)."""
        import pnr_tpu.utils.runtime as rt

        monkeypatch.setattr(rt, "_SPARSE_CHUNK_VOX", 1024)
        a = np.zeros((1, 128, 128), np.uint8)
        a[0, 3, 5] = 77
        got = rt.fetch_u8_sparse(jnp.asarray(a), nonzero_cap=1 << 10)
        assert (got == a).all()

    def test_exactly_cap_nonzeros(self, rng):
        cap = 4096
        a = np.zeros((32, 128, 128), np.uint8)
        flat = a.reshape(-1)
        pick = rng.choice(flat.size, cap, replace=False)
        flat[pick] = rng.integers(1, 256, cap).astype(np.uint8)
        got = fetch_u8_sparse(jnp.asarray(a), nonzero_cap=cap)
        assert (got == a).all()
