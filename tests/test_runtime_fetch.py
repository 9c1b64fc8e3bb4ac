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

    def test_exactly_cap_nonzeros(self, rng):
        cap = 4096
        a = np.zeros((32, 128, 128), np.uint8)
        flat = a.reshape(-1)
        pick = rng.choice(flat.size, cap, replace=False)
        flat[pick] = rng.integers(1, 256, cap).astype(np.uint8)
        got = fetch_u8_sparse(jnp.asarray(a), nonzero_cap=cap)
        assert (got == a).all()
