"""Volume and SWC I/O round-trips."""

import numpy as np
import pytest

from pnr_tpu.io.volume import load_volume, save_volume
from pnr_tpu.io.swc import read_swc, save_nodelist, swc_to_nodelist
from pnr_tpu.graph.nodes import NodeList


class TestVolumeIO:
    @pytest.mark.parametrize("ext", ["tif", "v3draw", "npy", "v3dpbd"])
    def test_roundtrip(self, tmp_path, rng, ext):
        vol = (rng.random((6, 24, 32)) * 255).astype(np.uint8)
        p = str(tmp_path / f"v.{ext}")
        save_volume(p, vol)
        back = load_volume(p)
        np.testing.assert_array_equal(back, vol)

    def test_v3draw_header(self, tmp_path, rng):
        vol = (rng.random((2, 4, 8)) * 255).astype(np.uint8)
        p = str(tmp_path / "v.v3draw")
        save_volume(p, vol)
        raw = open(p, "rb").read()
        assert raw.startswith(b"raw_image_stack_by_hpeng")
        assert len(raw) == 24 + 1 + 2 + 16 + vol.size

    def test_unsupported_format(self, tmp_path):
        with pytest.raises(ValueError):
            load_volume(str(tmp_path / "x.bmp"))

    def test_pbd8_codec_exhaustive(self, rng):
        """PBD8 round-trips across run/diff/literal-heavy payloads and the
        decoder handles hand-built streams of each op (pnr_tpu.io.pbd)."""
        from pnr_tpu.io.pbd import compress_pbd8, decompress_pbd8

        cases = [
            np.zeros(1000, np.uint8),                                   # pure repeat
            np.arange(1000, dtype=np.uint8),                            # pure +1 diff
            (rng.random(1000) * 255).astype(np.uint8),                  # literal-heavy
            np.clip(np.cumsum(rng.integers(-1, 3, 1000)), 0, 255).astype(np.uint8),
            np.array([7], np.uint8),
            np.repeat(np.arange(50, dtype=np.uint8), 7),                # mixed
        ]
        for data in cases:
            enc = compress_pbd8(data)
            np.testing.assert_array_equal(decompress_pbd8(enc, len(data)), data)
        # smooth data should actually compress
        smooth = np.clip(np.cumsum(rng.integers(-1, 2, 4096)), 0, 255).astype(np.uint8)
        assert len(compress_pbd8(smooth)) < len(smooth) // 2

        # hand-built stream: literal(3 bytes) + repeat(5x9) + diffs(+1,+2,-1,0)
        stream = bytes([2, 10, 20, 30]) + bytes([127 + 5, 9]) + bytes([32 + 4, 0b00_11_10_01])
        out = decompress_pbd8(np.frombuffer(stream, np.uint8), 12)
        np.testing.assert_array_equal(
            out, [10, 20, 30, 9, 9, 9, 9, 9, 10, 12, 11, 11]
        )
        # CONSECUTIVE diff ops chain their priors through each other
        # (the vectorized decoder's grouped-cumsum path), including a
        # uint8 wraparound; then an explicit op resets the anchor
        stream2 = (
            bytes([127 + 1, 254])                      # repeat 1x254
            + bytes([32 + 4, 0b00_01_01_01])           # 255, 0 (wrap), 1, 1
            + bytes([32 + 2, 0b00_11_10])              # +2, -1 -> 3, 2
            + bytes([0, 100])                          # literal resets anchor
            + bytes([32 + 1, 0b01])                    # -> 101
        )
        out2 = decompress_pbd8(np.frombuffer(stream2, np.uint8), 9)
        np.testing.assert_array_equal(out2, [254, 255, 0, 1, 1, 3, 2, 100, 101])
        # big mixed payload: flats, ramps, noise bursts (stresses the
        # op-walk + vectorized diff pass against each other)
        parts = []
        for k in range(60):
            if k % 3 == 0:
                parts.append(np.full(rng.integers(1, 400), k * 4, np.uint8))
            elif k % 3 == 1:
                parts.append(
                    (np.cumsum(rng.integers(-1, 3, rng.integers(1, 400))) & 0xFF)
                    .astype(np.uint8)
                )
            else:
                parts.append(rng.integers(0, 256, rng.integers(1, 200)).astype(np.uint8))
        big = np.concatenate(parts)
        np.testing.assert_array_equal(
            decompress_pbd8(compress_pbd8(big), len(big)), big
        )

    def test_v3dpbd_16bit_rejected(self, tmp_path):
        import struct

        p = tmp_path / "v.v3dpbd"
        p.write_bytes(
            b"v3d_volume_pkbitdf_encod" + b"L" + struct.pack("<h", 2)
            + struct.pack("<4i", 2, 2, 1, 1)
        )
        with pytest.raises(ValueError, match="datatype 2"):
            load_volume(str(p))

    def test_2d_npy_promoted_to_3d(self, tmp_path, rng):
        img = (rng.random((16, 16)) * 255).astype(np.uint8)
        p = str(tmp_path / "v.npy")
        np.save(p, img)
        back = load_volume(p)
        assert back.shape == (1, 16, 16)

    @pytest.mark.parametrize("ext", [".npy", ".v3draw"])
    def test_mmap_matches_full_load(self, tmp_path, rng, ext):
        from pnr_tpu.io.volume import load_volume_mmap

        vol = (rng.random((6, 9, 13)) * 255).astype(np.uint8)
        p = str(tmp_path / ("v" + ext))
        save_volume(p, vol)
        m = load_volume_mmap(p)
        assert m.shape == vol.shape and m.dtype == np.uint8
        np.testing.assert_array_equal(np.asarray(m), vol)
        # slab access (the shard_volume_global contract) without
        # touching other slabs
        np.testing.assert_array_equal(
            np.asarray(m[(slice(2, 4), slice(None), slice(None))]), vol[2:4]
        )

    def test_mmap_rejects_unmappable(self, tmp_path, rng):
        from pnr_tpu.io.volume import load_volume_mmap

        vol = (rng.random((2, 4, 4)) * 255).astype(np.uint8)
        tif = str(tmp_path / "v.tif")
        save_volume(tif, vol)
        with pytest.raises(ValueError, match="memory-map"):
            load_volume_mmap(tif)
        f32 = str(tmp_path / "v.npy")
        np.save(f32, vol.astype(np.float32))
        with pytest.raises(ValueError, match="uint8"):
            load_volume_mmap(f32)


class TestSwcNodelist:
    def test_swc_to_nodelist_rebuilds_graph(self, tmp_path):
        nodes = NodeList()
        a = nodes.add(0, 0, 0, sig=1, ntype=2)
        b = nodes.add(3, 0, 0, sig=1, ntype=2)
        c = nodes.add(6, 0, 0, sig=1, ntype=2)
        nodes.nbr[b] = [a]
        nodes.nbr[c] = [b]
        p = str(tmp_path / "t.swc")
        save_nodelist(nodes, p)
        back = swc_to_nodelist(read_swc(p))
        assert len(back) == 4
        assert back.nbr[2] == [1] and back.nbr[3] == [2]


def test_pbd8_roundtrip_fuzz():
    """Property fuzz: random / smooth / run-heavy / constant / mixed
    payloads all round-trip exactly through the codec."""
    from pnr_tpu.io.pbd import compress_pbd8, decompress_pbd8

    rng = np.random.default_rng(0)
    for trial in range(60):
        n = int(rng.integers(1, 3000))
        kind = trial % 5
        if kind == 0:
            data = rng.integers(0, 256, n).astype(np.uint8)
        elif kind == 1:  # smooth (difference-heavy)
            data = (np.cumsum(rng.integers(-1, 3, n)) & 0xFF).astype(np.uint8)
        elif kind == 2:  # repeat runs
            data = np.repeat(
                rng.integers(0, 256, max(1, n // 7)), 7
            )[:n].astype(np.uint8)
        elif kind == 3:
            data = np.full(n, int(rng.integers(0, 256)), np.uint8)
        else:  # mixed blocks
            parts = [
                np.full(int(rng.integers(1, 50)), int(rng.integers(0, 256)), np.uint8),
                rng.integers(0, 256, int(rng.integers(1, 50))).astype(np.uint8),
                (np.cumsum(rng.integers(-1, 3, int(rng.integers(1, 200)))) & 0xFF)
                .astype(np.uint8),
            ]
            data = np.concatenate(parts * 4)[:n]
            if len(data) < n:
                data = np.pad(data, (0, n - len(data)))
        dec = decompress_pbd8(compress_pbd8(data), len(data))
        assert np.array_equal(dec, data), f"trial {trial} kind {kind} n {n}"
