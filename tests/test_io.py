"""Volume and SWC I/O round-trips."""

import numpy as np
import pytest

from pnr_tpu.io.volume import load_volume, save_volume
from pnr_tpu.io.swc import read_swc, save_nodelist, swc_to_nodelist
from pnr_tpu.graph.nodes import NodeList


class TestVolumeIO:
    @pytest.mark.parametrize("ext", ["tif", "v3draw", "npy"])
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

    def test_2d_npy_promoted_to_3d(self, tmp_path, rng):
        img = (rng.random((16, 16)) * 255).astype(np.uint8)
        p = str(tmp_path / "v.npy")
        np.save(p, img)
        back = load_volume(p)
        assert back.shape == (1, 16, 16)


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
