import numpy as np

from itermvs_tpu.io import (
    read_pfm, save_pfm, read_cam_file, write_cam_file,
    read_pair_file, write_pair_file, write_ply, read_ply,
)


def test_pfm_roundtrip_single_channel(tmp_path, rng):
    img = rng.rand(7, 5).astype(np.float32)
    p = str(tmp_path / "d.pfm")
    save_pfm(p, img)
    back, scale = read_pfm(p)
    assert back.shape == (7, 5, 1)
    np.testing.assert_array_equal(back[..., 0], img)
    assert scale == 1.0


def test_pfm_roundtrip_color(tmp_path, rng):
    img = rng.rand(4, 6, 3).astype(np.float32)
    p = str(tmp_path / "c.pfm")
    save_pfm(p, img)
    back, _ = read_pfm(p)
    np.testing.assert_array_equal(back, img)


def test_pfm_matches_reference_format(tmp_path, rng):
    """Byte-level check of header layout against the documented format."""
    img = np.zeros((2, 3), np.float32)
    p = str(tmp_path / "z.pfm")
    save_pfm(p, img)
    raw = open(p, "rb").read()
    assert raw.startswith(b"Pf\n3 2\n-1.000000\n")
    assert len(raw) == len(b"Pf\n3 2\n-1.000000\n") + 2 * 3 * 4


def test_cam_file_roundtrip(tmp_path, rng):
    K = np.array([[1000.0, 0, 320], [0, 1000.0, 240], [0, 0, 1]], np.float32)
    E = np.eye(4, dtype=np.float32)
    E[:3, 3] = [1, 2, 3]
    p = str(tmp_path / "00000000_cam.txt")
    write_cam_file(p, K, E, 425.0, 935.0)
    K2, E2, dmin, dmax = read_cam_file(p)
    np.testing.assert_allclose(K2, K, rtol=1e-5)
    np.testing.assert_allclose(E2, E, rtol=1e-5)
    assert (dmin, dmax) == (425.0, 935.0)


def test_cam_file_four_token_depth_line(tmp_path):
    """DTU-style `min interval num max` depth lines parse min/max."""
    K = np.eye(3, dtype=np.float32)
    E = np.eye(4, dtype=np.float32)
    p = str(tmp_path / "cam.txt")
    write_cam_file(p, K, E, 425.0, 935.0, depth_interval=2.5, num_depth=192)
    _, _, dmin, dmax = read_cam_file(p)
    assert (dmin, dmax) == (425.0, 935.0)


def test_pair_file_roundtrip(tmp_path):
    pairs = [(0, [(10, 100.5), (11, 50.25)]), (1, [(0, 10.0)])]
    p = str(tmp_path / "pair.txt")
    write_pair_file(p, pairs)
    back = read_pair_file(p)
    assert back == [(0, [10, 11]), (1, [0])]


def test_pair_file_skips_empty(tmp_path):
    p = str(tmp_path / "pair.txt")
    with open(p, "w") as f:
        f.write("2\n0\n0 \n1\n2 3 1.0 4 2.0\n")
    assert read_pair_file(p) == [(1, [3, 4])]


def test_ply_roundtrip(tmp_path, rng):
    xyz = rng.rand(100, 3).astype(np.float32) * 10
    rgb = (rng.rand(100, 3) * 255).astype(np.uint8)
    p = str(tmp_path / "cloud.ply")
    write_ply(p, xyz, rgb)
    xyz2, rgb2 = read_ply(p)
    np.testing.assert_array_equal(xyz2, xyz)
    np.testing.assert_array_equal(rgb2, rgb)


def test_native_io_matches_python(tmp_path, rng):
    """Native (C++) and pure-NumPy codecs must agree byte-for-byte."""
    pytest = __import__("pytest")
    try:
        import itermvs_io  # noqa: F401
    except ImportError:
        pytest.skip("native itermvs_io not built (make -C native)")
    import itermvs_tpu.io.pfm as pfm_mod
    import itermvs_tpu.io.ply as ply_mod

    img = rng.rand(16, 9).astype(np.float32)
    p_native = str(tmp_path / "n.pfm")
    p_python = str(tmp_path / "p.pfm")
    save_pfm(p_native, img)
    native_backup, pfm_mod._native = pfm_mod._native, None
    try:
        save_pfm(p_python, img)
        data_py, scale_py = read_pfm(p_native)
    finally:
        pfm_mod._native = native_backup
    assert open(p_native, "rb").read() == open(p_python, "rb").read()
    data_nat, scale_nat = read_pfm(p_python)
    np.testing.assert_array_equal(data_nat, data_py)
    assert scale_nat == scale_py

    xyz = rng.rand(777, 3).astype(np.float32)
    rgb = (rng.rand(777, 3) * 255).astype(np.uint8)
    ply_n = str(tmp_path / "n.ply")
    ply_p = str(tmp_path / "p.ply")
    write_ply(ply_n, xyz, rgb)
    native_backup, ply_mod._native = ply_mod._native, None
    try:
        write_ply(ply_p, xyz, rgb)
    finally:
        ply_mod._native = native_backup
    assert open(ply_n, "rb").read() == open(ply_p, "rb").read()
