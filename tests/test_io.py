"""I/O: OBJ/MTL parsing vs known cornell facts, HDR round-trip, PNG round-trip."""

import numpy as np

from tests.conftest import CORNELL_OBJ
from sycl_ray_tracing_tpu.utils.hdr import read_hdr, write_hdr
from sycl_ray_tracing_tpu.utils.obj_loader import parse_obj
from sycl_ray_tracing_tpu.utils.png import read_png, write_png


def test_cornell_parse_counts():
    parsed = parse_obj(CORNELL_OBJ)
    # cornell_pbr: 16 quads = 32 triangles; 8 MTL materials + debug row
    assert parsed.triangles.shape == (32, 3, 3)
    assert parsed.emission.shape[0] == 9
    assert parsed.material_indices.min() >= 1  # every face has a material
    # the light quad (Ke=100) = 2 triangles
    assert parsed.emissive_indices.shape[0] == 2
    np.testing.assert_allclose(
        parsed.emission[parsed.material_indices[parsed.emissive_indices[0]]],
        [100.0, 100.0, 100.0],
    )


def test_cornell_material_values():
    parsed = parse_obj(CORNELL_OBJ)
    by_name = {n: i for i, n in enumerate(parsed.material_names)}
    left = by_name["leftWall.001"]
    np.testing.assert_allclose(parsed.diffuse[left], [0.63, 0.065, 0.05])
    # leftWall has Pr 0.0 -> clamped to 1e-2 (utils.cpp:82)
    assert abs(parsed.roughness[left] - 1e-2) < 1e-9
    short_box = by_name["shortBox.001"]
    assert parsed.metalness[short_box] == 1.0
    # debug material row 0: magenta emission (utils.cpp:75)
    np.testing.assert_allclose(parsed.emission[0], [1.0, 0.0, 1.0])


def test_obj_vertex_values():
    parsed = parse_obj(CORNELL_OBJ)
    # first face of cornell.001 references v1..v4 region; check a known vertex
    # appears among triangle vertices: (0.53, 0.6, 0.75)
    verts = parsed.triangles.reshape(-1, 3)
    d = np.abs(verts - np.array([0.53, 0.6, 0.75])).sum(axis=1)
    assert d.min() < 1e-6


def test_hdr_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = (rng.uniform(0, 1, (17, 23, 3)) ** 2 * 40).astype(np.float32)
    p = str(tmp_path / "x.hdr")
    write_hdr(p, img)
    back = read_hdr(p)
    assert back.shape == img.shape
    # RGBE shares one exponent per pixel: error is bounded by one mantissa
    # quantum of the LARGEST channel, so small channels have large *relative*
    # error by design — tolerance is per-pixel absolute
    quantum = img.max(axis=-1, keepdims=True) / 128.0
    assert (np.abs(back - img) <= quantum + 1e-4).all()


def test_hdr_flip_y(tmp_path):
    img = np.zeros((4, 4, 3), np.float32)
    img[0, 0, 0] = 2.0
    p = str(tmp_path / "f.hdr")
    write_hdr(p, img)
    flipped = read_hdr(p, flip_y=True)
    assert flipped[3, 0, 0] > 1.9


def test_png_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 1, (9, 13, 3)).astype(np.float32)
    p = str(tmp_path / "x.png")
    write_png(p, img, flip_y=False)
    back = read_png(p)
    expected = (np.clip(img, 0, 1) * 255 + 0.5).astype(np.uint8)
    np.testing.assert_array_equal(back, expected)


def test_png_flip(tmp_path):
    img = np.zeros((4, 4, 3), np.float32)
    img[0] = 1.0  # bottom row bright
    p = str(tmp_path / "y.png")
    write_png(p, img, flip_y=True)
    back = read_png(p)
    assert back[3].min() == 255  # ends up at the bottom of the PNG raster


def test_bmp_writer(tmp_path):
    from sycl_ray_tracing_tpu.utils.png import write_bmp

    rng = np.random.default_rng(2)
    img = rng.uniform(0, 1, (7, 5, 3)).astype(np.float32)
    p = str(tmp_path / "x.bmp")
    write_bmp(p, img, flip_y=False)
    data = open(p, "rb").read()
    assert data[:2] == b"BM"
    import struct
    size, = struct.unpack("<I", data[2:6])
    assert size == len(data)
    w, h = struct.unpack("<ii", data[18:26])
    assert (w, h) == (5, 7)
    # decode the first stored row (bottom row of the image) and compare
    stride = 5 * 3 + ((-(5 * 3)) % 4)
    row0 = np.frombuffer(data[54:54 + 15], np.uint8).reshape(5, 3)[:, ::-1]
    expected = (np.clip(img[6], 0, 1) * 255 + 0.5).astype(np.uint8)
    np.testing.assert_array_equal(row0, expected)
