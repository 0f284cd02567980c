"""OBJ/MTL loader tests (python and native paths must agree)."""

import numpy as np
import pytest

from toroidal_ray_tracing_tpu.scene.obj_loader import (
    _load_obj_python,
    load_obj,
)

OBJ = """\
mtllib test.mtl
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
v 0 0 1
vn 0 0 1
vt 0 0
vt 1 0
vt 1 1
usemtl red
f 1/1/1 2/2/1 3/3/1
usemtl blue
f 1/1/1 3/3/1 4//1
f 1 2 3 4
f -5 -4 -3
"""

MTL = """\
newmtl red
Kd 1 0 0
Ka 0.1 0 0
Ks 0.5 0.5 0.5
Ns 32
illum 2
newmtl blue
Kd 0 0 1
illum 3
"""


@pytest.fixture
def obj_path(tmp_path):
    (tmp_path / "test.obj").write_text(OBJ)
    (tmp_path / "test.mtl").write_text(MTL)
    return str(tmp_path / "test.obj")


def check_mesh(mesh):
    # 1 + 1 + 2 (quad fan) + 1 = 5 triangles
    assert mesh.indices.shape == (5, 3)
    assert mesh.positions.shape[1] == 3
    names = [m["name"] for m in mesh.materials]
    assert "red" in names and "blue" in names
    red, blue = names.index("red"), names.index("blue")
    assert mesh.mat_index[0] == red
    assert (mesh.mat_index[1:] == blue).all()
    # sRGB -> linear applied (hello_vulkan.cpp:197-202)
    np.testing.assert_allclose(mesh.materials[red]["diffuse"][0], 1.0)
    np.testing.assert_allclose(mesh.materials[blue]["diffuse"][2], 1.0)
    assert mesh.materials[red]["shininess"] == 32.0
    assert mesh.materials[blue]["illum"] == 3
    # supplied normal used; all faces are z=0-plane here except the last
    np.testing.assert_allclose(
        np.abs(mesh.normals[mesh.indices[0, 0]]), [0, 0, 1], atol=1e-6)


def test_python_loader(obj_path):
    check_mesh(_load_obj_python(obj_path))


def test_native_loader(obj_path):
    from toroidal_ray_tracing_tpu.io import native

    if not native.available():
        pytest.skip("native lib not built")
    check_mesh(load_obj(obj_path, use_native=True))


def test_native_matches_python(obj_path):
    from toroidal_ray_tracing_tpu.io import native

    if not native.available():
        pytest.skip("native lib not built")
    a = _load_obj_python(obj_path)
    b = load_obj(obj_path, use_native=True)
    assert a.indices.shape == b.indices.shape
    # same triangles (possibly different vertex packing order): compare
    # unpacked corner positions
    pa = a.positions[a.indices].reshape(-1, 3)
    pb = b.positions[b.indices].reshape(-1, 3)
    np.testing.assert_allclose(pa, pb, atol=1e-6)
    np.testing.assert_array_equal(a.mat_index, b.mat_index)
