"""Scene loaders (SURVEY.md C5/C6): OBJ + MTL materials, glTF 2.0, .glb.

Fixtures are generated in-test (no binary assets in the repo)."""

import base64
import json
import os
import struct

import numpy as np
import pytest

from tpurt.scene.gltf import load_gltf
from tpurt.scene.loader import load_scene
from tpurt.scene.obj import load_obj
from tpurt.scene.types import BLINN_PHONG, DIELECTRIC, LAMBERT, MIRROR


def _quad_gltf_doc():
    """One quad (2 tris), one node with a translation, one material."""
    pos = np.array(
        [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32
    )
    idx = np.array([0, 1, 2, 0, 2, 3], np.uint16)
    buf = pos.tobytes() + idx.tobytes()
    doc = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0, "translation": [2.0, 0.0, 0.0],
                   "name": "quad"}],
        "meshes": [{
            "primitives": [{
                "attributes": {"POSITION": 0},
                "indices": 1,
                "material": 0,
            }]
        }],
        "materials": [{
            "name": "red",
            "pbrMetallicRoughness": {
                "baseColorFactor": [0.8, 0.1, 0.1, 1.0],
                "metallicFactor": 0.0,
                "roughnessFactor": 1.0,
            },
        }],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 4,
             "type": "VEC3", "min": [0, 0, 0], "max": [1, 1, 0]},
            {"bufferView": 1, "componentType": 5123, "count": 6,
             "type": "SCALAR"},
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 48},
            {"buffer": 0, "byteOffset": 48, "byteLength": 12},
        ],
        "buffers": [{"byteLength": len(buf)}],
    }
    return doc, buf


def test_gltf_embedded_base64(tmp_path):
    doc, buf = _quad_gltf_doc()
    doc["buffers"][0]["uri"] = (
        "data:application/octet-stream;base64,"
        + base64.b64encode(buf).decode()
    )
    path = os.path.join(tmp_path, "quad.gltf")
    with open(path, "w") as f:
        json.dump(doc, f)
    scene = load_gltf(path)
    assert len(scene.meshes) == 1
    assert scene.meshes[0].num_triangles == 2
    assert len(scene.instances) == 1
    # node translation applied
    np.testing.assert_allclose(
        scene.instances[0].transform[:, 3], [2.0, 0.0, 0.0]
    )
    mat = scene.materials[scene.meshes[0].material_ids[0]]
    np.testing.assert_allclose(mat.albedo, (0.8, 0.1, 0.1), rtol=1e-6)


def test_glb_container(tmp_path):
    doc, buf = _quad_gltf_doc()
    json_bytes = json.dumps(doc).encode()
    json_bytes += b" " * ((4 - len(json_bytes) % 4) % 4)
    bin_bytes = buf + b"\x00" * ((4 - len(buf) % 4) % 4)
    total = 12 + 8 + len(json_bytes) + 8 + len(bin_bytes)
    glb = (
        b"glTF" + struct.pack("<II", 2, total)
        + struct.pack("<I", len(json_bytes)) + b"JSON" + json_bytes
        + struct.pack("<I", len(bin_bytes)) + b"BIN\x00" + bin_bytes
    )
    path = os.path.join(tmp_path, "quad.glb")
    with open(path, "wb") as f:
        f.write(glb)
    scene = load_scene(path)  # extension dispatch (SURVEY.md §3.4)
    assert scene.meshes[0].num_triangles == 2


def _write_obj_with_mtl(tmp_path):
    mtl = os.path.join(tmp_path, "scene.mtl")
    with open(mtl, "w") as f:
        f.write("newmtl redmat\nKd 0.9 0.1 0.1\nNs 64\nKs 0.5 0.5 0.5\n")
        f.write("newmtl glassmat\nNi 1.5\nillum 7\nKd 1 1 1\n")
    obj = os.path.join(tmp_path, "scene.obj")
    with open(obj, "w") as f:
        f.write("mtllib scene.mtl\n")
        f.write("v 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 0\n")
        f.write("usemtl redmat\nf 1 2 3\n")
        f.write("usemtl glassmat\nf 2 4 3\n")
    return obj


@pytest.mark.parametrize("native", [True, False])
def test_obj_mtl_materials(tmp_path, native, monkeypatch):
    if not native:
        monkeypatch.setenv("TPURT_NO_NATIVE", "1")
    obj = _write_obj_with_mtl(tmp_path)
    scene = load_obj(obj)
    mesh = scene.meshes[0]
    assert mesh.num_triangles == 2
    m0 = scene.materials[mesh.material_ids[0]]
    m1 = scene.materials[mesh.material_ids[1]]
    assert m0.kind == BLINN_PHONG and abs(m0.param0 - 64) < 1e-6
    np.testing.assert_allclose(m0.albedo, (0.9, 0.1, 0.1), rtol=1e-6)
    assert m1.kind == DIELECTRIC and abs(m1.param0 - 1.5) < 1e-6
