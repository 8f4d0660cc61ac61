"""GLB loader + rasterizer tests (row 17: the real-asset renderer path).

The reference renders Objaverse .glb files through Blender
(data_utils/render_objects.py:33-41 -> blenderproc.py:13-87); gd3d parses
GLB directly (gd3d/data/glb.py) and rasterizes with the native z-buffer
(native/gd3d_native.cpp::gd3d_rasterize_mesh, numpy fallback). The GLB files
under test are built in-memory, no assets needed.
"""
import io
import json
import struct

import numpy as np
import pytest

from gd3d.data import glb as glb_mod
from gd3d.data.render_synthetic import (
    fixed_poses, procedural_object, render_mesh, render_object_tree,
    DEFAULT_INTRINSIC,
)
from gd3d import native_runtime


def pack_glb(gltf: dict, binary: bytes) -> bytes:
    body = json.dumps(gltf).encode()
    body += b" " * ((-len(body)) % 4)
    binary += b"\0" * ((-len(binary)) % 4)
    out = struct.pack("<4sII", b"glTF", 2,
                      12 + 8 + len(body) + 8 + len(binary))
    out += struct.pack("<II", len(body), 0x4E4F534A) + body
    out += struct.pack("<II", len(binary), 0x004E4942) + binary
    return out


def _quad_scene_glb(with_texture: bool = False) -> bytes:
    """Two-node scene: a unit quad (indexed u16, COLOR_0 u8 normalized,
    translated by [1, 2, 3]) and a non-indexed red triangle under a
    2x-scale node."""
    segs, views, offset = [], [], 0

    def add(blob, stride=None, align=4):
        nonlocal offset
        pad = (-offset) % align
        if pad:
            segs.append(b"\0" * pad)
            offset += pad
        view = {"buffer": 0, "byteOffset": offset, "byteLength": len(blob)}
        if stride:
            view["byteStride"] = stride
        views.append(view)
        segs.append(blob)
        offset += len(blob)
        return len(views) - 1

    quad_pos = np.array(
        [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32)
    v_pos = add(quad_pos.tobytes())
    quad_idx = np.array([0, 1, 2, 0, 2, 3], np.uint16)
    v_idx = add(quad_idx.tobytes())
    quad_col = np.array(
        [[255, 0, 0, 255], [0, 255, 0, 255], [0, 0, 255, 255],
         [255, 255, 255, 255]], np.uint8)
    v_col = add(quad_col.tobytes())
    tri_pos = np.array([[0, 0, 1], [1, 0, 1], [0, 1, 1]], np.float32)
    v_tri = add(tri_pos.tobytes())

    accessors = [
        {"bufferView": v_pos, "componentType": 5126, "count": 4,
         "type": "VEC3"},
        {"bufferView": v_idx, "componentType": 5123, "count": 6,
         "type": "SCALAR"},
        {"bufferView": v_col, "componentType": 5121, "count": 4,
         "type": "VEC4", "normalized": True},
        {"bufferView": v_tri, "componentType": 5126, "count": 3,
         "type": "VEC3"},
    ]
    quad_attrs = {"POSITION": 0, "COLOR_0": 2}
    materials = [
        {"pbrMetallicRoughness": {"baseColorFactor": [1, 1, 1, 1]}},
        {"pbrMetallicRoughness": {"baseColorFactor": [1, 0, 0, 1]}},
    ]
    gltf = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0, 1]}],
        "nodes": [
            {"mesh": 0, "translation": [1, 2, 3]},
            {"mesh": 1,
             "matrix": [2, 0, 0, 0, 0, 2, 0, 0, 0, 0, 2, 0, 0, 0, 0, 1]},
        ],
        "meshes": [
            {"primitives": [{"attributes": quad_attrs, "indices": 1,
                             "material": 0}]},
            {"primitives": [{"attributes": {"POSITION": 3}, "material": 1}]},
        ],
        "materials": materials,
        "bufferViews": views,
        "buffers": [{"byteLength": 0}],
        "accessors": accessors,
    }
    if with_texture:
        from PIL import Image

        uv = np.array([[0.25, 0.25], [0.75, 0.25], [0.75, 0.75],
                       [0.25, 0.75]], np.float32)
        v_uv = add(uv.tobytes())
        accessors.append({"bufferView": v_uv, "componentType": 5126,
                          "count": 4, "type": "VEC2"})
        quad_attrs["TEXCOORD_0"] = len(accessors) - 1
        # 2x2 texture: TL red, TR green, BL blue, BR white
        tex = np.array([[[255, 0, 0], [0, 255, 0]],
                        [[0, 0, 255], [255, 255, 255]]], np.uint8)
        buf = io.BytesIO()
        Image.fromarray(tex).save(buf, format="PNG")
        v_img = add(buf.getvalue())
        gltf["images"] = [{"bufferView": v_img, "mimeType": "image/png"}]
        gltf["textures"] = [{"source": 0}]
        materials[0]["pbrMetallicRoughness"]["baseColorTexture"] = {
            "index": 0}
        del quad_attrs["COLOR_0"]  # texture path, not vertex-color path
    binary = b"".join(segs)
    gltf["buffers"][0]["byteLength"] = len(binary)
    return pack_glb(gltf, binary)


def test_load_glb_merges_nodes_and_applies_transforms(tmp_path):
    p = tmp_path / "scene.glb"
    p.write_bytes(_quad_scene_glb())
    mesh = glb_mod.load_glb(p)
    assert mesh.verts.shape == (7, 3)
    assert mesh.faces.shape == (3, 3)
    # quad translated by [1,2,3]
    np.testing.assert_allclose(mesh.verts[0], [1, 2, 3])
    np.testing.assert_allclose(mesh.verts[2], [2, 3, 3])
    # triangle scaled 2x by the matrix node (verts[5] = tri_pos[1] = [1,0,1])
    np.testing.assert_allclose(mesh.verts[4], [0, 0, 2])
    np.testing.assert_allclose(mesh.verts[5], [2, 0, 2])
    # COLOR_0 u8-normalized x white base factor
    np.testing.assert_allclose(mesh.colors[0], [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(mesh.colors[3], [1, 1, 1], atol=1e-6)
    # baseColorFactor red on the second primitive
    np.testing.assert_allclose(mesh.colors[4], [1, 0, 0], atol=1e-6)
    # triangle faces reference the merged vertex block
    assert mesh.faces.min() == 0 and mesh.faces.max() == 6


def test_load_glb_texture_sampled_at_vertex_uvs(tmp_path):
    p = tmp_path / "tex.glb"
    p.write_bytes(_quad_scene_glb(with_texture=True))
    mesh = glb_mod.load_glb(p)
    # UV (0.25, 0.25) hits the TL texel center exactly: pure red, etc.
    np.testing.assert_allclose(mesh.colors[0], [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(mesh.colors[1], [0, 1, 0], atol=1e-6)
    np.testing.assert_allclose(mesh.colors[2], [1, 1, 1], atol=1e-6)
    np.testing.assert_allclose(mesh.colors[3], [0, 0, 1], atol=1e-6)


def test_sparse_accessor_overrides_base(tmp_path):
    """glTF 3.6.2.3: sparse (indices, values) override the base view."""
    base = np.zeros((4, 3), np.float32)
    sidx = np.array([1, 3], np.uint16)
    svals = np.array([[1, 2, 3], [7, 8, 9]], np.float32)
    binary = base.tobytes() + sidx.tobytes() + svals.tobytes()
    gltf = {
        "asset": {"version": "2.0"},
        "buffers": [{"byteLength": len(binary)}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": base.nbytes},
            {"buffer": 0, "byteOffset": base.nbytes,
             "byteLength": sidx.nbytes},
            {"buffer": 0, "byteOffset": base.nbytes + sidx.nbytes,
             "byteLength": svals.nbytes},
        ],
        "accessors": [{
            "bufferView": 0, "componentType": 5126, "count": 4,
            "type": "VEC3",
            "sparse": {
                "count": 2,
                "indices": {"bufferView": 1, "componentType": 5123},
                "values": {"bufferView": 2},
            },
        }],
    }
    out = glb_mod.read_accessor(gltf, binary, 0)
    np.testing.assert_allclose(out[0], 0)
    np.testing.assert_allclose(out[1], [1, 2, 3])
    np.testing.assert_allclose(out[2], 0)
    np.testing.assert_allclose(out[3], [7, 8, 9])
    # bufferView-less base is zero-initialized before overrides
    del gltf["accessors"][0]["bufferView"]
    out = glb_mod.read_accessor(gltf, binary, 0)
    np.testing.assert_allclose(out[1], [1, 2, 3])
    np.testing.assert_allclose(out[0], 0)


def test_triangulate_strip_and_fan():
    strip = glb_mod._triangulate(np.arange(5), glb_mod._TRIANGLE_STRIP)
    np.testing.assert_array_equal(
        strip, [[0, 1, 2], [1, 3, 2], [2, 3, 4]])
    fan = glb_mod._triangulate(np.arange(5), glb_mod._TRIANGLE_FAN)
    np.testing.assert_array_equal(fan, [[0, 1, 2], [0, 2, 3], [0, 3, 4]])


def test_normalize_unit_box():
    verts = np.array([[0, 0, 0], [4, 2, 2]], float)
    out = glb_mod.normalize_unit_box(verts)
    assert np.isclose(out.max(0) - out.min(0), [1, 0.5, 0.5]).all()
    np.testing.assert_allclose(out.mean(0), 0, atol=1e-12)


@pytest.mark.skipif(not native_runtime.available(),
                    reason="native library not built")
def test_native_rasterizer_matches_numpy(monkeypatch):
    verts, faces, colors = procedural_object(np.random.RandomState(0))
    pose = fixed_poses(4)[1]
    K = DEFAULT_INTRINSIC * (128 / 512.0)  # intrinsic scaled to render size
    K[2, 2] = 1.0
    rgb_n, depth_n, mask_n = render_mesh(verts, faces, colors, pose, K, 128)
    monkeypatch.setattr(native_runtime, "rasterize_mesh",
                        lambda *a, **k: None)
    rgb_p, depth_p, mask_p = render_mesh(verts, faces, colors, pose, K, 128)
    assert mask_p.any()
    # identical math in double precision: pixel-exact coverage
    np.testing.assert_array_equal(mask_n, mask_p)
    np.testing.assert_allclose(depth_n, depth_p, atol=1e-5)
    assert (np.abs(rgb_n.astype(int) - rgb_p.astype(int)) <= 1).all()


def test_render_glb_tree_end_to_end(tmp_path):
    import cv2

    glb_dir = tmp_path / "glbs"
    glb_dir.mkdir()
    (glb_dir / "objA.glb").write_bytes(_quad_scene_glb())
    out = tmp_path / "tree"
    poses = render_object_tree(
        str(out), ["objA"], n_views=3, size=96, glb_root=str(glb_dir))
    assert poses.shape == (3, 4, 4)
    for i in range(3):
        rgb = cv2.imread(str(out / "objA" / f"color_{i:06d}.png"))
        depth = cv2.imread(str(out / "objA" / f"depth_{i:06d}.png"),
                           cv2.IMREAD_UNCHANGED)
        mask = cv2.imread(str(out / "objA" / f"mask_{i:06d}.png"),
                          cv2.IMREAD_UNCHANGED)
        assert rgb.shape == (96, 96, 3) and depth.dtype == np.uint16
        assert mask.any(), "normalized glb must be visible from every pose"
        # depth in mm at ~2 m camera radius
        vals = depth[mask > 0]
        assert 500 < np.median(vals) < 4000


def test_light_visibility_blocker_casts_shadow():
    """A small quad floating between the light and a ground plane occludes
    the vertices beneath it; uncovered ground stays lit."""
    from gd3d.data.glb import light_visibility
    from gd3d import native_runtime

    if native_runtime.load_library() is None:
        import pytest

        pytest.skip("native rasterizer unbuilt (visibility falls back to 1)")

    # ground plane z=2 (camera space), fine grid so vertices sit under the
    # blocker; blocker quad at z=1 spanning x,y in [-0.2, 0.2]
    n = 21
    xs = np.linspace(-1, 1, n)
    gx, gy = np.meshgrid(xs, xs)
    ground = np.stack([gx.ravel(), gy.ravel(),
                       np.full(n * n, 2.0)], -1)
    tri = []
    for r in range(n - 1):
        for c in range(n - 1):
            a = r * n + c
            tri += [[a, a + 1, a + n], [a + 1, a + n + 1, a + n]]
    b0 = n * n
    blocker = np.array([[-0.2, -0.2, 1.0], [0.2, -0.2, 1.0],
                        [0.2, 0.2, 1.0], [-0.2, 0.2, 1.0]])
    tri += [[b0, b0 + 1, b0 + 2], [b0, b0 + 2, b0 + 3]]
    verts = np.concatenate([ground, blocker])
    faces = np.array(tri, np.int32)

    # light straight above the blocker center
    vis = light_visibility(verts, faces, np.array([0.0, 0.0, 0.0]))
    assert vis.shape == (len(verts),)
    under = (np.abs(ground[:, 0]) < 0.08) & (np.abs(ground[:, 1]) < 0.08)
    outside = (np.abs(ground[:, 0]) > 0.55) | (np.abs(ground[:, 1]) > 0.55)
    assert vis[:n * n][under].mean() < 0.2, "blocker casts no shadow"
    assert vis[:n * n][outside].mean() > 0.95, "open ground wrongly shadowed"
    assert vis[n * n:].mean() > 0.95, "blocker shadows itself"


def test_shadows_only_darken_and_env_kill_switch(tmp_path, monkeypatch):
    """Shadowed render is pixelwise <= the unshadowed one; depth and mask
    are identical; GD3D_RENDER_SHADOWS=0 restores the plain Lambert path."""
    import gd3d.data.render_synthetic as rs

    verts, faces, colors = rs.procedural_object(np.random.RandomState(0))
    # vertex normals: area-weighted face normals accumulated (good enough)
    normals = np.zeros_like(verts)
    fn = np.cross(verts[faces[:, 1]] - verts[faces[:, 0]],
                  verts[faces[:, 2]] - verts[faces[:, 0]])
    for k in range(3):
        np.add.at(normals, faces[:, k], fn)
    normals /= np.maximum(np.linalg.norm(normals, axis=1, keepdims=True),
                          1e-9)
    E = rs.fixed_poses(4)[1]
    K = rs.DEFAULT_INTRINSIC * (128 / 512.0)
    K[2, 2] = 1.0

    monkeypatch.setenv("GD3D_RENDER_SHADOWS", "0")
    rgb_plain, depth_plain, mask_plain = rs.render_mesh(
        verts, faces, colors, E, K, size=128, normals=normals)
    monkeypatch.setenv("GD3D_RENDER_SHADOWS", "1")
    rgb_sh, depth_sh, mask_sh = rs.render_mesh(
        verts, faces, colors, E, K, size=128, normals=normals)

    np.testing.assert_array_equal(depth_plain, depth_sh)
    np.testing.assert_array_equal(mask_plain, mask_sh)
    assert (rgb_sh.astype(int) <= rgb_plain.astype(int) + 1).all(), \
        "shadows may only darken"
