"""Waymo raw->tree preprocessor (gd3d/data/preprocess_waymo.py): tfrecord
framing + crc32c, protobuf wire decoding, range-image -> point-cloud
geometry (inverse-pair roundtrip: the test builds range images FROM known
3D points, the module must decode them back), and the full fabricated
.tfrecord -> WaymoViews loader roundtrip."""
import io
import json
import os
import os.path as osp
import struct
import zlib

import numpy as np
import pytest
from PIL import Image

from gd3d.data.preprocess_waymo import (
    AXES_TRANSFORMATION,
    WaymoFrame,
    compute_inclination,
    crc32c,
    decode_packed_varints,
    frame_point_cloud,
    masked_crc32c,
    read_tfrecords,
    run_waymo,
)
from gd3d.data.stereo_views import read_depth_float


# ----------------------------------------------- protobuf wire encoders
def _vint(v: int) -> bytes:
    """Non-negative varint; int32 negatives go through 64-bit two's
    complement, as protobuf encodes them."""
    if v < 0:
        v &= (1 << 64) - 1
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _tag(field: int, wire: int) -> bytes:
    return _vint(field << 3 | wire)


def _ld(field: int, payload: bytes) -> bytes:
    return _tag(field, 2) + _vint(len(payload)) + payload


def _dbl(field: int, v: float) -> bytes:
    return _tag(field, 1) + struct.pack("<d", v)


def _enc_transform(mat4) -> bytes:
    # unpacked repeated double, the proto2 default waymo files use
    return b"".join(_dbl(1, float(v)) for v in np.ravel(mat4))


def _enc_matrix(arr, kind: str) -> bytes:
    """zlib(MatrixFloat/MatrixInt32): data=1 packed, shape=2{dims=1}."""
    arr = np.asarray(arr)
    if kind == "float":
        data = _ld(1, np.asarray(arr, "<f4").tobytes())
    else:
        data = _ld(1, b"".join(_vint(int(v)) for v in arr.ravel()))
    shape = _ld(2, _ld(1, b"".join(_vint(d) for d in arr.shape)))
    return zlib.compress(data + shape)


def _enc_camera_calib(name, intrinsic, extrinsic, width, height) -> bytes:
    return (_tag(1, 0) + _vint(name)
            + b"".join(_dbl(2, float(v)) for v in intrinsic)
            + _ld(3, _enc_transform(extrinsic))
            + _tag(4, 0) + _vint(width) + _tag(5, 0) + _vint(height))


def _enc_laser_calib(name, extrinsic, incl_min=None, incl_max=None,
                     beam_inclinations=None) -> bytes:
    out = _tag(1, 0) + _vint(name)
    if beam_inclinations is not None:
        out += b"".join(_dbl(2, float(v)) for v in beam_inclinations)
    if incl_min is not None:
        out += _dbl(3, incl_min) + _dbl(4, incl_max)
    return out + _ld(5, _enc_transform(extrinsic))


def _enc_frame(context_name, cam_calibs, laser_calibs, pose, images,
               lasers) -> bytes:
    ctx = _ld(1, context_name.encode())
    ctx += b"".join(_ld(2, c) for c in cam_calibs)
    ctx += b"".join(_ld(3, c) for c in laser_calibs)
    out = _ld(1, ctx) + _ld(3, _enc_transform(pose))
    for name, jpeg, img_pose, ts in images:
        out += _ld(4, _tag(1, 0) + _vint(name) + _ld(2, jpeg)
                   + _ld(3, _enc_transform(img_pose)) + _dbl(5, ts))
    for name, ri, cp, ri_pose in lasers:
        range_image = _ld(2, ri) + _ld(3, cp)
        if ri_pose is not None:
            range_image += _ld(4, ri_pose)
        out += _ld(5, _tag(1, 0) + _vint(name) + _ld(2, range_image))
    return out


def _write_tfrecord(path, records) -> None:
    with open(path, "wb") as f:
        for r in records:
            ln = struct.pack("<Q", len(r))
            f.write(ln + struct.pack("<I", masked_crc32c(ln)) + r
                    + struct.pack("<I", masked_crc32c(r)))


# ------------------------------------------------------------ low level
def test_crc32c_known_values():
    # RFC 3720 B.4 test vectors
    assert crc32c(b"") == 0
    assert crc32c(b"\x00" * 32) == 0x8A9136AA
    assert crc32c(b"\xff" * 32) == 0x62A8AB43
    assert crc32c(bytes(range(32))) == 0x46DD794E


def test_tfrecord_roundtrip_and_corruption(tmp_path):
    records = [b"hello", b"", b"x" * 1000]
    path = str(tmp_path / "a.tfrecord")
    _write_tfrecord(path, records)
    assert list(read_tfrecords(path, verify_crc=True)) == records
    # flip a payload byte: caught only under verify_crc
    raw = bytearray(open(path, "rb").read())
    raw[14] ^= 0xFF  # inside record 0's payload
    with open(path, "wb") as f:
        f.write(raw)
    assert list(read_tfrecords(path)) != records
    with pytest.raises(ValueError, match="payload crc"):
        list(read_tfrecords(path, verify_crc=True))
    # flip a length byte: always caught
    raw[0] ^= 0xFF
    with open(path, "wb") as f:
        f.write(raw)
    with pytest.raises(ValueError, match="length crc"):
        list(read_tfrecords(path))


def test_decode_packed_varints_matches_scalar():
    rng = np.random.default_rng(0)
    vals = np.concatenate([
        rng.integers(0, 128, 20, dtype=np.uint64),
        rng.integers(0, 1 << 31, 20, dtype=np.uint64),
        np.asarray([0, 1, 127, 128, (1 << 32) - 1, 1 << 40], np.uint64),
        # int32 negatives as protobuf encodes them (64-bit 2's complement)
        np.asarray([v & ((1 << 64) - 1) for v in (-1, -5, -(1 << 31))],
                   np.uint64),
    ])
    buf = b"".join(_vint(int(v)) for v in vals)
    np.testing.assert_array_equal(decode_packed_varints(buf), vals)
    # int32 reinterpretation
    as_i32 = decode_packed_varints(buf).astype(np.int64).astype(np.int32)
    assert as_i32[-3] == -1 and as_i32[-2] == -5


# --------------------------------------------------- fabricated dataset
def _rot_z(theta):
    c, s = np.cos(theta), np.sin(theta)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float64)


def _spherical_to_vehicle(r, incl, az, extrinsic):
    """Test-side inverse of the module's decode: one lidar return at
    (range, inclination, azimuth) -> vehicle-frame point."""
    p = np.array([np.cos(az) * np.cos(incl) * r,
                  np.sin(az) * np.cos(incl) * r,
                  np.sin(incl) * r])
    return extrinsic[:3, :3] @ p + extrinsic[:3, 3]


def _make_scene():
    """Two-frame sequence: FRONT camera + TOP lidar (computed beams,
    per-pixel pose) + FRONT lidar (explicit beams, yawed extrinsic)."""
    rng = np.random.default_rng(3)
    W_img, H_img = 96, 64
    K = np.array([[80.0, 0, 48.0], [0, 80.0, 32.0], [0, 0, 1]])
    intrinsic = [80.0, 80.0, 48.0, 32.0, 0.0, 0.0, 0.0, 0.0, 0.0]
    cam_to_car = np.eye(4)
    cam_to_car[:3, 3] = [0.5, 0.1, -0.2]

    top_ext = np.eye(4)
    top_ext[:3, 3] = [1.2, 0.0, 2.0]
    front_ext = np.eye(4)
    front_ext[:3, :3] = _rot_z(0.3)
    front_ext[:3, 3] = [2.0, -0.1, 0.5]
    front_incl = np.array([-0.2, -0.1, 0.05, 0.2])

    jpeg_buf = io.BytesIO()
    img = (rng.random((H_img, W_img, 3)) * 255).astype(np.uint8)
    Image.fromarray(img).save(jpeg_buf, format="JPEG")

    cam_calibs = [_enc_camera_calib(1, intrinsic, cam_to_car, W_img, H_img)]
    laser_calibs = [
        _enc_laser_calib(1, top_ext, incl_min=-0.4, incl_max=0.3),
        _enc_laser_calib(2, front_ext, beam_inclinations=front_incl),
    ]

    H_ri, W_ri = 4, 8
    frames_bytes, truth = [], []
    for f in range(2):
        yaw, t_f = 0.1 * f, np.array([2.0 * f, 0.5 * f, 0.0])
        pose = np.eye(4)
        pose[:3, :3] = _rot_z(yaw)
        pose[:3, 3] = t_f

        expected = []  # (vehicle point, laser tag)
        ri_top = np.zeros((H_ri, W_ri, 4), np.float32)
        # TOP: computed inclinations, reversed so row 0 = top beam
        incl_top = compute_inclination(-0.4, 0.3, H_ri)[::-1]
        # middle columns look forward (az ~ +-0.39 within the camera
        # FOV), bottom rows look down toward camera height
        for (i, j, r) in [(3, 3, 8.0), (2, 4, 9.0), (3, 4, 4.5)]:
            ri_top[i, j, 0] = r
            az = ((W_ri - j - 0.5) / W_ri * 2 - 1) * np.pi  # az_corr = 0
            expected.append(
                (_spherical_to_vehicle(np.float32(r), incl_top[i], az,
                                       top_ext), "top"))
        ri_front = np.zeros((H_ri, W_ri, 4), np.float32)
        az_corr = 0.3  # atan2 of the Rz(0.3) extrinsic
        incl_front = front_incl[::-1]
        for (i, j, r) in [(2, 3, 7.0), (3, 4, 11.0)]:
            ri_front[i, j, 0] = r
            az = ((W_ri - j - 0.5) / W_ri * 2 - 1) * np.pi - az_corr
            expected.append(
                (_spherical_to_vehicle(np.float32(r), incl_front[i], az,
                                       front_ext), "front"))

        # camera projections: project each live return through the camera
        trf = AXES_TRANSFORMATION @ np.linalg.inv(cam_to_car)
        cp_top = np.zeros((H_ri, W_ri, 6), np.int32)
        cp_front = np.zeros((H_ri, W_ri, 6), np.int32)
        cells = {"top": [(3, 3), (2, 4), (3, 4)],
                 "front": [(2, 3), (3, 4)]}
        cell_iter = {"top": iter(cells["top"]), "front": iter(cells["front"])}
        for pt, tag in expected:
            i, j = next(cell_iter[tag])
            p_cam = trf[:3, :3] @ pt + trf[:3, 3]
            if p_cam[2] > 0.5:
                px = K[0, 0] * p_cam[0] / p_cam[2] + K[0, 2]
                py = K[1, 1] * p_cam[1] / p_cam[2] + K[1, 2]
                if 0 <= px < W_img and 0 <= py < H_img:
                    cp = cp_top if tag == "top" else cp_front
                    cp[i, j, :3] = (1, round(px), round(py))
                    truth.append((f, pt, p_cam))

        # per-pixel top-lidar pose == the frame pose (roll=pitch=0)
        ri_pose = np.zeros((H_ri, W_ri, 6), np.float32)
        ri_pose[..., 2] = yaw
        ri_pose[..., 3:] = t_f

        frames_bytes.append(_enc_frame(
            "segment-test", cam_calibs, laser_calibs, pose,
            [(1, jpeg_buf.getvalue(), pose, 1.5 + f)],
            [(1, _enc_matrix(ri_top, "float"),
              _enc_matrix(cp_top, "int32"),
              _enc_matrix(ri_pose, "float")),
             (2, _enc_matrix(ri_front, "float"),
              _enc_matrix(cp_front, "int32"), None)]))
        if f == 0:
            frame0_expected = [e[0] for e in expected]
    assert len(truth) >= 3, "fabricated scene projects too few points"
    return dict(frames_bytes=frames_bytes, truth=truth, K=K,
                cam_to_car=cam_to_car, img_size=(W_img, H_img),
                frame0_expected=frame0_expected)


def test_frame_proto_and_point_cloud_roundtrip(tmp_path):
    scene = _make_scene()
    frame = WaymoFrame(scene["frames_bytes"][0])
    assert frame.context_name == "segment-test"
    assert [c["name"] for c in frame.camera_calibrations] == [1]
    assert frame.camera_calibrations[0]["width"] == 96
    np.testing.assert_allclose(
        frame.camera_calibrations[0]["extrinsic"], scene["cam_to_car"])
    points, cp = frame_point_cloud(frame)
    # the module must decode the range images back to the exact points
    # the test built them from (sorted for order independence)
    expect = np.array(sorted(map(tuple, scene["frame0_expected"])))
    got = np.array(sorted(map(tuple, points)))
    np.testing.assert_allclose(got, expect, atol=1e-4)
    assert cp.shape == (len(points), 6)


def _run_pipeline(tmp_path, scene):
    raw = tmp_path / "raw"
    out = tmp_path / "out"
    os.makedirs(raw)
    seq = "segment-test.tfrecord"
    _write_tfrecord(str(raw / seq), scene["frames_bytes"])
    np.savez(tmp_path / "waymo_pairs.npz",
             scenes=np.array([seq]),
             frames=np.array([f"{i:05d}_1" for i in range(2)]),
             pairs=np.array([[0, 0, 1]]))

    class Args:
        raw_dir = str(raw)
        output_dir = str(out)
        pairs_dir = str(tmp_path / "waymo_pairs.npz")

    run_waymo(Args)
    return out


def test_run_waymo_tree_and_geometry(tmp_path):
    scene = _make_scene()
    out = _run_pipeline(tmp_path, scene)
    seq = "segment-test.tfrecord"
    assert not osp.isdir(out / "tmp"), "tmp tree must be removed"
    assert osp.isfile(out / "waymo_pairs.npz")
    for f in range(2):
        for ext in (".jpg", ".npz"):
            assert osp.isfile(out / seq / f"{f:05d}_1{ext}")

    W_img, H_img = scene["img_size"]
    scale = 512.0 / W_img  # long side is W
    data = np.load(out / seq / "00000_1.npz")
    K2 = data["intrinsics"]
    img = Image.open(out / seq / "00000_1.jpg")
    assert img.size[0] == 512
    np.testing.assert_allclose(data["distortion"], np.zeros(5))
    # cam2world = car_to_world @ cam_to_car @ inv(axes) at frame 0
    # (frame-0 pose is identity)
    np.testing.assert_allclose(
        data["cam2world"],
        scene["cam_to_car"] @ np.linalg.inv(AXES_TRANSFORMATION),
        atol=1e-12)

    depth = read_depth_float(str(out / seq / "00000_1.exr"))
    assert depth.shape == (img.size[1], img.size[0])
    smap = K2 @ np.linalg.inv(scene["K"])
    checked = 0
    for f, pt, p_cam in scene["truth"]:
        if f != 0:
            continue
        px = np.array([round(scene["K"][0, 0] * p_cam[0] / p_cam[2]
                             + scene["K"][0, 2]),
                       round(scene["K"][1, 1] * p_cam[1] / p_cam[2]
                             + scene["K"][1, 2])], np.float64)
        x, y = np.round(smap[:2, :2] @ px + smap[:2, 2]).astype(int)
        assert abs(depth[y, x] - p_cam[2]) < 1e-3, (x, y)
        checked += 1
    assert checked >= 2
    # intrinsics scaled by ~512/96 (colmap half-pixel convention)
    assert abs(K2[0, 0] / scene["K"][0, 0] - scale) < 0.01


def test_waymo_views_loads_preprocessed_tree(tmp_path):
    from gd3d.data.stereo_views import WaymoViews

    scene = _make_scene()
    out = _run_pipeline(tmp_path, scene)
    ds = WaymoViews(str(out), resolution=(48, 32), seed=11)
    assert len(ds) == 1 and ds.is_metric_scale
    views = ds[0]
    assert len(views) == 2
    for v in views:
        assert v["img"].shape == (3, 32, 48) or v["img"].shape == (32, 48, 3)
        assert v["dataset"] == "Waymo"
        assert np.isfinite(v["camera_pose"]).all()
