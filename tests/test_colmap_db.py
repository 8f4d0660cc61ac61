"""COLMAP matching-database export: schema, pair-id encoding, keypoint
dedupe and union-find track filtering (the mast3r/colmap/database.py
export_matches semantics, written via stdlib sqlite3)."""
import sqlite3

import numpy as np

from gd3d.colmap_db import MAX_IMAGE_ID, pair_id_of, write_colmap_database


def _read(path, table):
    db = sqlite3.connect(path)
    try:
        return db.execute(f"SELECT * FROM {table}").fetchall()
    finally:
        db.close()


def test_write_colmap_database_roundtrip(tmp_path):
    path = str(tmp_path / "database.db")
    # 3 images; a 3-view track (p0 in all three) and a 2-view track
    m01 = (np.array([[10.0, 20.0], [30.0, 40.0]]),
           np.array([[11.0, 21.0], [31.0, 41.0]]))
    m12 = (np.array([[11.0, 21.0]]), np.array([[12.0, 22.0]]))
    stats = write_colmap_database(
        path, ["a.png", "b.png", "c.png"], (480, 640),
        {(0, 1): m01, (1, 2): m12},
        focals=np.array([500.0, 500.0, 500.0]),
        principal_points=np.array([[320.0, 240.0]] * 3),
        poses_c2w=np.tile(np.eye(4), (3, 1, 1)),
        min_len_track=2)
    assert stats == {"images": 3, "keypoints": 5, "matches": 3}

    cams = _read(path, "cameras")
    assert len(cams) == 3 and cams[0][1] == 1  # PINHOLE
    fx = np.frombuffer(cams[0][4], np.float64)
    np.testing.assert_allclose(fx, [500, 500, 320, 240])

    imgs = _read(path, "images")
    assert [r[1] for r in imgs] == ["a.png", "b.png", "c.png"]
    assert imgs[0][3] == 1.0  # prior_qw of identity pose

    kps = {r[0]: np.frombuffer(r[3], np.float32).reshape(r[1], r[2])
           for r in _read(path, "keypoints")}
    # image 2 (id 2) has TWO keypoints: (11,21) deduped across both pairs
    assert kps[2].shape == (2, 2)

    matches = {r[0]: np.frombuffer(r[3], np.uint32).reshape(r[1], 2)
               for r in _read(path, "matches")}
    assert set(matches) == {pair_id_of(1, 2), pair_id_of(2, 3)}
    assert pair_id_of(2, 3) == 2 * MAX_IMAGE_ID + 3 == pair_id_of(3, 2)
    # two_view_geometries mirror the match blobs (config 2 = calibrated)
    tvg = _read(path, "two_view_geometries")
    assert len(tvg) == 2 and all(r[4] == 2 for r in tvg)


def test_min_len_track_drops_short_tracks(tmp_path):
    path = str(tmp_path / "db3.db")
    # the (30,40)<->(31,41) pair is a 2-observation track; the
    # (10,20)->(11,21)->(12,22) chain spans 3 observations
    m01 = (np.array([[10.0, 20.0], [30.0, 40.0]]),
           np.array([[11.0, 21.0], [31.0, 41.0]]))
    m12 = (np.array([[11.0, 21.0]]), np.array([[12.0, 22.0]]))
    stats = write_colmap_database(
        path, ["a", "b", "c"], (64, 64), {(0, 1): m01, (1, 2): m12},
        min_len_track=3)
    assert stats["matches"] == 2  # only the 3-view track's two pair rows
    matches = {r[0]: r[1] for r in _read(path, "matches")}
    assert matches == {pair_id_of(1, 2): 1, pair_id_of(2, 3): 1}
