import pytest

pytestmark = pytest.mark.slow
import jax
import numpy as np

from gd3d.eval.dust3r_tracker import Dust3rTracker
from gd3d.models.croco import CrocoConfig
from gd3d.models.mast3r import Mast3rConfig
from gd3d.teachers.mast3r import Mast3rTeacher

TINY = Mast3rConfig(
    croco=CrocoConfig(
        patch_size=16, enc_embed_dim=32, enc_depth=2, enc_num_heads=2,
        dec_embed_dim=16, dec_depth=2, dec_num_heads=2,
    ),
    local_feat_dim=6, dpt_feature_dim=32, dpt_last_dim=16,
)


def test_dust3r_tracker_shapes_and_cache():
    teacher = Mast3rTeacher(TINY)
    params = teacher.init_params(jax.random.key(0), hw=(32, 64))
    tracker = Dust3rTracker(teacher, params)
    frames = np.random.RandomState(0).rand(3, 32, 64, 3).astype(np.float32)
    q = np.array([[10, 12, 0], [30, 8, 1]], np.float32)
    tracks = tracker.track(frames, q)
    assert tracks.shape == (2, 3, 2)
    assert (tracks[:, :, 0] < 64).all() and (tracks[:, :, 1] < 32).all()
    # pair cache: 2 source frames x 3 targets
    assert len(tracker._cache) == 6
