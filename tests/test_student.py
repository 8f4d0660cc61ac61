"""Student wrapper: feature APIs, depth head pairwise trick, param split."""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from gd3d.core.config import StudentConfig
from gd3d.models.student import Student, merge_params, split_params

SMALL = StudentConfig(
    embed_dim=32,
    depth=4,
    num_heads=2,
    patch_size=8,
    pretrain_img_size=32,
    lora_start_block=2,
    use_adapters=True,
    adapter_bottleneck=8,
    target_res=64,
    downsample_factor=8,
    depth_head_hidden=16,
)


def make_student():
    s = Student(SMALL)
    params = s.init(jax.random.key(0), img_size=32)
    return s, params


@pytest.mark.slow
def test_get_feature_shapes():
    s, params = make_student()
    rgbs = jnp.asarray(np.random.RandomState(0).rand(1, 48, 64, 3), jnp.float32)
    pts = jnp.asarray(np.random.RandomState(1).rand(1, 10, 2) * 40, jnp.float32)
    feat = s.get_feature(params, rgbs, pts)
    assert feat.shape == (1, 10, 32)
    norms = np.linalg.norm(np.asarray(feat), axis=-1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-4)

    feat2, gfeat = s.get_feature(params, rgbs, pts, global_feature=True)
    assert gfeat.shape == (1, 32)
    np.testing.assert_allclose(np.asarray(feat2), np.asarray(feat), rtol=1e-5)


def test_get_feature_cost_shape():
    s, params = make_student()
    rgbs = jnp.asarray(np.random.RandomState(2).rand(1, 32, 48, 3), jnp.float32)
    cost_feat = s.get_feature_cost(params, rgbs)
    assert cost_feat.shape == (1, 4, 6, 32)


@pytest.mark.slow
def test_get_intermediate_feature():
    s, params = make_student()
    rgbs = jnp.asarray(np.random.RandomState(3).rand(1, 64, 64, 3), jnp.float32)
    pts = jnp.asarray(np.random.RandomState(4).rand(1, 7, 2) * 60, jnp.float32)
    feat = s.get_intermediate_feature(params, rgbs, pts, n=(0, 1, 2, 3))
    assert feat.shape == (1, 7, 32)
    feat2, cls = s.get_intermediate_feature(
        params, rgbs, pts, n=(0, 1), return_class_token=True
    )
    assert cls.shape == (1, 32)


def test_pairwise_score_diff_matches_direct():
    s, params = make_student()
    feats = jnp.asarray(np.random.RandomState(5).randn(1, 6, 32), jnp.float32)
    pair = np.asarray(s.pairwise_score_diff(params, feats))
    # direct: head(f_j - f_i) for each i, j
    direct = np.zeros((1, 6, 6), np.float32)
    for i in range(6):
        diff = feats[:, :, :] - feats[:, i : i + 1, :]  # f_j - f_i
        direct[:, i, :] = np.asarray(s.depth_diff(params, diff))
    np.testing.assert_allclose(pair, direct, rtol=1e-4, atol=1e-5)


def test_split_params_trainable_only():
    s, params = make_student()
    trainable, frozen = split_params(params)
    flat_t = jax.tree_util.tree_leaves(trainable)
    flat_all = jax.tree_util.tree_leaves(params)
    n_t = sum(x.size for x in flat_t)
    n_all = sum(x.size for x in flat_all)
    assert 0 < n_t < n_all
    # merge roundtrip
    merged = merge_params(trainable, frozen)
    for a, b in zip(
        jax.tree_util.tree_leaves(merged), jax.tree_util.tree_leaves(params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # frozen tree must not contain lora/adapter/head leaves
    paths = jax.tree_util.tree_flatten_with_path(frozen)[0]
    for path, leaf in paths:
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        assert "lora" not in name and "adapter" not in name
        assert "depth_diff_head" not in name and "refine_conv" not in name


@pytest.mark.slow
def test_dense_grid_features_stride_override():
    s, params = make_student()
    rgbs = jnp.asarray(np.random.RandomState(6).rand(1, 48, 48, 3), jnp.float32)
    g16 = s.dense_grid_features(params, rgbs)  # stride = patch = 8 here
    assert g16.shape == (1, 6, 6, 32)
    g8 = s.dense_grid_features(params, rgbs, stride=4)
    assert g8.shape == (1, 11, 11, 32)


def test_intermediate_only_pass_truncates_trunk_identically():
    """Cost passes tap layer 7 of 12 with final_tokens=False; the trunk is
    truncated past the deepest tap (the weight-stacked scan cannot DCE the
    remaining iterations). Numerics must be IDENTICAL to the full run."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gd3d.models.student import Student, normalize_img

    cfg = StudentConfig(
        embed_dim=64, depth=12, num_heads=2, patch_size=16,
        pretrain_img_size=32, lora_start_block=4, use_adapters=True,
        adapter_bottleneck=8, target_res=64, depth_head_hidden=16,
    )
    s = Student(cfg)
    p = s.init(jax.random.key(0), img_size=32)
    rgb = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3),
                      jnp.float32)
    x = normalize_img(rgb)
    trunc = s.forward_tokens(p, x, take_indices=(4, 5, 6, 7),
                             final_tokens=False)
    full = s.forward_tokens(p, x, take_indices=(4, 5, 6, 7),
                            final_tokens=True)
    for a, b in zip(trunc["intermediates"], full["intermediates"]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
