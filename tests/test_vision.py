import numpy as np
import jax
import jax.numpy as jnp
import pytest

from shapy_tpu.models.backbones.hrnet import hrnet_forward, hrnet_init
from shapy_tpu.models.backbones.layers import ParamStore, batch_norm
from shapy_tpu.models.backbones.hrnet_import import import_hrnet_state_dict
from shapy_tpu.models.backbones.resnet import resnet_forward, resnet_init
from shapy_tpu.models.cameras import build_cam_proj, WeakPerspectiveCamera
from shapy_tpu.models.heads.mlp import mlp_forward, mlp_init
from shapy_tpu.models.heads.pose_space import (
    build_pose_parameterization,
    global_rot_mean_flipped,
)


@pytest.fixture(scope="module")
def hrnet_params():
    return hrnet_init(seed=0)


def test_hrnet_shapes_and_param_count(hrnet_params):
    n_params = sum(int(np.prod(v.shape)) for v in hrnet_params.values())
    # HRNet-W48 + ExPose head is ~70-80M params
    assert 60e6 < n_params < 120e6
    out = hrnet_forward(hrnet_params, jnp.zeros((2, 64, 64, 3)),
                        return_stages=True)
    assert out["concat"].shape == (2, 2048)
    assert out["layer1"].shape == (2, 16, 16, 48)
    assert out["layer4"].shape == (2, 2, 2, 384)


def test_hrnet_jit_and_batch_independence(hrnet_params):
    fwd = jax.jit(lambda p, x: hrnet_forward(p, x)["concat"])
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 64, 64, 3)),
                    jnp.float32)
    out = fwd(hrnet_params, x)
    out_flip = fwd(hrnet_params, x[::-1])
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_flip[::-1]),
                               atol=2e-4)


def test_hrnet_torch_roundtrip(hrnet_params):
    """Simulate a torch state dict (OIHW) and re-import it."""
    torch_sd = {}
    for k, v in hrnet_params.items():
        arr = np.asarray(v)
        if k.endswith(".weight") and arr.ndim == 4:
            arr = arr.transpose(3, 2, 0, 1)
        torch_sd[k] = arr
    torch_sd["bn1.num_batches_tracked"] = np.asarray(0)
    imported = import_hrnet_state_dict(torch_sd)
    assert set(imported) == set(hrnet_params)
    for k in hrnet_params:
        np.testing.assert_array_equal(np.asarray(imported[k]),
                                      np.asarray(hrnet_params[k]))


def test_hrnet_batchnorm_train_updates(hrnet_params):
    store = ParamStore(dict(hrnet_params))
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 64, 64, 3)),
                    jnp.float32)
    hrnet_forward(store.params, x, train=True, _store=store)
    assert len(store.stat_updates) > 0
    assert any(k.endswith("running_mean") for k in store.stat_updates)


def test_hrnet_remat_matches_plain(hrnet_params):
    """Every remat mode must be a pure memory/speed trade: identical
    outputs, identical batch-stat updates, identical gradients."""
    x = jnp.asarray(np.random.default_rng(2).normal(size=(2, 64, 64, 3)),
                    jnp.float32)

    def loss(params, remat):
        store = ParamStore(dict(params))
        out = hrnet_forward(store.params, x, train=True, remat=remat,
                            _store=store)
        return jnp.sum(out["concat"] ** 2) * 1e-3, store.stat_updates

    (l0, s0), g0 = jax.value_and_grad(loss, has_aux=True)(
        hrnet_params, "none")
    for mode in ("stages", "convs"):
        (l1, s1), g1 = jax.value_and_grad(loss, has_aux=True)(
            hrnet_params, mode)
        np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
        assert set(s0) == set(s1) and len(s0) > 0
        for k in s0:
            np.testing.assert_allclose(
                np.asarray(s0[k]), np.asarray(s1[k]), atol=1e-6)
        for k in g0:
            np.testing.assert_allclose(
                np.asarray(g0[k]), np.asarray(g1[k]), atol=1e-5,
                err_msg=f"grad mismatch at {k} (remat={mode})")


def test_batch_norm_matches_torch_semantics():
    import torch

    rng = np.random.default_rng(3)
    x = rng.normal(size=(4, 8, 8, 6)).astype(np.float32)
    bn = torch.nn.BatchNorm2d(6, momentum=0.1)
    bn.weight.data = torch.tensor(rng.normal(size=6).astype(np.float32))
    bn.bias.data = torch.tensor(rng.normal(size=6).astype(np.float32))
    bn.running_mean.data = torch.tensor(
        rng.normal(size=6).astype(np.float32))
    bn.running_var.data = torch.tensor(
        rng.uniform(0.5, 2, size=6).astype(np.float32))

    # jnp.asarray on CPU may alias numpy views of torch buffers (zero-copy),
    # and torch updates running stats in place — copy defensively.
    params = {
        "bn.weight": jnp.asarray(bn.weight.detach().numpy().copy()),
        "bn.bias": jnp.asarray(bn.bias.detach().numpy().copy()),
        "bn.running_mean": jnp.asarray(bn.running_mean.numpy().copy()),
        "bn.running_var": jnp.asarray(bn.running_var.numpy().copy()),
    }
    store = ParamStore(params)

    # Eval mode
    bn.eval()
    ref = bn(torch.tensor(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1)
    ours = batch_norm(store, "bn", jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(ours), ref.detach().numpy(),
                               atol=1e-5)

    # Train mode: outputs + running-stat updates
    bn.train()
    ref_t = bn(torch.tensor(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1)
    ours_t = batch_norm(store, "bn", jnp.asarray(x), train=True)
    np.testing.assert_allclose(np.asarray(ours_t), ref_t.detach().numpy(),
                               atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(store.stat_updates["bn.running_mean"]),
        bn.running_mean.numpy(), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(store.stat_updates["bn.running_var"]),
        bn.running_var.numpy(), atol=1e-4)


def test_batch_norm_custom_vjp_matches_autodiff_and_torch():
    """The train-mode BN backward is a hand-written custom_vjp (the
    round-3 train-step perf lever, see layers.bn_train_core). It must be
    gradient-identical to (a) differentiating through the moments and
    (b) torch.nn.BatchNorm2d."""
    import torch

    from shapy_tpu.models.backbones.layers import (
        _bn_train_core, bn_train_core)

    rng = np.random.default_rng(7)
    x = rng.normal(size=(4, 8, 8, 6)).astype(np.float32)
    gamma = rng.normal(size=6).astype(np.float32)
    beta = rng.normal(size=6).astype(np.float32)
    dy = rng.normal(size=(4, 8, 8, 6)).astype(np.float32)

    def loss(f, x_, g_, b_):
        y, _, _ = f(x_, g_, b_, 1e-5, None)
        return jnp.sum(y * jnp.asarray(dy))

    g_custom = jax.grad(
        lambda *a: loss(bn_train_core, *a), argnums=(0, 1, 2)
    )(jnp.asarray(x), jnp.asarray(gamma), jnp.asarray(beta))
    g_auto = jax.grad(
        lambda *a: loss(_bn_train_core, *a), argnums=(0, 1, 2)
    )(jnp.asarray(x), jnp.asarray(gamma), jnp.asarray(beta))
    for a, c in zip(g_auto, g_custom):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   atol=1e-5)

    bn = torch.nn.BatchNorm2d(6, momentum=0.1)
    bn.weight.data = torch.tensor(gamma)
    bn.bias.data = torch.tensor(beta)
    bn.train()
    xt = torch.tensor(x, requires_grad=True)
    yt = bn(xt.permute(0, 3, 1, 2)).permute(0, 2, 3, 1)
    (yt * torch.tensor(dy)).sum().backward()
    np.testing.assert_allclose(np.asarray(g_custom[0]),
                               xt.grad.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(g_custom[1]),
                               bn.weight.grad.numpy(), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(g_custom[2]),
                               bn.bias.grad.numpy(), rtol=1e-4)


def test_resnet50(capsys):
    params = resnet_init(50, seed=0)
    out = resnet_forward(params, jnp.zeros((1, 64, 64, 3)), depth=50)
    assert out["avg_pooling"].shape == (1, 2048)


def test_weak_persp_camera():
    cam = WeakPerspectiveCamera()
    pts = jnp.asarray([[[1.0, 2.0, 3.0]]])
    scale = jnp.asarray([[2.0]])
    transl = jnp.asarray([[0.5, -0.5]])
    # scale AFTER translation add (reference default)
    np.testing.assert_allclose(
        np.asarray(cam(pts, scale, transl))[0, 0], [3.0, 3.0], atol=1e-6
    )
    cam_sf = WeakPerspectiveCamera(scale_first=True)
    np.testing.assert_allclose(
        np.asarray(cam_sf(pts, scale, transl))[0, 0], [2.5, 3.5], atol=1e-6
    )


def test_cam_proj_mean_softplus():
    data = build_cam_proj({"type": "weak-persp", "pos_func": "softplus"})
    # softplus(mean) == 0.9
    assert float(jax.nn.softplus(jnp.asarray(data["mean"][0]))) == \
        pytest.approx(0.9, abs=1e-5)
    assert data["dim"] == 3


def test_pose_space_6d_identity_and_flip():
    space = build_pose_parameterization(21, "cont_rot_repr")
    assert space.dim == 126
    mats = space.decoder(jnp.asarray(space.mean)[None])
    np.testing.assert_allclose(
        np.asarray(mats[0]), np.broadcast_to(np.eye(3), (21, 3, 3)),
        atol=1e-6)
    g = build_pose_parameterization(1, "cont_rot_repr")
    flipped = global_rot_mean_flipped(g)
    R = np.asarray(g.decoder(jnp.asarray(flipped)[None]))[0, 0]
    np.testing.assert_allclose(R, np.diag([1.0, -1.0, -1.0]), atol=1e-6)


def test_mlp_head():
    params = mlp_init(32, 8, (16, 16), seed=0)
    out = mlp_forward(params, jnp.ones((4, 32)), 2)
    assert out.shape == (4, 8)
    # output layer gain keeps outputs small
    assert float(jnp.abs(out).max()) < 1.0
