"""Tests for structures, discriminator, RNN head, CWH, fit-measurements."""

import numpy as np
import jax.numpy as jnp
import pytest

from shapy_tpu.data.structures import (
    BoundingBox,
    GlobalRot,
    ImageList,
    Keypoints2D,
    Keypoints3D,
    Vertices,
)
from shapy_tpu.models.discriminator import build_discriminator


def test_keypoints2d_structure(rng):
    kp = np.zeros((135, 3), np.float32)
    kp[:25, :2] = rng.uniform(10, 90, (25, 2))
    kp[:25, 2] = 1.0
    k2d = Keypoints2D(kp, (100, 120, 3), source="openpose25_v1")
    k2d.add_field("center", np.asarray([50.0, 50.0]))

    # crop + normalize
    cropped = k2d.crop([50, 50], 0.5, crop_size=64)
    assert cropped.keypoints.shape == (135, 3)
    norm = cropped.normalize()
    valid = norm.keypoints[norm.conf > 0]
    assert np.abs(valid[:, :2]).max() < 2.0

    # flip is involutive on positions
    flipped = k2d.flip().flip()
    np.testing.assert_allclose(flipped.keypoints, k2d.keypoints, atol=1e-5)

    # cross-format remap preserves named joints
    smplx = k2d.to_dset("smplx")
    from shapy_tpu.data.keypoints import OPENPOSE25_NAMES, SMPLX_NAMES

    i_src = OPENPOSE25_NAMES.index("left_ankle")
    i_dst = SMPLX_NAMES.index("left_ankle")
    np.testing.assert_allclose(
        smplx.keypoints[i_dst], kp[i_src], atol=1e-6
    )


def test_keypoints3d_flip_rotate(rng):
    kp = rng.normal(size=(24, 4)).astype(np.float32)
    k3d = Keypoints3D(kp, source="smpl")
    rot = k3d.rotate(90.0)
    # 90deg rotation about z: (x, y) -> (-y, x)
    np.testing.assert_allclose(rot.keypoints[:, 0], -kp[:, 1], atol=1e-5)
    flipped = k3d.flip()
    from shapy_tpu.data.keypoints import SMPL_NAMES

    i_l = SMPL_NAMES.index("left_hip")
    i_r = SMPL_NAMES.index("right_hip")
    np.testing.assert_allclose(
        flipped.keypoints[i_l, 1:3], kp[i_r, 1:3], atol=1e-6
    )
    np.testing.assert_allclose(
        flipped.keypoints[i_l, 0], -kp[i_r, 0], atol=1e-6
    )


def test_bbox_and_imagelist():
    bb = BoundingBox([10, 20, 50, 80], (100, 120, 3))
    flipped = bb.flip()
    np.testing.assert_allclose(flipped.bbox, [120 - 1 - 50, 20,
                                              120 - 1 - 10, 80])
    center, scale, size = bb.to_center_scale()
    np.testing.assert_allclose(center, [30, 50])

    imgs = [np.ones((50, 60, 3)), np.ones((70, 40, 3))]
    il = ImageList.from_images(imgs)
    assert il.tensor.shape == (2, 70, 60, 3)
    assert il.sizes == [(50, 60), (70, 40)]


def test_global_rot_flip():
    g = GlobalRot(np.asarray([0.1, 0.2, 0.3]))
    f = g.flip()
    np.testing.assert_allclose(f.value, [0.1, -0.2, -0.3])


def test_vertices_flip_index():
    v = np.asarray([[1.0, 0, 0], [2, 0, 0], [3, 0, 0]], np.float32)
    flip_index = np.asarray([1, 0, 2])
    out = Vertices(v, flip_index=flip_index).flip()
    np.testing.assert_allclose(out.vertices[:, 0], [-2, -1, -3])


def test_discriminator(rng):
    disc = build_discriminator({"type": "per-joint",
                                "num_joints": 21, "num_betas": 10})
    from tests.golden_numpy import random_rotmats

    rots = jnp.asarray(random_rotmats(rng, (4, 21)), jnp.float32)
    betas = jnp.asarray(rng.normal(size=(4, 10)), jnp.float32)
    logits = disc(rots, betas)
    assert logits.shape == (4, 23)  # 21 per-joint + all-joints + shape
    assert np.isfinite(np.asarray(logits)).all()


def test_hmr_discriminator_matches_reference_shapes(rng):
    """The default 'hmr' discriminator mirrors the reference topology
    (models/discriminator/build.py:45-90): (B, J+1) logits, spectral
    norm keeps every effective weight at unit spectral radius."""
    from tests.golden_numpy import random_rotmats

    disc = build_discriminator({"num_joints": 21})
    rots = jnp.asarray(random_rotmats(rng, (4, 21)), jnp.float32)
    logits, upd = disc.apply(disc.params, rots, train=True)
    assert logits.shape == (4, 22)  # 21 part logits + 1 full-pose logit
    assert np.isfinite(np.asarray(logits)).all()
    assert set(upd) == set(disc.LAYERS)

    # After a few power iterations the normalised weight has sigma ~1.
    params = disc.params
    for _ in range(50):
        _, upd = disc.apply(params, rots, train=True)
        for k, u in upd.items():
            params[k] = dict(params[k], u=u)
    w = np.asarray(params["linear1"]["weight"])
    u = np.asarray(params["linear1"]["u"])
    from shapy_tpu.models.discriminator.build import _spectral_sigma
    sigma, _ = _spectral_sigma(jnp.asarray(w).T, jnp.asarray(u))
    top = np.linalg.svd(w, compute_uv=False)[0]
    assert abs(float(sigma) - top) / top < 0.02


def test_rnn_iterative_head(smplx_data):
    from shapy_tpu.models.body import SMPLX
    from shapy_tpu.models.heads import SMPLXRegressor

    model = SMPLX(model_data=smplx_data)
    reg = SMPLXRegressor(
        body_model_cfg={"smplx": {
            "global_rot": {"param_type": "cont_rot_repr"},
            "body_pose": {"param_type": "cont_rot_repr"},
        }},
        network_cfg={
            "type": "iterative-rnn",
            "num_stages": 2,
            "predict_hands": False,
            "predict_face": False,
            "backbone": {"type": "resnet", "depth": 18},
            "rnn": {"hidden_dims": (64,)},
        },
        body_model=model,
    )
    out = reg(jnp.zeros((2, 64, 64, 3)))
    assert out["stage_01"]["betas"].shape == (2, 10)


def test_cwh_measurements(rng):
    from shapy_tpu.measure import MeasurementAnchors
    from shapy_tpu.measure.cwh import ChestWaistHipsMeasurements
    from shapy_tpu.models.body.assets import icosphere

    verts, faces = icosphere(3)
    verts = verts * np.asarray([0.3, 0.8, 0.25])
    anchors = MeasurementAnchors.synthetic(faces, verts)
    cwh = ChestWaistHipsMeasurements(anchors=anchors,
                                     num_hull_directions=128)
    out = cwh.forward(jnp.asarray(verts[faces], jnp.float32)[None])
    m = out["measurements"]
    assert set(m) == {"chest", "waist", "hips"}
    assert float(m["chest"]["tensor"][0]) > 0


def test_fit_measurements(smplx_data):
    from shapy_tpu.measure import BodyMeasurements, MeasurementAnchors
    from shapy_tpu.measure.fit_measurements import (
        fit_betas_to_measurements,
    )
    from shapy_tpu.models.body import SMPLX

    model = SMPLX(model_data=smplx_data)
    anchors = MeasurementAnchors.synthetic(
        model.faces, np.asarray(model.params["v_template"])
    )
    meas = BodyMeasurements(anchors=anchors, num_hull_directions=64)

    # Target: the measurements of a known betas vector
    target_betas = jnp.full((1, 10), 0.8)
    v = model.forward_shape(target_betas)["v_shaped"]
    target = {
        k: float(v_["tensor"][0])
        for k, v_ in meas.forward(v[:, model.faces])["measurements"].items()
        if k in ("height", "chest", "waist", "hips")
    }
    result = fit_betas_to_measurements(
        model, meas, target, num_steps=150, learning_rate=0.1,
        shape_prior_weight=1e-5,
    )
    fitted = result["measurements"]
    for k, tgt in target.items():
        assert float(fitted[k][0]) == pytest.approx(tgt, abs=0.01), k
    assert result["losses"][-1] < result["losses"][0]


def test_adversarial_losses(rng):
    """LSGAN + WGAN-GP semantics (reference losses.py:242-332): an end-
    to-end generator/discriminator step on the HMR discriminator."""
    import jax

    from shapy_tpu.losses.adversarial import build_adv_loss
    from shapy_tpu.models.discriminator import build_discriminator
    from tests.golden_numpy import random_rotmats

    disc = build_discriminator({"num_joints": 21})
    fake = jnp.asarray(random_rotmats(rng, (4, 21)), jnp.float32)
    real = jnp.asarray(random_rotmats(rng, (4, 21)), jnp.float32)

    def disc_apply(params, x):
        return disc.apply(params, x)[0]

    for cfg in ({"type": "lsgan", "weight": 2.0},
                {"type": "wgan-gp", "weight": 1.0,
                 "wgan_gp": {"gp_weight": 10.0, "gamma": 1.0}}):
        adv = build_adv_loss(disc_apply, cfg)
        g_loss = adv.generator_loss(disc.params, fake)
        d_loss, aux = adv.discriminator_loss(
            disc.params, fake, real, rng=jax.random.PRNGKey(1))
        assert np.isfinite(float(g_loss)) and np.isfinite(float(d_loss))
        # Both directions are differentiable
        g_grad = jax.grad(
            lambda f: adv.generator_loss(disc.params, f))(fake)
        d_grad = jax.grad(
            lambda p: adv.discriminator_loss(
                p, fake, real, rng=jax.random.PRNGKey(2))[0]
        )(disc.params)
        assert np.isfinite(np.asarray(g_grad)).all()
        assert all(
            np.isfinite(np.asarray(v)).all()
            for leaf in d_grad.values() for v in leaf.values()
        )
    # LSGAN perfect-fake sanity: if scores were exactly 1 the gen loss is 0
    adv = build_adv_loss(lambda p, x: jnp.ones((x.shape[0], 22)),
                         {"type": "lsgan"})
    assert float(adv.generator_loss(None, fake)) == 0.0


def test_loss_factory_covers_reference_types():
    """Every type the reference build_loss accepts (losses.py:46-75)
    builds and evaluates here."""
    import torch

    from shapy_tpu.losses.losses import LOSS_FACTORY, build_loss

    for t in ("gmof", "keypoints", "l2", "weighted-l1", "keypoint-edge",
              "vertex-edge", "bce", "bce-logits", "cross-entropy", "l1",
              "rotation"):
        assert t in LOSS_FACTORY, t

    # cross-entropy matches torch incl. ignore_index
    logits = np.random.default_rng(3).normal(size=(6, 4)).astype(np.float32)
    labels = np.array([0, 1, 2, -100, 3, 1])
    ours = float(build_loss("cross-entropy")(
        jnp.asarray(logits), jnp.asarray(labels)))
    ref = float(torch.nn.CrossEntropyLoss()(
        torch.from_numpy(logits), torch.from_numpy(labels)))
    assert abs(ours - ref) < 1e-5

    # l1 matches torch
    a = np.random.default_rng(4).normal(size=(5, 3)).astype(np.float32)
    b = np.random.default_rng(5).normal(size=(5, 3)).astype(np.float32)
    ours = float(build_loss("l1")(jnp.asarray(a), jnp.asarray(b)))
    ref = float(torch.nn.L1Loss()(torch.from_numpy(a), torch.from_numpy(b)))
    assert abs(ours - ref) < 1e-6
