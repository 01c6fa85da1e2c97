"""Numeric parity against the reference implementation itself.

These tests import *actual reference source files* (via
``tests/reference_compat.py``) with random weights and assert output
equality against the JAX rebuild. They retire the riskiest "importer
correctness" caveats: HRNet-W48 full graph, lbs(), Polynomial, the
iterative-regression stage loop, pose decoders, and cameras.

Reference files exercised:
  regressor/human_shape/models/backbone/hrnet.py:426-498
  regressor/human_shape/models/body_models/lbs.py:99-196
  regressor/human_shape/models/common/networks.py:308-592
  regressor/human_shape/models/common/pose_utils.py:120-155
  regressor/human_shape/models/camera/camera_projection.py:92-213
  attributes/attributes/attributes_betas/polynomial.py:21-141
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from tests import reference_compat as rc


@pytest.fixture()
def rng():
    """Function-scoped deterministic rng (shadows the session fixture):
    parity tolerances must not depend on which tests ran before."""
    return np.random.default_rng(20260816)


def _np(t):
    return t.detach().cpu().numpy()


# ---------------------------------------------------------------------------
# rotations
# ---------------------------------------------------------------------------

def test_rodrigues_parity(rng):
    from shapy_tpu.core.rotations import aa_to_rotmat

    rot_utils = rc.load_ref_lbs()  # pulls human_shape.utils with it
    import sys

    batch_rodrigues = sys.modules["human_shape.utils"].batch_rodrigues

    aa = rng.normal(size=(24, 3)).astype(np.float32)
    ref = _np(batch_rodrigues(torch.from_numpy(aa)))
    got = np.asarray(aa_to_rotmat(jnp.asarray(aa)[None]))[0]
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_rot6d_decoder_parity(rng):
    from shapy_tpu.core.rotations import rot6d_to_rotmat

    pose_utils = rc.load_ref_pose_utils()
    dec = pose_utils.ContinuousRotReprDecoder(num_angles=7)

    raw = rng.normal(size=(3, 7 * 6)).astype(np.float32)
    ref = _np(dec(torch.from_numpy(raw)))
    got = np.asarray(rot6d_to_rotmat(jnp.asarray(raw).reshape(3, 7, 6)))
    np.testing.assert_allclose(got, ref, atol=1e-5)


# ---------------------------------------------------------------------------
# cameras
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("scale_first", [False, True])
def test_weak_persp_camera_parity(rng, scale_first):
    from shapy_tpu.models.cameras import WeakPerspectiveCamera

    cam_mod = rc.load_ref_camera()
    ref_cam = cam_mod.WeakPerspectiveCamera(scale_first=scale_first)

    pts = rng.normal(size=(4, 11, 3)).astype(np.float32)
    scale = rng.uniform(0.5, 2.0, size=(4, 1)).astype(np.float32)
    transl = rng.normal(size=(4, 2)).astype(np.float32)

    ref = _np(
        ref_cam(torch.from_numpy(pts), torch.from_numpy(scale),
                torch.from_numpy(transl))
    )
    got = np.asarray(
        WeakPerspectiveCamera(scale_first=scale_first)(
            jnp.asarray(pts), jnp.asarray(scale), jnp.asarray(transl)
        )
    )
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_persp_camera_parity(rng):
    from shapy_tpu.models.cameras import PerspectiveCamera

    cam_mod = rc.load_ref_camera()
    ref_cam = cam_mod.PerspectiveCamera()

    B, N = 3, 9
    pts = (rng.normal(size=(B, N, 3)) * 0.5).astype(np.float32)
    pts[..., 2] += 5.0  # keep well in front of the camera
    transl = rng.normal(size=(B, 3)).astype(np.float32) * 0.1
    aa = rng.normal(size=(B, 3)).astype(np.float32) * 0.2
    import sys

    rotmat = _np(
        sys.modules["human_shape.utils"].batch_rodrigues(
            torch.from_numpy(aa)
        )
    )

    ref = _np(
        ref_cam(
            torch.from_numpy(pts),
            rotation=torch.from_numpy(rotmat),
            translation=torch.from_numpy(transl),
        )
    )
    got = np.asarray(
        PerspectiveCamera()(
            jnp.asarray(pts),
            rotation=jnp.asarray(rotmat),
            translation=jnp.asarray(transl),
        )
    )
    # projected pixels are O(1e3); rtol covers f32 rounding at that scale
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-5)


# ---------------------------------------------------------------------------
# lbs
# ---------------------------------------------------------------------------

def _random_body(rng, V=40, J=8, L=10):
    verts = rng.normal(size=(V, 3)).astype(np.float32)
    shapedirs = (rng.normal(size=(V, 3, L)) * 0.03).astype(np.float32)
    P = 9 * (J - 1)
    posedirs = (rng.normal(size=(P, V * 3)) * 0.01).astype(np.float32)
    J_regressor = rng.uniform(size=(J, V)).astype(np.float32)
    J_regressor /= J_regressor.sum(axis=1, keepdims=True)
    lbs_weights = rng.uniform(size=(V, J)).astype(np.float32)
    lbs_weights /= lbs_weights.sum(axis=1, keepdims=True)
    parents = np.zeros(J, dtype=np.int64)
    parents[0] = -1
    for j in range(1, J):
        parents[j] = (j - 1) // 2
    return verts, shapedirs, posedirs, J_regressor, lbs_weights, parents


@pytest.mark.parametrize("pose2rot", [True, False])
def test_lbs_parity(rng, pose2rot):
    from shapy_tpu.models.body.lbs import lbs as jax_lbs
    from shapy_tpu.core.rotations import aa_to_rotmat

    ref_lbs_mod = rc.load_ref_lbs()

    V, J, L, B = 40, 8, 10, 3
    (verts, shapedirs, posedirs, J_regressor, lbs_weights,
     parents) = _random_body(rng, V, J, L)
    betas = rng.normal(size=(B, L)).astype(np.float32)
    aa = (rng.normal(size=(B, J * 3)) * 0.3).astype(np.float32)

    if pose2rot:
        pose_t = torch.from_numpy(aa)
        pose_j = jnp.asarray(aa)
    else:
        rots = np.asarray(aa_to_rotmat(jnp.asarray(aa).reshape(B, J, 3)))
        pose_t = torch.from_numpy(rots.copy())  # (B, J, 3, 3)
        pose_j = jnp.asarray(rots)

    ref = ref_lbs_mod.lbs(
        torch.from_numpy(betas),
        pose_t,
        torch.from_numpy(verts),
        torch.from_numpy(shapedirs),
        torch.from_numpy(posedirs),
        torch.from_numpy(J_regressor),
        torch.from_numpy(parents),
        torch.from_numpy(lbs_weights),
        pose2rot=pose2rot,
    )
    got = jax_lbs(
        jnp.asarray(betas),
        pose_j,
        jnp.asarray(verts),
        jnp.asarray(shapedirs),
        jnp.asarray(posedirs),
        jnp.asarray(J_regressor),
        parents,
        jnp.asarray(lbs_weights),
        pose2rot=pose2rot,
    )
    np.testing.assert_allclose(
        np.asarray(got["v_shaped"]), _np(ref["v_shaped"]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got["joints"]), _np(ref["joints"]), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(got["vertices"]), _np(ref["vertices"]), atol=1e-4
    )


# ---------------------------------------------------------------------------
# polynomial (shipped S2A/A2S model)
# ---------------------------------------------------------------------------

def test_polynomial_forward_parity(rng):
    from shapy_tpu.models.attributes.polynomial import Polynomial

    poly_mod = rc.load_ref_polynomial()
    ref = poly_mod.Polynomial(input_dim=6, output_dim=4, degree=2)
    with torch.no_grad():
        ref.linear.weight.normal_(generator=torch.Generator().manual_seed(3))
        ref.linear.bias.normal_(generator=torch.Generator().manual_seed(4))
    ref.eval()

    mine = Polynomial(
        6, 4, degree=2,
        weight=_np(ref.linear.weight), bias=_np(ref.linear.bias),
    )
    assert mine.coeff_size == ref.coeff_size

    x = rng.normal(size=(5, 6)).astype(np.float32)
    ref_out = _np(ref.forward(torch.from_numpy(x)))
    got = np.asarray(mine(jnp.asarray(x)))
    np.testing.assert_allclose(got, ref_out, atol=1e-5)


def test_polynomial_fit_parity(rng):
    """Our closed-form ridge == the reference's sklearn-pipeline fit."""
    from shapy_tpu.models.attributes.polynomial import Polynomial

    poly_mod = rc.load_ref_polynomial()

    X = rng.normal(size=(80, 5)).astype(np.float64)
    W = rng.normal(size=(5 + 15, 3))
    Y = np.concatenate([X, (X[:, :, None] * X[:, None, :]).reshape(80, -1)
                        [:, :15]], axis=1) @ W + 0.1 * rng.normal(
                            size=(80, 3))

    for alpha in (0.0, 100.0):
        ref = poly_mod.Polynomial(
            input_dim=5, output_dim=3, degree=2, alpha=alpha
        ).fit(X, Y)
        mine = Polynomial(5, 3, degree=2, alpha=alpha).fit(X, Y)
        xt = rng.normal(size=(7, 5)).astype(np.float32)
        ref_out = _np(ref.forward(torch.from_numpy(xt)))
        got = np.asarray(mine(jnp.asarray(xt)))
        np.testing.assert_allclose(got, ref_out, atol=2e-4)


# ---------------------------------------------------------------------------
# MLP + iterative regression stage loop
# ---------------------------------------------------------------------------

def test_mlp_forward_parity(rng):
    from shapy_tpu.models.heads.mlp import mlp_forward

    networks = rc.load_ref_networks()
    ref = networks.MLP(
        input_dim=20, output_dim=9, layers=[31, 17],
        activation={"type": "none"}, normalization={"type": "none"},
        dropout=0.5,
    )
    rc.randomize_state_dict(ref, seed=11)
    ref.eval()

    params = {
        k: jnp.asarray(v) for k, v in rc.state_dict_numpy(ref).items()
    }
    x = rng.normal(size=(4, 20)).astype(np.float32)
    ref_out = _np(ref(torch.from_numpy(x)))
    got = np.asarray(
        mlp_forward(params, jnp.asarray(x), num_layers=2, activation=None,
                    dropout=0.5, train=False)
    )
    np.testing.assert_allclose(got, ref_out, atol=1e-5)


def test_mlp_relu_parity(rng):
    from shapy_tpu.models.heads.mlp import mlp_forward

    networks = rc.load_ref_networks()
    ref = networks.MLP(
        input_dim=12, output_dim=5, layers=[16],
        activation={"type": "relu"}, normalization={"type": "none"},
    )
    rc.randomize_state_dict(ref, seed=12)
    ref.eval()
    params = {
        k: jnp.asarray(v) for k, v in rc.state_dict_numpy(ref).items()
    }
    x = rng.normal(size=(4, 12)).astype(np.float32)
    ref_out = _np(ref(torch.from_numpy(x)))
    got = np.asarray(
        mlp_forward(params, jnp.asarray(x), num_layers=1, activation="relu",
                    train=False)
    )
    np.testing.assert_allclose(got, ref_out, atol=1e-5)


def test_iterative_regression_stage_loop_parity(rng):
    """Our regressor's stage loop (regressor.py:276-309) matches the
    reference IterativeRegression (networks.py:492-592): same per-stage
    parameters given the same MLP weights, mean, and features."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    reg = ge._build_flagship(subdivisions=1, mlp_layers=(32,),
                             backbone="resnet50")

    networks = rc.load_ref_networks()
    feat_dim, param_dim = reg.feat_dim, reg.param_dim
    ref_mlp = networks.MLP(
        input_dim=feat_dim + param_dim, output_dim=param_dim, layers=[32],
        activation={"type": "none"}, normalization={"type": "none"},
        dropout=0.5,
    )
    rc.randomize_state_dict(ref_mlp, seed=21)
    mean = torch.randn(
        1, param_dim, generator=torch.Generator().manual_seed(22)
    )
    ref_iter = networks.IterativeRegression(
        ref_mlp, mean, num_stages=reg.num_stages
    )
    ref_iter.eval()

    # Copy the ref weights into our param pytree (state-dict-key naming).
    head = {
        k[len("module."):]: jnp.asarray(v)
        for k, v in rc.state_dict_numpy(ref_iter).items()
        if k.startswith("module.")
    }
    params = dict(reg.params)
    params["head"] = head
    params["param_mean"] = jnp.asarray(_np(mean))

    feats = rng.normal(size=(3, feat_dim)).astype(np.float32)
    ref_params, ref_deltas = ref_iter(torch.from_numpy(feats))
    got_stages = reg.iterative_stages(params, jnp.asarray(feats),
                                      train=False)
    assert len(got_stages) == len(ref_params)
    for got, ref in zip(got_stages, ref_params):
        np.testing.assert_allclose(np.asarray(got), _np(ref), atol=2e-4)


# ---------------------------------------------------------------------------
# keypoint format registry
# ---------------------------------------------------------------------------

def test_keypoint_registry_matches_reference():
    """Every reference format's name table is reproduced exactly
    (reference keypoint_names.py KEYPOINT_NAMES_DICT, all ~34 formats)."""
    from shapy_tpu.data.keypoints import KEYPOINT_NAMES_DICT as mine

    ref = rc.load_ref_keypoint_names().KEYPOINT_NAMES_DICT
    missing = [k for k in ref if k not in mine]
    assert not missing, f"formats missing from rebuild: {missing}"
    for fmt, names in ref.items():
        assert list(mine[fmt]) == list(names), (
            f"format {fmt!r} differs: "
            + str([
                (i, a, b)
                for i, (a, b) in enumerate(zip(mine[fmt], names))
                if a != b
            ][:10])
            + f" (lens {len(mine[fmt])} vs {len(names)})"
        )


def test_keypoint_parts_match_reference():
    """Part index sets match the reference KEYPOINT_PARTS_DICT for the
    formats the losses/visualisers slice."""
    from shapy_tpu.data.keypoints import get_part_idxs

    kn = rc.load_ref_keypoint_names()
    for fmt in kn.KEYPOINT_NAMES_DICT:
        ref_parts = kn.KEYPOINT_PARTS_DICT[fmt]
        mine = get_part_idxs(fmt)
        for part in ("body", "left_hand", "right_hand", "face", "head"):
            if part not in ref_parts:
                continue
            assert sorted(mine[part].tolist()) == sorted(
                np.asarray(ref_parts[part]).tolist()
            ), f"{fmt}/{part}"


# ---------------------------------------------------------------------------
# HRNet-W48 full graph
# ---------------------------------------------------------------------------

def _hrnet_parity(use_old_impl: bool, rng):
    from shapy_tpu.models.backbones.hrnet import hrnet_forward
    from shapy_tpu.models.backbones.hrnet_import import (
        import_hrnet_state_dict,
    )

    hrnet_mod = rc.load_ref_hrnet()
    ref = hrnet_mod.HighResolutionNet(rc.hrnet_w48_cfg(use_old_impl))
    rc.randomize_state_dict(ref, seed=31 + use_old_impl)
    ref.eval()

    x = rng.normal(size=(2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x))

    params = import_hrnet_state_dict(rc.state_dict_numpy(ref))
    got = hrnet_forward(
        params, jnp.asarray(x.transpose(0, 2, 3, 1)),
        old_impl=use_old_impl, return_stages=True,
    )

    ref_concat = _np(ref_out["concat"])
    got_concat = np.asarray(got["concat"])
    assert np.std(ref_concat) > 1e-3, "reference output carries no signal"
    np.testing.assert_allclose(got_concat, ref_concat, atol=5e-4, rtol=1e-3)

    # Stage maps too (NCHW vs NHWC transpose). Slightly looser: XLA and
    # torch accumulate the ~100-conv chain in different orders, so a
    # handful of elements drift ~1% relative at f32.
    for key in ref_out:
        if key.startswith("layer") and key in got:
            np.testing.assert_allclose(
                np.asarray(got[key]).transpose(0, 3, 1, 2),
                _np(ref_out[key]), atol=1e-2, rtol=2e-2,
            )


def test_hrnet_full_graph_parity(rng):
    _hrnet_parity(False, rng)


def test_hrnet_old_impl_parity(rng):
    _hrnet_parity(True, rng)


# ---------------------------------------------------------------------------
# ResNet-50 full graph
# ---------------------------------------------------------------------------

def test_resnet50_parity(rng):
    """Our resnet_forward == the reference's RegressionResNet(resnet50)
    (models/backbone/resnet.py:14-150, torchvision topology) with random
    weights, eval mode (BN-folded on our side)."""
    from shapy_tpu.models.backbones.hrnet_import import (
        import_hrnet_state_dict,
    )
    from shapy_tpu.models.backbones.resnet import resnet_forward

    rmod = rc.load_ref_resnet()
    ref = rmod.resnets["resnet50"](pretrained=False)
    rc.randomize_state_dict(ref, seed=47)
    ref.eval()

    x = rng.normal(size=(2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x))

    params = import_hrnet_state_dict(rc.state_dict_numpy(ref))
    got = resnet_forward(params, jnp.asarray(x.transpose(0, 2, 3, 1)),
                         depth=50)

    np.testing.assert_allclose(
        np.asarray(got["avg_pooling"]), _np(ref_out["avg_pooling"]),
        atol=5e-4, rtol=1e-3,
    )
    for key in ("layer1", "layer2", "layer3", "layer4"):
        np.testing.assert_allclose(
            np.asarray(got[key]).transpose(0, 3, 1, 2),
            _np(ref_out[key]), atol=1e-2, rtol=2e-2,
        )


# ---------------------------------------------------------------------------
# GMM pose prior
# ---------------------------------------------------------------------------

def test_gmm_prior_parity(rng, tmp_path):
    """Our make_gmm_prior == the reference GMMPrior (priors.py:254-379)
    for both likelihood modes, on a synthesized GMM pickle."""
    import pickle

    from shapy_tpu.losses.priors import make_gmm_prior

    K, D, B = 4, 9, 6
    means = rng.normal(size=(K, D)).astype(np.float64)
    covs = []
    for _ in range(K):
        a = rng.normal(size=(D, D))
        covs.append(a @ a.T + np.eye(D) * 0.5)
    covs = np.stack(covs)
    weights = rng.uniform(0.5, 1.5, size=K)
    weights = weights / weights.sum()
    path = str(tmp_path / "gmm.pkl")
    with open(path, "wb") as f:
        pickle.dump({"means": means, "covars": covs,
                     "weights": weights}, f)

    pmod = rc.load_ref_priors()
    pose = rng.normal(size=(B, D)).astype(np.float32)

    for use_max in (False, True):
        ref = pmod.GMMPrior(path, num_gaussians=K, use_max=use_max)
        ref_val = float(ref(torch.from_numpy(pose)))
        ours = make_gmm_prior(path, num_gaussians=K, use_max=use_max)
        got = float(ours(jnp.asarray(pose)))
        assert got == pytest.approx(ref_val, rel=1e-4), f"use_max={use_max}"


# ---------------------------------------------------------------------------
# crop warp
# ---------------------------------------------------------------------------

def test_crop_warp_parity(rng):
    """Our single-affine crop == the reference hourglass crop
    (transf_utils.py:9-100) pixel-for-pixel (away from the border
    where the reference's pad-then-rotate and our one-warp differ in
    extrapolation), across scales and rotations."""
    import importlib.util

    rc.setup()  # installs the loguru stub the reference file imports
    spec = importlib.util.spec_from_file_location(
        "ref_transf_utils",
        "/root/reference/regressor/human_shape/utils/transf_utils.py",
    )
    tu_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tu_mod)

    from shapy_tpu.data.crop import crop_image

    # Smooth low-frequency content: the reference resamples via PIL
    # resize (area/antialias kernel) while ours is a single bilinear
    # affine — identical geometry (delta-image argmax and gradient
    # corners agree to <0.05 px) but different interpolation kernels,
    # which diverge on per-pixel noise. Real crops are photographs, so
    # smooth content is the meaningful comparison.
    yy, xx = np.mgrid[0:123, 0:97].astype(np.float32)
    img = np.stack([
        127 + 90 * np.sin(xx / 17.0) * np.cos(yy / 23.0),
        127 + 90 * np.cos(xx / 11.0 + 1.0),
        127 + 90 * np.sin(yy / 13.0 + 2.0),
    ], axis=-1).astype(np.float32)
    res = (64, 64)
    for center, scale in (
        ((50.0, 60.0), 0.35),
        ((40.0, 70.0), 0.5),
        ((48.0, 61.0), 0.4),
    ):
        ref = tu_mod.crop(img, np.asarray(center), scale, res, rot=0)
        got = crop_image(img, np.asarray(center), scale, res, rot_deg=0)
        assert got.shape == ref.shape
        # The reference downsamples via PIL (area/antialias kernel),
        # we use one bilinear warp — same geometry, different kernels.
        # A 3x3 box blur cancels the kernel difference; any >=1 px
        # misalignment would survive it. 4px interior margin tolerates
        # border extrapolation differences.
        import cv2

        # 8px interior margin: at scale 0.5 centred at x=40 the crop
        # extends 10 source px past the image edge (~7 crop px of
        # differently-extrapolated border).
        a = cv2.blur(np.asarray(got), (3, 3))[8:-8, 8:-8]
        b = cv2.blur(np.asarray(ref), (3, 3))[8:-8, 8:-8]
        # Residual differences after the blur are <3/255 (~1%): PIL's
        # top-left-aligned resize vs our exact affine differ by a
        # ~0.05 px convention offset. atol=4 bounds that while still
        # failing on any >=1 px misalignment (which shifts smooth
        # content by ~10/255 at these wavelengths).
        close = np.isclose(a, b, atol=4.0)
        assert close.mean() > 0.99, (center, scale, close.mean())

    # Rotated crops: the reference resamples TWICE (PIL resize, then
    # rotate on the padded crop) where we warp once — intentionally
    # sharper (transforms.py module docstring), so pixel equality is not
    # the spec. Verify the geometry instead: a delta image must land on
    # the same crop pixel under rotation.
    for rot in (15.0, -30.0):
        delta_r = np.zeros((123, 97, 3), np.float32)
        delta_r[70, 40] = 100.0
        ref = tu_mod.crop(delta_r, np.asarray([48.0, 61.0]), 0.4, res,
                          rot=rot)
        got = crop_image(delta_r, np.asarray([48.0, 61.0]), 0.4, res,
                         rot_deg=rot)
        ri = np.unravel_index(np.argmax(ref[..., 0]), res)
        gi = np.unravel_index(np.argmax(np.asarray(got)[..., 0]), res)
        assert abs(ri[0] - gi[0]) <= 1 and abs(ri[1] - gi[1]) <= 1, (
            rot, ri, gi)

    # Exact geometric alignment: a delta image lands on the same crop
    # pixel, and a linear ramp matches at the corners to < 0.1 px.
    delta = np.zeros((123, 97, 3), np.float32)
    delta[60, 50] = 100.0
    ref = tu_mod.crop(delta, np.asarray([50.0, 60.0]), 0.35, res, rot=0)
    got = crop_image(delta, np.asarray([50.0, 60.0]), 0.35, res, rot_deg=0)
    assert (np.unravel_index(np.argmax(ref[..., 0]), res)
            == np.unravel_index(np.argmax(np.asarray(got)[..., 0]), res))
    ramp = np.tile(np.arange(97, dtype=np.float32), (123, 1))[..., None]
    ramp = np.repeat(ramp, 3, axis=-1)
    ref = tu_mod.crop(ramp, np.asarray([50.0, 60.0]), 0.35, res, rot=0)
    got = crop_image(ramp, np.asarray([50.0, 60.0]), 0.35, res, rot_deg=0)
    assert abs(float(ref[0, 0, 0]) - float(got[0, 0, 0])) < 0.1
    assert abs(float(ref[-1, -1, 0]) - float(got[-1, -1, 0])) < 0.1


def test_loss_normalisation_parity(rng):
    """The loss-weight configs are calibrated against the reference's
    exact reductions — value parity for KeypointLoss (division='batch'),
    WeightedMSELoss/WeightedL1Loss (sum / B), the geodesic
    RotationDistance, L2Prior (0.5 * mean), and the attributes
    VertexEdgeLoss (squared-L2, per-item sum, batch mean)."""
    import torch

    from shapy_tpu.losses.losses import (
        keypoint_loss, l2_loss, rotation_loss, vertex_edge_loss,
        weighted_l1_loss)
    from shapy_tpu.losses.priors import l2_prior

    ref = rc.load_ref_losses()

    B, N, D = 3, 25, 2
    pred = rng.normal(size=(B, N, D)).astype(np.float32)
    gt = rng.normal(size=(B, N, D)).astype(np.float32)
    conf = rng.uniform(0, 1, size=(B, N)).astype(np.float32)
    conf[0, :5] = 0.0

    for norm_type in ("l1", "l2"):
        kl = ref.KeypointLoss(norm_type=norm_type)  # division='batch'
        want = kl(torch.tensor(pred), torch.tensor(gt),
                  weights=torch.tensor(conf)).item()
        got = float(keypoint_loss(jnp.asarray(pred), jnp.asarray(gt),
                                  jnp.asarray(conf),
                                  norm_type=norm_type))
        np.testing.assert_allclose(got, want, rtol=1e-5)

    betas_p = rng.normal(size=(B, 10)).astype(np.float32)
    betas_g = rng.normal(size=(B, 10)).astype(np.float32)
    want = ref.WeightedMSELoss()(
        torch.tensor(betas_p), torch.tensor(betas_g)).item()
    got = float(l2_loss(jnp.asarray(betas_p), jnp.asarray(betas_g)))
    np.testing.assert_allclose(got, want, rtol=1e-5)
    want = ref.WeightedL1Loss()(
        torch.tensor(betas_p), torch.tensor(betas_g)).item()
    got = float(weighted_l1_loss(jnp.asarray(betas_p),
                                 jnp.asarray(betas_g)))
    np.testing.assert_allclose(got, want, rtol=1e-5)
    # weighted variants
    w = rng.uniform(0, 1, size=(B,)).astype(np.float32)
    want = ref.WeightedMSELoss()(
        torch.tensor(betas_p), torch.tensor(betas_g),
        weights=torch.tensor(w)).item()
    got = float(l2_loss(jnp.asarray(betas_p), jnp.asarray(betas_g),
                        jnp.asarray(w)))
    np.testing.assert_allclose(got, want, rtol=1e-5)

    # rotation: random rotations via axis-angle exponentials
    from shapy_tpu.core.rotations import aa_to_rotmat

    J = 4
    aa_p = rng.normal(size=(B, J, 3)).astype(np.float32) * 0.7
    aa_g = rng.normal(size=(B, J, 3)).astype(np.float32) * 0.7
    Rp = np.asarray(aa_to_rotmat(jnp.asarray(aa_p)))
    Rg = np.asarray(aa_to_rotmat(jnp.asarray(aa_g)))
    want = ref.RotationDistance()(
        torch.tensor(Rp), torch.tensor(Rg)).item()
    got = float(rotation_loss(jnp.asarray(Rp), jnp.asarray(Rg)))
    np.testing.assert_allclose(got, want, rtol=1e-4)

    # L2Prior
    priors = rc.load_ref_priors()
    x = rng.normal(size=(B, 63)).astype(np.float32)
    want = priors.L2Prior()(torch.tensor(x)).item()
    got = float(l2_prior(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-5)

    # VertexEdgeLoss (attributes package; pure-torch module)
    mesh_losses = rc._load_file(
        "attributes_utils_losses", "attributes/attributes/utils/losses.py"
    )
    V, E = 30, 50
    verts_g = rng.normal(size=(B, V, 3)).astype(np.float32)
    verts_p = rng.normal(size=(B, V, 3)).astype(np.float32)
    edges = rng.integers(0, V, size=(E, 2)).astype(np.int64)
    vel = mesh_losses.VertexEdgeLoss(
        norm_type="l2", gt_edges=edges, est_edges=edges)
    want = vel(torch.tensor(verts_g), torch.tensor(verts_p)).item()
    got = float(vertex_edge_loss(jnp.asarray(verts_p),
                                 jnp.asarray(verts_g), edges))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_alignment_point_error_parity(rng):
    """Eval alignments + point error vs the ACTUAL reference metrics
    module (utils/metrics.py:16-305). The reference's TranslationAlignment
    shifts est into gt's frame while ours centres both sets; the aligned
    DIFFERENCE (the only thing PointError consumes) is invariant to that
    frame choice, so differences and per-point errors are compared."""
    from shapy_tpu.eval import metrics as ours

    rm = rc.load_ref_metrics()
    B, P = 3, 40
    base = rng.normal(size=(B, P, 3)).astype(np.float64)
    A = rng.normal(size=(3, 3))
    Q, _ = np.linalg.qr(A)
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    gt64 = (1.37 * base @ Q.T + rng.normal(size=(1, 1, 3))
            + 0.03 * rng.normal(size=base.shape))
    est, gt = base.astype(np.float32), gt64.astype(np.float32)

    cases = [("none", None), ("translation", None), ("scale", None),
             ("procrustes", None), ("root", [2, 5])]
    for name, root in cases:
        ref_align = (rm.build_alignment(name, root=root) if root
                     else rm.build_alignment(name))
        ref_hat, ref_gt = ref_align(est.copy(), gt.copy())
        ref_err = rm.point_error(ref_hat, ref_gt)

        our_align = (ours.build_alignment(name, root=tuple(root)) if root
                     else ours.build_alignment(name))
        our_hat, our_gt = our_align(jnp.asarray(est), jnp.asarray(gt))
        our_err = np.asarray(
            ours.point_error(np.asarray(our_hat), np.asarray(our_gt)))
        np.testing.assert_allclose(our_err, ref_err, atol=5e-4,
                                   err_msg=name)
        np.testing.assert_allclose(
            np.asarray(our_hat) - np.asarray(our_gt), ref_hat - ref_gt,
            atol=5e-4, err_msg=name)


def test_mpjpe14_parity(rng):
    """mpjpe14 vs the ACTUAL reference computation (evaluation.py:161-190):
    est14 = einsum('jv,bvn->bjn', J14_regressor, vertices) followed by
    PointError under root([2, 3]) / procrustes alignments — exactly what
    Evaluator.compute_batch_metrics emits as mpjpe14_{root,procrustes}."""
    from shapy_tpu.eval.evaluator import Evaluator

    rm = rc.load_ref_metrics()
    B, V = 3, 120
    verts = rng.normal(size=(B, V, 3)).astype(np.float32)
    j14 = rng.uniform(size=(14, V)).astype(np.float32)
    j14 /= j14.sum(axis=1, keepdims=True)
    gt14 = (np.einsum("jv,bvn->bjn", j14, verts)
            + 0.05 * rng.normal(size=(B, 14, 3))).astype(np.float32)

    # Reference: einsum + PointError(alignment) per alignment, then the
    # per-sample mean over joints (run() averages the flattened
    # (B, J) metric array, evaluation.py:757-760).
    est14_ref = np.einsum("jv,bvn->bjn", j14, verts)
    ref_vals = {}
    for name, root in (("root", [2, 3]), ("procrustes", None)):
        align = (rm.build_alignment(name, root=root) if root
                 else rm.build_alignment(name))
        pe = rm.PointError(align)
        ref_vals[name] = np.asarray(pe(est14_ref.copy(), gt14.copy()))

    ev = Evaluator(j14_regressor=j14)
    outputs = {"stage_02": {"vertices": jnp.asarray(verts)}}
    targets = {"gt_joints14": jnp.asarray(gt14)}
    metrics = ev.compute_batch_metrics(outputs, targets)
    for name in ("root", "procrustes"):
        ours = np.asarray(metrics[f"mpjpe14_{name}"])
        np.testing.assert_allclose(
            ours, ref_vals[name].reshape(B, -1).mean(axis=-1),
            atol=5e-5, err_msg=name)
