"""Data module: batch structure, camera rig properties, turntable evals."""

import numpy as np

from triplaneturbo_tpu.data import DataModuleConfig, MultiviewMultipromptDataModule


def make_dm(**kw):
    cfg = DataModuleConfig(
        batch_size=8, n_view=4, height=32, width=32, ray_height=16, ray_width=16,
        dim_gaussian=(6, 4, 8, 8), **kw,
    )
    return MultiviewMultipromptDataModule(cfg, seed=0)


def test_train_batch_structure():
    dm = make_dm()
    batches = dm.sample_train_batch()
    assert len(batches) == 4  # n_steps step-batches
    b0 = batches[0]
    assert b0["rays_o"].shape == (8, 16, 16, 3)
    assert b0["rays_d_rasterize"].shape == (8, 32, 32, 3)
    assert b0["mvp_mtx"].shape == (8, 4, 4)
    assert b0["noise"].shape == (2, 6, 8, 8, 4)  # Bsc = batch/n_view
    assert len(b0["prompt"]) == 2
    assert "noise" not in batches[1]  # noise only on step 0 (reference :929)
    # rays normalized
    n = np.linalg.norm(b0["rays_d"], axis=-1)
    np.testing.assert_allclose(n, 1.0, atol=1e-5)


def test_azimuth_coverage_and_shared_rig_params():
    dm = make_dm()
    b = dm.sample_train_batch()[0]
    az = b["azimuth"].reshape(2, 4)
    # 4 views jointly cover 360°: consecutive azimuths differ by 90°
    diffs = np.diff(az, axis=1)
    np.testing.assert_allclose(diffs, 90.0, atol=1e-4)
    # elevation/fovy/distance shared within a rig
    for k in ("elevation", "fovy"):
        v = b[k].reshape(2, 4)
        assert (v == v[:, :1]).all(), k


def test_relative_radius():
    dm = make_dm()
    b = dm.sample_train_batch()[0]
    # fovy fixed at 60deg -> scale = 1/tan(30deg) = 1.732; distance in [0.8, 1]
    d = b["camera_distances"]
    rel = b["camera_distances_relative"]
    np.testing.assert_allclose(d, rel / np.tan(np.deg2rad(30.0)), rtol=1e-5)


def test_c2w_orthonormal_and_lookat_origin():
    dm = make_dm()
    b = dm.sample_train_batch()[0]
    c2w = b["c2w"]
    rot = c2w[:, :3, :3]
    eye = np.einsum("bij,bkj->bik", rot, rot)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-5)
    # -z axis of camera points at the origin
    fwd = -rot[:, :, 2]
    to_origin = -c2w[:, :3, 3]
    cos = (fwd * to_origin).sum(-1) / np.linalg.norm(to_origin, axis=-1)
    np.testing.assert_allclose(cos, 1.0, atol=1e-5)


def test_eval_turntable():
    dm = make_dm(eval_height=32, eval_width=32, n_val_views=8)
    b = dm.eval_views("a prompt", split="val")
    assert b["mvp_mtx"].shape == (8, 4, 4)
    az = b["azimuth"]
    assert len(np.unique(np.round(az, 3))) == 8
    np.testing.assert_allclose(b["elevation"], 15.0)
    # light = camera position at eval (reference phase != train)
    np.testing.assert_allclose(b["light_positions"], b["camera_positions"])


def _make_objaverse_dir(tmp_path, n_objects=2, n_total_views=8, size=16):
    """Synthetic Objaverse render library matching the reference layout
    (obj_library_dir/obj_library/{exported_rgb,exported_normal,
    exported_depth}/<obj>/NNN.png + exported_json/<obj>/extrinsics.json +
    meta json of captions)."""
    import json as _json

    from PIL import Image

    root = tmp_path / "objaverse_debug"
    meta = {"train": {}, "val": {}, "test": {}}
    rng = np.random.RandomState(0)
    for o in range(n_objects):
        name = f"obj{o}"
        meta["train"][name] = {"caption": f"a photo of object {o}"}
        for sub in ("exported_rgb", "exported_normal", "exported_depth"):
            d = root / sub / name
            d.mkdir(parents=True)
            for v in range(n_total_views):
                rgba = rng.randint(0, 255, (size, size, 4), dtype=np.uint8)
                rgba[..., 3] = (rng.rand(size, size) > 0.5).astype(np.uint8) * 255
                Image.fromarray(rgba, "RGBA").save(d / f"{v:03d}.png")
        cd = root / "exported_json" / name
        cd.mkdir(parents=True)
        with open(cd / "extrinsics.json", "w") as f:
            _json.dump({"000.png": {"elevation": 75.0, "distance": 1.5, "fov": 50.0}}, f)
    with open(root / "meta.json", "w") as f:
        _json.dump(meta, f)
    return tmp_path


def test_supervised_objaverse_branch(tmp_path):
    """Reference :722-822: the supervised item loads n_view evenly spaced
    turntable renders + caption + shared elev/dist/fov from extrinsics."""
    lib_dir = _make_objaverse_dir(tmp_path)
    dm = make_dm(
        obj_library="objaverse_debug",
        obj_library_dir=str(lib_dir),
        meta_json="meta.json",
        frontal_idx=2,
    )
    # 50/50 schedule alternates sup/unsup per step (reference :689)
    assert dm.data_schedule == ["sup", "unsup"]
    dm.update_step(0); assert dm.sup_or_unsup == "sup"
    dm.update_step(1); assert dm.sup_or_unsup == "unsup"

    b = dm.sample_sup_batch()
    assert b["rgb_imgs"].shape == (4, 16, 16, 3)
    assert b["normal_imgs"].shape == (4, 16, 16, 3)
    assert b["depth_imgs"].shape == (4, 16, 16, 3)
    assert b["mask_imgs"].shape == (4, 16, 16, 1)
    assert b["prompt"][0].startswith("a photo of object")
    # camera: shared elevation 90-75=15, distance 1.5, fov 50 across views
    np.testing.assert_allclose(b["elevation"], 15.0)
    np.testing.assert_allclose(b["camera_distances"], 1.5)  # relative_radius=False
    np.testing.assert_allclose(np.rad2deg(b["fovy"]), 50.0, rtol=1e-5)
    # azimuths evenly spaced at 360/n_view (8 total views, stride 2 = 90deg)
    az = np.sort(b["azimuth"] % 360)
    np.testing.assert_allclose(np.diff(az), 90.0, atol=1e-4)
    # masked pixels: rgb composited over gray bg where alpha=0
    m0 = b["mask_imgs"][0, ..., 0] == 0
    np.testing.assert_allclose(b["rgb_imgs"][0][m0], 0.5, atol=1e-6)


def test_unsup_schedule_when_no_obj_library():
    dm = make_dm()
    assert dm.data_schedule == ["unsup"]
    dm.update_step(123)
    assert dm.sup_or_unsup == "unsup"
