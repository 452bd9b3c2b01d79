"""Multi-view multi-prompt data module (the training/eval camera+prompt feed).

Rebuild of ``multiview-multiprompt-dualrenderer-multistep-datamodule-v2``
(/root/reference/custom/triplaneturbo/data/
multiview_multiprompt_dualrender_multistep_v2.py): each training item is one
random prompt with ``n_steps`` independently sampled 4-view camera rigs
(azimuths jointly covering 360°, shared elevation/fov/distance per rig,
:836-888), MVDream relative radius (scale = 1/tan(fovy/2), :273-276), dual
ray grids (low-res for volume rendering + full-res for rasterization,
:319-337), dreamfusion-style light sampling (:362-419), and one gaussian
noise tensor per item (:929-935). Val/test are turntable rigs.

Host-side numpy only — the training system moves batches to device. Latents
are channels-last ``[Bsc, 6, h, w, 4]``.
"""

from __future__ import annotations

import functools
import json
import math
import os
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

import triplaneturbo_tpu as ttt


@dataclass
class DataModuleConfig:
    batch_size: int = 8  # total views per step-batch (= prompts * n_view)
    n_view: int = 4
    height: int = 512
    width: int = 512
    ray_height: int = 128
    ray_width: int = 128
    n_steps: int = 4
    prompt_library: str = "dreamfusion_415_prompt_library"
    prompt_library_dir: str = "datasets"
    unsup_elevation_range: Tuple[float, float] = (0, 30)
    unsup_camera_distance_range: Tuple[float, float] = (0.8, 1.0)
    unsup_fovy_range: Tuple[float, float] = (60, 60)
    unsup_azimuth_range: Tuple[float, float] = (-180, 180)
    unsup_light_distance_range: Tuple[float, float] = (0.8, 1.5)
    light_sample_strategy: str = "dreamfusion"
    relative_radius: bool = True
    eval_elevation_deg: float = 15.0
    eval_camera_distance: float = 3.0
    eval_fovy_deg: float = 40.0
    eval_height: int = 512
    eval_width: int = 512
    n_val_views: int = 40
    n_test_views: int = 120
    dim_gaussian: Tuple[int, ...] = (6, 4, 32, 32)  # reference NCHW order
    pure_zeros: bool = False
    # supervised (Objaverse renders) branch (reference :67-77, :722-822).
    # Dormant in the shipped v1 recipe — the reference's own collate raises on
    # supervised items ("The supervised data should be used in a single
    # step", :898-900) — but ported for component parity; active when
    # obj_library != "none".
    obj_library: str = "none"
    obj_library_dir: str = "datasets"
    meta_json: str = "filtered_3DTopia-objaverse-caption-361k.json"
    rgb_data_dir: str = "exported_rgb"
    rgb_bg: Tuple[float, float, float] = (0.5, 0.5, 0.5)
    normal_data_dir: str = "exported_normal"
    normal_bg: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    depth_data_dir: str = "exported_depth"
    depth_bg: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    camera_data_dir: str = "exported_json"
    frontal_idx: int = 24
    sup_unsup_mode: str = "50/50"  # or "vanilla" (ratio-proportional schedule)


def load_prompt_library(cfg: DataModuleConfig) -> Dict[str, List[str]]:
    """Load {train/val/test} prompt lists; falls back to a tiny built-in set."""
    path = os.path.join(cfg.prompt_library_dir, f"{cfg.prompt_library}.json")
    if os.path.exists(path):
        with open(path) as f:
            lib = json.load(f)
        if isinstance(lib, dict):
            return {k: list(v) for k, v in lib.items()}
        return {"train": list(lib), "val": list(lib)[:4], "test": list(lib)}
    ttt.warn(f"prompt library {path} not found; using builtin sample prompts")
    sample = [
        "a DSLR photo of a hamburger",
        "a zoomed out DSLR photo of a stack of pancakes",
        "a DSLR photo of a blue jay standing on a basket of macarons",
        "a ceramic lion",
        "a DSLR photo of an origami crane",
        "a DSLR photo of a corgi wearing a top hat",
        "a marble bust of an angel",
        "a DSLR photo of a robot dinosaur",
    ]
    return {"train": sample, "val": sample[:2], "test": sample}


# ---------------------------------------------------------------------------
# camera assembly (numpy twin of utils/camera.py)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=8)
def _directions_unit_focal(h: int, w: int) -> np.ndarray:
    """Cached unit-focal pixel directions (the reference caches these once at
    datamodule setup, :145-152; rebuilding them 4x per host-side step-batch
    was measurable at 512²). Treat the returned array as read-only."""
    i, j = np.meshgrid(
        np.arange(w, dtype=np.float32) + 0.5,
        np.arange(h, dtype=np.float32) + 0.5,
        indexing="xy",
    )
    return np.stack([(i - w / 2), -(j - h / 2), -np.ones_like(i)], -1)


def create_camera_from_angle(
    elevation_deg: np.ndarray,
    azimuth_deg: np.ndarray,
    camera_distances: np.ndarray,
    fovy_deg: np.ndarray,
    cfg: DataModuleConfig,
    relative_radius: bool = True,
    phase: str = "train",
    rng: Optional[np.random.RandomState] = None,
) -> Dict[str, Any]:  # arrays + python-int height/width
    """Numpy port of _create_camera_from_angle (:251-360)."""
    B = elevation_deg.shape[0]
    fovy = np.deg2rad(fovy_deg)
    azimuth = np.deg2rad(azimuth_deg)
    elevation = np.deg2rad(elevation_deg)

    camera_distances_relative = camera_distances.copy()
    if relative_radius:
        camera_distances = camera_distances / np.tan(0.5 * fovy)

    pos = np.stack(
        [
            camera_distances * np.cos(elevation) * np.cos(azimuth),
            camera_distances * np.cos(elevation) * np.sin(azimuth),
            camera_distances * np.sin(elevation),
        ],
        axis=-1,
    ).astype(np.float32)

    center = np.zeros_like(pos)
    up = np.broadcast_to(np.asarray([0, 0, 1], np.float32), pos.shape)

    def normalize(v):
        return v / np.maximum(np.linalg.norm(v, axis=-1, keepdims=True), 1e-8)

    lookat = normalize(center - pos)
    right = normalize(np.cross(lookat, up))
    up2 = normalize(np.cross(right, lookat))
    c2w = np.zeros((B, 4, 4), np.float32)
    c2w[:, :3, 0] = right
    c2w[:, :3, 1] = up2
    c2w[:, :3, 2] = -lookat
    c2w[:, :3, 3] = pos
    c2w[:, 3, 3] = 1.0

    if phase == "train":
        rng = rng or np.random
        nv = cfg.n_view
        real_b = B // nv
        light_dist = (
            rng.uniform(*cfg.unsup_light_distance_range, size=real_b)
            .repeat(nv)
            .astype(np.float32)
        )
        light_positions = normalize(pos) * light_dist[:, None]
    else:
        light_positions = pos

    h = cfg.height if phase == "train" else cfg.eval_height
    w = cfg.width if phase == "train" else cfg.eval_width
    rh = cfg.ray_height if phase == "train" else cfg.eval_height
    rw = cfg.ray_width if phase == "train" else cfg.eval_width

    # ONE focal, computed from the RAY grid height, divides BOTH direction
    # grids — the reference builds a single focal_length from ray_height and
    # reuses it for the full-res rasterize grid (reference :318-331), so the
    # rasterize directions intentionally have height/ray_height x the spread
    def rays_dirs_for(hh, ww, focal):
        dirs = _directions_unit_focal(hh, ww)[None].repeat(B, axis=0)
        dirs[..., :2] /= focal[:, None, None, None]
        rays_d = np.einsum("bhwc,bkc->bhwk", dirs, c2w[:, :3, :3])
        return (rays_d / np.linalg.norm(rays_d, axis=-1, keepdims=True)).astype(np.float32)

    focal = 0.5 * rh / np.tan(0.5 * fovy)  # [B]
    rays_d = rays_dirs_for(rh, rw, focal)
    rays_o = np.broadcast_to(pos[:, None, None, :], rays_d.shape).astype(np.float32)
    rays_d_rasterize = rays_dirs_for(h, w, focal)

    # projection (near/far hard-coded like the reference :344-346)
    f = 1.0 / np.tan(fovy / 2.0)
    aspect = w / h
    proj = np.zeros((B, 4, 4), np.float32)
    proj[:, 0, 0] = f / aspect
    proj[:, 1, 1] = -f
    proj[:, 2, 2] = -(1000.0 + 0.1) / (1000.0 - 0.1)
    proj[:, 2, 3] = -2.0 * 1000.0 * 0.1 / (1000.0 - 0.1)
    proj[:, 3, 2] = -1.0
    mvp = np.einsum("bij,bjk->bik", proj, np.linalg.inv(c2w))

    return {
        "rays_o": rays_o,
        "rays_d": rays_d,
        "rays_d_rasterize": rays_d_rasterize,
        "mvp_mtx": mvp,
        "camera_positions": pos,
        "c2w": c2w,
        "light_positions": light_positions.astype(np.float32),
        "elevation": elevation_deg.astype(np.float32),
        "azimuth": azimuth_deg.astype(np.float32),
        "camera_distances": camera_distances.astype(np.float32),
        "camera_distances_relative": camera_distances_relative.astype(np.float32),
        "fovy": fovy.astype(np.float32),
        "height": h,
        "width": w,
    }


@ttt.register("multiview-multiprompt-dualrenderer-multistep-datamodule-v2")
class MultiviewMultipromptDataModule:
    """Training iterator + val/test turntable batches."""

    def __init__(self, cfg: DataModuleConfig = None, seed: int = 0):
        self.cfg = cfg or DataModuleConfig()
        self.library = load_prompt_library(self.cfg)
        self.rng = np.random.RandomState(seed)
        # supervised Objaverse library (reference :955-972): meta json maps
        # split -> {obj_name: {"caption": ...}}; empty when obj_library=none
        self.sup_obj_library: Dict[str, Any] = {}
        if self.cfg.obj_library.lower() != "none":
            path = os.path.join(
                self.cfg.obj_library_dir, self.cfg.obj_library, self.cfg.meta_json
            )
            with open(path) as f:
                lib = json.load(f)
            self.sup_obj_library = lib.get("train", lib) if isinstance(lib, dict) else {}
        self.data_schedule = self._build_data_schedule()
        self.sup_or_unsup = "unsup"  # updated by update_step (reference :704)

    # -- sup/unsup schedule (reference :683-712) -------------------------------

    def _build_data_schedule(self) -> List[str]:
        if not self.sup_obj_library:
            return ["unsup"]
        if self.cfg.sup_unsup_mode == "50/50":
            return ["sup", "unsup"]
        if self.cfg.sup_unsup_mode != "vanilla":
            raise ValueError(f"unknown sup_unsup_mode {self.cfg.sup_unsup_mode}")
        schedule = ["unsup"] * 100
        n_unsup = len(self.library["train"])
        sup_ratio = len(self.sup_obj_library) / (len(self.sup_obj_library) + n_unsup)
        sup_interval = int(100 * sup_ratio)
        for i in (np.arange(0, 100, sup_interval) if sup_interval > 0 else []):
            schedule[int(i)] = "sup"
        return schedule

    def update_step(self, global_step: int) -> None:
        """Pick sup vs unsup for the upcoming step (reference update_step
        :706-712)."""
        self.sup_or_unsup = self.data_schedule[global_step % len(self.data_schedule)]

    # -- supervised (Objaverse renders) branch (reference :718-822) -----------

    def _load_im(self, path: str, color: Tuple[float, float, float]):
        """RGBA png -> (rgb composited over color, alpha), channels-last
        float32 (reference _load_im :421-442 — torch twin returns CHW)."""
        from PIL import Image

        img = np.asarray(Image.open(path), dtype=np.float32) / 255.0
        alpha = img[:, :, 3:4]
        rgb = img[:, :, :3] * alpha + (1.0 - alpha) * np.asarray(color, np.float32)
        return rgb, alpha

    def sample_sup_batch(self) -> Dict[str, Any]:
        """One supervised item: n_view evenly-spaced turntable renders of a
        random Objaverse object + its caption + ground-truth rgb/normal/
        depth/mask images (reference __getitem__ sup branch :722-822).

        Returns ONE batch dict (not a list of step-batches): supervised data
        is single-step by construction — the reference's shipped collate
        raises if it ever reaches the multi-step path (:898-900)."""
        cfg = self.cfg
        names = list(self.sup_obj_library.keys())
        obj_name = names[self.rng.randint(len(names))]
        prompt = self.sup_obj_library[obj_name]["caption"]
        root = os.path.join(cfg.obj_library_dir, cfg.obj_library)

        n_total = len(os.listdir(os.path.join(root, cfg.rgb_data_dir, obj_name)))
        azimuth_interval = 360.0 / n_total
        indice_interval = n_total // cfg.n_view
        all_azimuths = np.arange(0, 360, azimuth_interval, dtype=np.float32)
        all_indices = np.arange(cfg.frontal_idx, cfg.frontal_idx + n_total) % n_total
        # MVDream-style random first azimuth, then evenly spaced (ref :749-761)
        first_azimuth = (
            self.rng.uniform(0, 1) / cfg.n_view
            * (cfg.unsup_azimuth_range[1] - cfg.unsup_azimuth_range[0])
            + cfg.unsup_azimuth_range[0]
        ) % 360
        first_idx = int(np.argmin(np.abs(all_azimuths - first_azimuth)))
        load_indices = [
            int(all_indices[(first_idx + i * indice_interval) % n_total])
            for i in range(cfg.n_view)
        ]

        with open(os.path.join(root, cfg.camera_data_dir, obj_name, "extrinsics.json")) as f:
            cam = json.load(f)["000.png"]  # all views share elev/dist/fov (ref :766-780)
        elev = np.full((cfg.n_view,), 90.0 - cam["elevation"], np.float32)
        dist = np.full((cfg.n_view,), cam["distance"], np.float32)
        fovy = np.full((cfg.n_view,), cam["fov"], np.float32)
        azim = all_azimuths[load_indices]

        rgbs, normals, depths, masks = [], [], [], []
        for idx in load_indices:
            rgb, alpha = self._load_im(
                os.path.join(root, cfg.rgb_data_dir, obj_name, f"{idx:03d}.png"), cfg.rgb_bg
            )
            normal, _ = self._load_im(
                os.path.join(root, cfg.normal_data_dir, obj_name, f"{idx:03d}.png"), cfg.normal_bg
            )
            depth, _ = self._load_im(
                os.path.join(root, cfg.depth_data_dir, obj_name, f"{idx:03d}.png"), cfg.depth_bg
            )
            rgbs.append(rgb); normals.append(normal); depths.append(depth); masks.append(alpha)

        batch = create_camera_from_angle(
            elev, azim, dist, fovy, cfg, relative_radius=False, phase="train", rng=self.rng
        )
        batch.update(
            prompt=[prompt],
            rgb_imgs=np.stack(rgbs),        # [n_view, H, W, 3] channels-last
            normal_imgs=np.stack(normals),
            depth_imgs=np.stack(depths),
            mask_imgs=np.stack(masks),      # [n_view, H, W, 1]
        )
        return batch

    # -- train ---------------------------------------------------------------

    def sample_train_batch(self) -> List[Dict[str, Any]]:
        """Returns a LIST of n_steps step-batches (collate :890-938)."""
        cfg = self.cfg
        nv = cfg.n_view
        real_b = cfg.batch_size // nv
        prompts = [self.library["train"][self.rng.randint(len(self.library["train"]))]
                   for _ in range(real_b)]

        step_batches = []
        for step in range(cfg.n_steps):
            elev = self.rng.uniform(*cfg.unsup_elevation_range, size=real_b).repeat(nv)
            azim = (
                (self.rng.rand(real_b)[:, None] + np.arange(nv)[None, :]).reshape(-1) / nv
                * (cfg.unsup_azimuth_range[1] - cfg.unsup_azimuth_range[0])
                + cfg.unsup_azimuth_range[0]
            )
            fovy = self.rng.uniform(*cfg.unsup_fovy_range, size=real_b).repeat(nv)
            dist = self.rng.uniform(*cfg.unsup_camera_distance_range, size=real_b).repeat(nv)
            batch = create_camera_from_angle(
                elev, azim, dist, fovy, cfg,
                relative_radius=cfg.relative_radius, phase="train", rng=self.rng,
            )
            batch["prompt"] = prompts
            if step == 0:
                P, C, hh, ww = cfg.dim_gaussian
                noise = (
                    np.zeros((real_b, P, hh, ww, C), np.float32)
                    if cfg.pure_zeros
                    else self.rng.randn(real_b, P, hh, ww, C).astype(np.float32)
                )
                batch["noise"] = noise  # channels-last [Bsc, 6, h, w, 4]
            step_batches.append(batch)
        return step_batches

    def __iter__(self):
        while True:
            yield self.sample_train_batch()

    # -- val / test ----------------------------------------------------------

    def eval_views(self, prompt: str, n_views: Optional[int] = None, split: str = "val") -> Dict[str, Any]:
        """Turntable rig (reference val/test datasets :480-665)."""
        cfg = self.cfg
        n = n_views or (cfg.n_val_views if split == "val" else cfg.n_test_views)
        # reference val/test rigs: torch.linspace(0, 360, n) INCLUSIVE
        # (multiview_multiprompt_dualrender_multistep_v2.py:517) — step
        # 360/(n-1) with the first/last frame duplicated
        azim = np.linspace(0.0, 360.0, n)
        elev = np.full((n,), cfg.eval_elevation_deg)
        fovy = np.full((n,), cfg.eval_fovy_deg)
        dist = np.full((n,), cfg.eval_camera_distance)
        batch = create_camera_from_angle(
            elev, azim, dist, fovy, cfg, relative_radius=False, phase=split
        )
        batch["prompt"] = [prompt]
        P, C, hh, ww = cfg.dim_gaussian
        batch["noise"] = self.rng.randn(1, P, hh, ww, C).astype(np.float32)
        return batch
