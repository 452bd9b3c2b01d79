"""Triplane implicit field: plane-sampled features -> SDF / deformation / color.

Rebuild of the field half of the reference geometry module
(/root/reference/triplaneturbo_executable/models/geometry/sd_dual_triplanes.py:66-394
and custom/triplaneturbo/models/geometry/few_step_triplane_dual_stable_diffusion.py):

* ``decode_space_cache``: split the VAE-decoded 6x64ch planes into a geometry
  triplane (planes 0-2, first half channels) and texture triplane (planes 3-5,
  second half) — split_channels "v1" (sd_dual_triplanes.py:190-206);
* ``interpolate``: rotate planes (v1/v2) then EG3D-style sampling, geo summed
  (v1) / tex concatenated (v2) (sd_dual_triplanes.py:208-269);
* SDF with sphere bias r=0.5 (sd_dual_triplanes.py:141-166);
* analytic normals via ``jax.grad`` through the whole field — the reference
  needed a custom CUDA grad² op for this (SURVEY §2.6 #1), JAX AD composes.

Layout: space caches are channels-last ``[B, 6, H, W, C]``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.triplane import contract_to_unisphere, rotate_planes, sample_from_planes
from ..networks import MLPConfig, VanillaMLP, get_mlp


@dataclass
class TriplaneFieldConfig:
    n_feature_dims: int = 3
    sdf_bias: Any = "sphere"  # "sphere" | "ellipsoid" | float
    sdf_bias_params: Any = 0.5
    rotate_planes: Optional[str] = "v1"
    split_channels: Optional[str] = "v1"
    geo_interpolate: str = "v1"
    tex_interpolate: str = "v2"
    isosurface_deformable_grid: bool = True
    radius: float = 1.0
    input_dim: int = 32  # per-plane channels after split
    mlp: MLPConfig = field(default_factory=MLPConfig)


class TriplaneField(nn.Module):
    """SDF + deformation + feature networks over a dual triplane cache."""

    cfg: TriplaneFieldConfig

    def setup(self):
        c = self.cfg
        geo_in = c.input_dim * (3 if c.geo_interpolate == "v2" else 1)
        tex_in = c.input_dim * (3 if c.tex_interpolate == "v2" else 1)
        self.sdf_network = get_mlp(1, c.mlp)
        if c.n_feature_dims > 0:
            self.feature_network = get_mlp(c.n_feature_dims, c.mlp)
        if c.isosurface_deformable_grid:
            self.deformation_network = get_mlp(3, c.mlp)
        self._geo_in = geo_in
        self._tex_in = tex_in

    # -- helpers -------------------------------------------------------------

    @property
    def bbox(self) -> jnp.ndarray:
        r = self.cfg.radius
        return jnp.asarray([[-r, -r, -r], [r, r, r]], jnp.float32)

    def rescale_points(self, points: jax.Array) -> jax.Array:
        return contract_to_unisphere(points, self.bbox, unbounded=False)

    def shifted_sdf(self, points_unscaled: jax.Array, sdf: jax.Array) -> jax.Array:
        c = self.cfg
        # eps INSIDE the max: sqrt'(0) = inf, and a sample point exactly at
        # the origin would poison the backward (value-preserving for
        # ||p|| > 1e-12)
        if c.sdf_bias == "sphere":
            radius = float(c.sdf_bias_params)
            bias = jnp.sqrt(
                jnp.maximum((points_unscaled**2).sum(-1, keepdims=True), 1e-24)
            ) - radius
        elif c.sdf_bias == "ellipsoid":
            size = jnp.asarray(c.sdf_bias_params, sdf.dtype)
            bias = jnp.sqrt(
                jnp.maximum(((points_unscaled / size) ** 2).sum(-1, keepdims=True), 1e-24)
            ) - 1.0
        elif isinstance(c.sdf_bias, (int, float)):
            bias = jnp.asarray(c.sdf_bias, sdf.dtype)
        else:
            raise ValueError(f"Unknown sdf bias {c.sdf_bias}")
        return sdf + bias

    def interpolate(
        self, points: jax.Array, space_cache: jax.Array, only_geo: bool = False
    ):
        """points: [B, N, 3] in [-1,1]; space_cache: [B, 6, H, W, C]."""
        c = self.cfg
        rotated = rotate_planes(space_cache, c.rotate_planes)
        geo = sample_from_planes(rotated[:, 0:3], points, c.geo_interpolate)
        if only_geo:
            return geo
        tex = sample_from_planes(rotated[:, 3:6], points, c.tex_interpolate)
        return geo, tex

    # -- public field API (mirrors sd_dual_triplanes.py) ---------------------

    def forward_field(
        self, points: jax.Array, space_cache: jax.Array
    ) -> Tuple[jax.Array, Optional[jax.Array]]:
        """SDF + deformation for marching cubes (sd_dual_triplanes.py:332-350)."""
        pts = self.rescale_points(points)
        enc_geo = self.interpolate(pts, space_cache, only_geo=True)
        sdf = self.shifted_sdf(points, self.sdf_network(enc_geo))
        deformation = None
        if self.cfg.isosurface_deformable_grid:
            deformation = self.deformation_network(enc_geo)
        return sdf, deformation

    def forward_sdf(self, points: jax.Array, space_cache: jax.Array) -> jax.Array:
        pts = self.rescale_points(points)
        enc_geo = self.interpolate(pts, space_cache, only_geo=True)
        return self.shifted_sdf(points, self.sdf_network(enc_geo))

    def __call__(self, points: jax.Array, space_cache: jax.Array) -> Dict[str, jax.Array]:
        """SDF + texture features (volume-rendering path,
        sd_dual_triplanes.py:286-324)."""
        pts = self.rescale_points(points)
        enc_geo, enc_tex = self.interpolate(pts, space_cache)
        sdf = self.shifted_sdf(points, self.sdf_network(enc_geo))
        out = {"sdf": sdf}
        if self.cfg.n_feature_dims > 0:
            out["features"] = self.feature_network(enc_tex)
        return out

    def forward_field_grid(self, space_cache: jax.Array, resolution: int):
        """SDF + deformation on the FULL regular marching-cubes grid.

        Gather-free fast path (ops.triplane.sample_triplane_on_grid): exactly
        the same values as ``forward_field`` on the dense meshgrid, but the
        plane fetches are two tiny interp-matrix matmuls per plane instead of
        4 random taps per point — the 160³ eval becomes MXU-bound.

        On TPU the whole evaluation (plane broadcast-sum + both bias-free
        MLPs + sphere bias) runs as ONE fused Pallas kernel
        (ops.field_grid_pallas) whose HBM traffic is just the outputs; the
        unfused XLA path below is the CPU/test fallback and the ground truth
        the kernel is parity-tested against.

        Args:
          space_cache: [1, 6, H, W, C] (single item).
        Returns:
          (sdf [R³, 1], deformation [R³, 3] or None), grid order (x, y, z).
        """
        from ...ops.triplane import resample_triplane_axes, sample_triplane_on_grid

        c = self.cfg
        R = resolution
        rotated = rotate_planes(space_cache, c.rotate_planes)[0]  # [6, H, W, C]
        world = jnp.linspace(-c.radius, c.radius, R)
        coords = world / c.radius  # rescale_points to [-1, 1]

        if self._can_fuse_grid(R):
            from ...ops.field_grid_pallas import fused_field_grid

            m_xy, m_xz, m_zy = resample_triplane_axes(rotated[0:3], coords)
            ps = self.sdf_network.variables["params"]
            pd = self.deformation_network.variables["params"]
            sdf, deform = fused_field_grid(
                m_xy.astype(jnp.float32),
                m_xz.astype(jnp.float32),
                m_zy.astype(jnp.float32),
                ps["Dense_0"]["kernel"], ps["Dense_1"]["kernel"], ps["Dense_2"]["kernel"],
                pd["Dense_0"]["kernel"], pd["Dense_1"]["kernel"], pd["Dense_2"]["kernel"],
                float(c.radius), float(c.sdf_bias_params),
                c.geo_interpolate == "v2",
            )
            return sdf.reshape(-1, 1), jnp.moveaxis(deform, 0, -1).reshape(-1, 3)

        enc_geo = sample_triplane_on_grid(rotated[0:3], coords, c.geo_interpolate)
        enc_geo = enc_geo.reshape(R * R * R, -1)
        sdf = self.sdf_network(enc_geo)
        # sphere bias on unscaled world points
        g = jnp.stack(jnp.meshgrid(world, world, world, indexing="ij"), axis=-1)
        sdf = self.shifted_sdf(g.reshape(-1, 3), sdf)
        deformation = None
        if c.isosurface_deformable_grid:
            deformation = self.deformation_network(enc_geo)
        return sdf, deformation

    def _can_fuse_grid(self, resolution: int) -> bool:
        """The fused TPU kernel covers the flagship configuration exactly."""
        c = self.cfg
        m = c.mlp
        return (
            jax.default_backend() == "tpu"  # Mosaic kernels are TPU-only
            and c.sdf_bias == "sphere"
            and c.isosurface_deformable_grid
            and c.geo_interpolate in ("v1", "v2")
            and resolution % 8 == 0  # tile_j=8 sublane constraint (tile_i=4 divides too)
            and m.otype == "VanillaMLP"
            and m.activation.lower() == "relu"
            and m.output_activation.lower() == "none"
            and m.n_hidden_layers == 2
        )

    def init_all(self, points: jax.Array, space_cache: jax.Array):
        """Touch every subnetwork so ``init`` creates all params."""
        out = self(points, space_cache)
        sdf, deform = self.forward_field(points, space_cache)
        return out, sdf, deform

    def export(self, points: jax.Array, space_cache: jax.Array) -> Dict[str, jax.Array]:
        """Texture features at mesh vertices (sd_dual_triplanes.py:360-394)."""
        if self.cfg.n_feature_dims == 0:
            return {}
        pts = self.rescale_points(points)
        _, enc_tex = self.interpolate(pts, space_cache)
        return {"features": self.feature_network(enc_tex)}


def decode_space_cache(triplane: jax.Array, split_channels: Optional[str] = "v1") -> jax.Array:
    """Split the decoded 64-channel planes into geo/tex triplanes.

    triplane: [B, 6, H, W, C]; returns [B, 6, H, W, C//2] where planes 0-2
    carry the first C//2 channels (geometry) and 3-5 the last C//2 (texture)
    — reference split_channels v1 (sd_dual_triplanes.py:190-206).
    """
    if split_channels is None:
        return triplane
    if split_channels != "v1":
        raise ValueError(f"Unknown split_channels {split_channels}")
    C = triplane.shape[-1]
    geo = triplane[:, 0:3, ..., : C // 2]
    tex = triplane[:, 3:6, ..., C // 2 :]
    return jnp.concatenate([geo, tex], axis=1)


def analytic_normal(
    field_apply,
    points: jax.Array,
    space_cache: jax.Array,
    normalize: bool = True,
    eps: float = 1e-12,
) -> jax.Array:
    """Analytic SDF normals: dSDF/dpoints via JAX AD.

    The reference computes this with ``torch.autograd.grad`` and needs the
    custom grad² CUDA ext downstream
    (custom/.../few_step_triplane_dual_stable_diffusion.py:325-339). Here the
    whole thing is an ordinary differentiable function.

    Args:
      field_apply: callable (points [B,N,3], space_cache) -> sdf [B,N,1].
    """
    def sdf_sum(p):
        return field_apply(p, space_cache).sum()

    n = jax.grad(sdf_sum)(points)
    if normalize:
        n = n / jnp.sqrt(jnp.maximum((n * n).sum(-1, keepdims=True), eps))
    return n
