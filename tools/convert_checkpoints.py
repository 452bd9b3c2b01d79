#!/usr/bin/env python
"""Convert the reference's released checkpoints to native msgpack params.

One CLI for the full weight surface the reference consumes (SURVEY §5.4):

* ``--adapter triplane_turbo_sd_v1.pth``: the trained TriplaneTurbo adapter
  (hexa-LoRA/LoCon/conv_out retrofit/field MLPs; loader parity with
  /root/reference/triplaneturbo_executable/pipelines/triplaneturbo_text_to_3d.py:166-177)
* ``--sd-base <diffusers dir>``: stable-diffusion-2-1-base — the frozen
  backbone under the adapter + the SD-2.1 teacher + the prompt text encoder
* ``--mvdream sd-v2.1-base-4view.pt``: MVDream teacher (LDM naming)
* ``--richdreamer nd_mv_ema.ckpt``: RichDreamer teacher (LDM naming + EMA)
* ``--clip <clip-vit-base-patch32 .bin>``: the eval scorer towers

Outputs (under --out):
  geometry.msgpack, text_encoder.msgpack   -> pipeline from_pretrained(dir)
  sd_teacher.msgpack / mv_teacher.msgpack / rd_teacher.msgpack
                                           -> guidance {kind}_ckpt_path
  clip_scorer.msgpack                      -> evaluation CLIPScorer

Every conversion prints loaded/unmatched counts; use --strict to fail on any
unmatched tensor that should exist.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _save(path: str, tree) -> None:
    from flax import serialization

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(tree))
    print(f"wrote {path} ({os.path.getsize(path) / 1e6:.1f} MB)")


def _apply_prefixed(flat, params, prefix: str, what: str, strict: bool):
    """Apply converter output under a tree prefix, ignoring keys the tree
    legitimately lacks (e.g. VAE encoder on the student's decoder-only VAE)."""
    from flax.traverse_util import flatten_dict

    from triplaneturbo_tpu.utils.convert_torch import apply_flat_to_tree

    tree = params["params"] if "params" in params else params
    have = set(flatten_dict(tree, sep="/"))
    subset = {k: v for k, v in flat.items() if prefix + k in have}
    dropped = len(flat) - len(subset)
    new, loaded, mismatched = apply_flat_to_tree(subset, params, prefix=prefix)
    print(f"{what}: {len(loaded)} loaded, {dropped} not-in-tree, {len(mismatched)} mismatched")
    if mismatched:
        for m in mismatched[:10]:
            print(f"  MISMATCH {m}")
        if strict:
            raise SystemExit(f"strict: {what} had shape mismatches")
    return new


def convert_student(adapter: str, sd_base: str, out_dir: str, strict: bool) -> None:
    from triplaneturbo_tpu.models.geometry.space_generator import SpaceGeneratorConfig
    from triplaneturbo_tpu.models.geometry.triplane_geometry import (
        TriplaneGeometry,
        TriplaneGeometryConfig,
    )
    from triplaneturbo_tpu.utils.checkpoint import _torch_state_numpy, load_torch_adapter
    from triplaneturbo_tpu.utils.convert_torch import convert_unet, convert_vae

    geometry = TriplaneGeometry(TriplaneGeometryConfig(space_generator=SpaceGeneratorConfig()))
    params = jax.jit(
        lambda k: geometry.init(
            k,
            jnp.zeros((1, 6, 8, 8, 4)),
            jnp.zeros((1, 77, 1024)),
            jnp.zeros(()),
            jnp.zeros((1, 8, 3)),
            method=geometry.init_all,
        )
    )(jax.random.PRNGKey(0))

    if sd_base:
        unet_bin = os.path.join(sd_base, "unet", "diffusion_pytorch_model.bin")
        vae_bin = os.path.join(sd_base, "vae", "diffusion_pytorch_model.bin")
        if os.path.exists(unet_bin):
            flat = convert_unet(_torch_state_numpy(unet_bin))
            params = _apply_prefixed(flat, params, "space_generator/unet/", "student unet", strict)
        if os.path.exists(vae_bin):
            flat = convert_vae(_torch_state_numpy(vae_bin))
            params = _apply_prefixed(flat, params, "space_generator/vae/", "student vae", strict)
    if adapter:
        params = load_torch_adapter(adapter, params, strict=strict)
    _save(os.path.join(out_dir, "geometry.msgpack"), params)


def convert_text_encoder(sd_base: str, out_dir: str, strict: bool) -> None:
    from triplaneturbo_tpu.models.clip_text import CLIPTextConfig, CLIPTextEncoder
    from triplaneturbo_tpu.utils.checkpoint import _torch_state_numpy
    from triplaneturbo_tpu.utils.convert_torch import apply_flat_to_tree, convert_clip_text

    bin_path = os.path.join(sd_base, "text_encoder", "pytorch_model.bin")
    if not os.path.exists(bin_path):
        print(f"skip text encoder ({bin_path} absent)")
        return
    enc = CLIPTextEncoder(CLIPTextConfig())
    params = jax.jit(lambda k: enc.init(k, jnp.zeros((1, 77), jnp.int32)))(jax.random.PRNGKey(0))
    flat = convert_clip_text(_torch_state_numpy(bin_path), n_layers=enc.cfg.layers)
    new, loaded, mismatched = apply_flat_to_tree(flat, params)
    print(f"text encoder: {len(loaded)} loaded, {len(mismatched)} mismatched")
    if mismatched and strict:
        raise SystemExit("strict: text encoder mismatches")
    _save(os.path.join(out_dir, "text_encoder.msgpack"), new)


def convert_teacher(kind: str, ckpt: str, out_dir: str, strict: bool) -> None:
    from triplaneturbo_tpu.systems.builder import build_teacher

    bundle = build_teacher(kind, jax.random.PRNGKey(0), dtype_str="bfloat16", ckpt_path=None)
    from triplaneturbo_tpu.utils.checkpoint import load_teacher_params

    uparams, vparams = load_teacher_params(
        ckpt, bundle.unet_params, bundle.vae_params, strict=strict
    )
    _save(
        os.path.join(out_dir, f"{kind}_teacher.msgpack"),
        {"unet": uparams, "vae": vparams if vparams is not None else {}},
    )


def convert_clip(ckpt: str, out_dir: str, strict: bool) -> None:
    from triplaneturbo_tpu.evaluation.clipscore import CLIPScorer, clip_b32_text_config
    from triplaneturbo_tpu.utils.checkpoint import _torch_state_numpy
    from triplaneturbo_tpu.utils.convert_torch import (
        apply_flat_to_tree,
        convert_clip_text,
        convert_clip_vision,
    )

    scorer = CLIPScorer()
    sd = _torch_state_numpy(ckpt)
    vis_flat = convert_clip_vision(sd, n_layers=scorer.vision.cfg.layers)
    text_projection = vis_flat.pop("__text_projection__", None)
    vparams, vl, vm = apply_flat_to_tree(vis_flat, scorer.vision_params)
    tflat = convert_clip_text(sd, n_layers=scorer.text.cfg.layers)
    tparams, tl, tm = apply_flat_to_tree(tflat, scorer.text_params)
    print(f"clip vision: {len(vl)} loaded, {len(vm)} mismatched; text: {len(tl)}/{len(tm)}")
    if (vm or tm) and strict:
        raise SystemExit("strict: clip mismatches")
    _save(
        os.path.join(out_dir, "clip_scorer.msgpack"),
        {
            "vision": vparams,
            "text": tparams,
            "text_projection": jnp.asarray(text_projection)
            if text_projection is not None
            else np.zeros((scorer.text.cfg.width, scorer.vision.cfg.projection_dim), np.float32),
        },
    )


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--adapter", help="triplane_turbo_sd_v1.pth")
    ap.add_argument("--sd-base", help="stable-diffusion-2-1-base diffusers dir")
    ap.add_argument("--mvdream", help="sd-v2.1-base-4view.pt")
    ap.add_argument("--richdreamer", help="nd_mv_ema.ckpt")
    ap.add_argument("--sd-teacher", help="diffusers dir for the SD teacher (often = --sd-base)")
    ap.add_argument("--clip", help="clip-vit-base-patch32 pytorch_model.bin")
    ap.add_argument("--out", default="pretrained_converted")
    ap.add_argument("--strict", action="store_true")
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    if args.adapter or args.sd_base:
        convert_student(args.adapter, args.sd_base, args.out, args.strict)
    if args.sd_base:
        convert_text_encoder(args.sd_base, args.out, args.strict)
    if args.mvdream:
        convert_teacher("mv", args.mvdream, args.out, args.strict)
    if args.richdreamer:
        convert_teacher("rd", args.richdreamer, args.out, args.strict)
    if args.sd_teacher:
        convert_teacher("sd", args.sd_teacher, args.out, args.strict)
    if args.clip:
        convert_clip(args.clip, args.out, args.strict)


if __name__ == "__main__":
    main()
