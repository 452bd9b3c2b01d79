"""UNet / VAE / CLIP text encoder: shapes, adapter-identity-at-init,
cross-plane attention coupling, camera conditioning, trainable filter."""

import jax
import jax.numpy as jnp
import numpy as np

from triplaneturbo_tpu.models.attention import AdapterSpec
from triplaneturbo_tpu.models.clip_text import CLIPTextConfig, CLIPTextEncoder
from triplaneturbo_tpu.models.lora import is_adapter_path
from triplaneturbo_tpu.models.tokenizer import CLIPTokenizer
from triplaneturbo_tpu.models.unet import UNet2DConditionModel, UNetConfig
from triplaneturbo_tpu.models.vae import AutoencoderKL, VAEConfig, student_vae_config

TINY = dict(
    block_out_channels=(32, 64),
    layers_per_block=1,
    cross_attention_dim=16,
    attention_head_dim=8,
)


def tiny_student_cfg(**kw):
    return UNetConfig(
        adapters=AdapterSpec(
            self_lora_type="hexa_v1",
            cross_lora_type="vanilla",
            self_rank=4,
            cross_rank=4,
            n_planes=6,
            joint_self_attention=True,
            joint_group=6,
        ),
        locon_type="vanilla_v1",
        locon_rank=4,
        **TINY,
        **kw,
    )


def _strip_adapters(tree):
    if isinstance(tree, dict):
        out = {}
        for k, v in tree.items():
            if "lora" in k.lower() or "locon" in k.lower():
                continue
            out[k] = _strip_adapters(v)
        return out
    return tree


def test_unet_shapes_and_adapter_identity_at_init():
    cfg = tiny_student_cfg()
    unet = UNet2DConditionModel(cfg)
    B, P = 2, 6
    x = jax.random.normal(jax.random.PRNGKey(0), (B * P, 16, 16, 4))
    t = jnp.full((B * P,), 500)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (B * P, 7, 16))
    params = unet.init(jax.random.PRNGKey(2), x, t, ctx)
    out = unet.apply(params, x, t, ctx)
    assert out.shape == x.shape

    # adapters are zero-init => student output == base UNet on stripped params
    base_cfg = UNetConfig(
        adapters=AdapterSpec(joint_self_attention=True, joint_group=6), **TINY
    )
    base = UNet2DConditionModel(base_cfg)
    base_params = {"params": _strip_adapters(params["params"])}
    out_base = base.apply(base_params, x, t, ctx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_base), atol=2e-5)


def test_cross_plane_coupling():
    """With joint self-attention, perturbing plane 3's input must change
    plane 0's output (the reference's 3D-consistency mechanism,
    sd_dual_triplane_modules.py:410-425); without it, items are independent."""
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (6, 8, 8, 4))
    t = jnp.full((6,), 100)
    ctx = jax.random.normal(jax.random.fold_in(key, 1), (6, 7, 16))

    joint_cfg = UNetConfig(
        adapters=AdapterSpec(joint_self_attention=True, joint_group=6), **TINY
    )
    unet = UNet2DConditionModel(joint_cfg)
    params = unet.init(jax.random.fold_in(key, 2), x, t, ctx)
    out0 = unet.apply(params, x, t, ctx)
    x2 = x.at[3].add(1.0)
    out1 = unet.apply(params, x2, t, ctx)
    assert float(jnp.abs(out1[0] - out0[0]).max()) > 1e-6

    solo_cfg = UNetConfig(**TINY)
    solo = UNet2DConditionModel(solo_cfg)
    sp = solo.init(jax.random.fold_in(key, 4), x, t, ctx)
    s0 = solo.apply(sp, x, t, ctx)
    s1 = solo.apply(sp, x2, t, ctx)
    np.testing.assert_allclose(np.asarray(s0[0]), np.asarray(s1[0]), atol=1e-6)


def test_camera_conditioning_changes_output():
    cfg = UNetConfig(camera_dim=16, **TINY)
    unet = UNet2DConditionModel(cfg)
    x = jax.random.normal(jax.random.PRNGKey(5), (4, 8, 8, 4))
    t = jnp.full((4,), 10)
    ctx = jax.random.normal(jax.random.PRNGKey(6), (4, 7, 16))
    cam = jax.random.normal(jax.random.PRNGKey(7), (4, 16))
    params = unet.init(jax.random.PRNGKey(8), x, t, ctx, cam)
    o1 = unet.apply(params, x, t, ctx, cam)
    o2 = unet.apply(params, x, t, ctx, cam + 1.0)
    assert float(jnp.abs(o1 - o2).max()) > 1e-6


def test_trainable_filter_selects_adapters():
    cfg = tiny_student_cfg()
    unet = UNet2DConditionModel(cfg)
    x = jnp.zeros((6, 8, 8, 4))
    params = unet.init(jax.random.PRNGKey(9), x, jnp.zeros((6,)), jnp.zeros((6, 7, 16)))
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    adapter = [p for p, _ in flat if is_adapter_path(tuple(str(k) for k in p))]
    non_adapter = [p for p, _ in flat if not is_adapter_path(tuple(str(k) for k in p))]
    assert len(adapter) > 0 and len(non_adapter) > 0


def test_vae_decoder_retrofit_and_encoder():
    cfg = VAEConfig(
        block_out_channels=(16, 32), layers_per_block=1, output_dim=12,
        attn_lora_type="basic", locon_type="vanilla_v1", rank=4,
    )
    vae = AutoencoderKL(cfg)
    z = jax.random.normal(jax.random.PRNGKey(10), (2, 8, 8, 4))
    params = vae.init(jax.random.PRNGKey(11), z, method=vae.decode)
    out = vae.apply(params, z, method=vae.decode)
    # one upsample per non-final block: 8 -> 16; channels = output_dim
    assert out.shape == (2, 16, 16, 12)

    img = jax.random.normal(jax.random.PRNGKey(12), (2, 16, 16, 3))
    enc_cfg = VAEConfig(block_out_channels=(16, 32), layers_per_block=1)
    enc_vae = AutoencoderKL(enc_cfg)
    ep = enc_vae.init(jax.random.PRNGKey(13), img, method=enc_vae.encode)
    lat = enc_vae.apply(ep, img, method=enc_vae.encode)
    assert lat.shape == (2, 8, 8, 4)
    lat_s = enc_vae.apply(ep, img, jax.random.PRNGKey(14), method=enc_vae.encode)
    assert float(jnp.abs(lat_s - lat).max()) > 0  # sampling adds noise


def test_clip_text_encoder_shapes_and_causality():
    cfg = CLIPTextConfig(vocab_size=100, width=32, layers=2, heads=4, intermediate=64, eos_token_id=99)
    enc = CLIPTextEncoder(cfg)
    ids = jnp.asarray([[1, 5, 7, 99, 99, 99, 99, 99]])
    params = enc.init(jax.random.PRNGKey(15), ids)
    h, pooled = enc.apply(params, ids)
    assert h.shape == (1, 8, 32) and pooled.shape == (1, 32)
    # causality: changing a later token must not affect earlier positions
    ids2 = ids.at[0, 5].set(42)
    h2, _ = enc.apply(params, ids2)
    np.testing.assert_allclose(np.asarray(h[:, :5]), np.asarray(h2[:, :5]), atol=1e-5)
    assert float(jnp.abs(h[:, 5:] - h2[:, 5:]).max()) > 1e-6
    # pooled uses first EOS (position 3) => unchanged by the later edit
    _, p2 = enc.apply(params, ids2)


def test_tokenizer_fallback_deterministic():
    tok = CLIPTokenizer()
    a = tok.encode("a photo of an astronaut")
    b = tok.encode("a photo of an astronaut")
    np.testing.assert_array_equal(a, b)
    assert a.shape == (77,)
    assert a[0] == tok.bos_id and tok.eos_id in a[1:]
    c = tok.encode("a different prompt")
    assert not np.array_equal(a, c)
