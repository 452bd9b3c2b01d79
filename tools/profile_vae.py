"""Which conv shapes dominate the VAE decode 111 ms? Times isolated stacks
mimicking each decoder stage (same shapes/dtypes) + the real decoder."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import flax.linen as nn

jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

DT = jnp.bfloat16


def timeit(f, *a, n=5):
    # NOTE: jax.block_until_ready does not synchronize on the tunneled axon
    # backend — force a scalar host transfer instead
    fj = jax.jit(lambda *a_: jnp.sum(f(*a_).astype(jnp.float32)))
    float(fj(*a))
    ts = []
    for _ in range(n):
        t0 = time.time(); float(fj(*a)); ts.append(time.time() - t0)
    return min(ts) * 1e3


class ConvStack(nn.Module):
    ch: int
    n: int
    @nn.compact
    def __call__(self, x):
        for i in range(self.n):
            x = nn.Conv(self.ch, (3, 3), padding=1, dtype=DT, name=f"c{i}")(x)
        return x


class ResStack(nn.Module):
    """norm->silu->conv x2 + skip, like ResnetBlock2D."""
    ch: int
    n: int
    @nn.compact
    def __call__(self, x):
        for i in range(self.n):
            h = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=DT, name=f"n{i}a")(x)
            h = nn.silu(h)
            h = nn.Conv(self.ch, (3, 3), padding=1, dtype=DT, name=f"c{i}a")(h)
            h = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=DT, name=f"n{i}b")(h)
            h = nn.silu(h)
            h = nn.Conv(self.ch, (3, 3), padding=1, dtype=DT, name=f"c{i}b")(h)
            x = x + h
        return x


key = jax.random.PRNGKey(0)
stages = [
    ("mid+up0 32x32x512 x5res", (6, 32, 32, 512), 512, 5),
    ("up1 64x64x512 x3res", (6, 64, 64, 512), 512, 3),
    ("up2 128x128x256 x3res", (6, 128, 128, 256), 256, 3),
    ("up3 256x256x128 x3res", (6, 256, 256, 128), 128, 3),
]
total = 0.0
for name, shape, ch, nres in stages:
    x = jax.random.normal(key, shape, DT)
    m = ResStack(ch=ch, n=nres)
    p = m.init(key, x)
    t = timeit(lambda p_, x_: m.apply(p_, x_), p, x)
    flops = nres * 2 * (shape[0] * shape[1] * shape[2] * ch * ch * 9 * 2)
    print(f"{name:28s} {t:7.1f} ms   ({flops/1e9:.0f} GF -> {flops/t/1e9:.0f} GF/ms)")
    total += t

# pure conv stack at 256^2 for comparison (no norms)
x = jax.random.normal(key, (6, 256, 256, 128), DT)
m = ConvStack(ch=128, n=6)
p = m.init(key, x)
t = timeit(lambda p_, x_: m.apply(p_, x_), p, x)
print(f"{'pure conv 256x256x128 x6':28s} {t:7.1f} ms")

print(f"sum of res stages: {total:.1f} ms")

# real decoder
from triplaneturbo_tpu.models.vae import Decoder, VAEConfig
cfg = VAEConfig(dtype_str="bfloat16", output_dim=64)
dec = Decoder(cfg)
z = jax.random.normal(key, (6, 32, 32, 4), DT)
p = jax.jit(dec.init)(key, z)
t = timeit(lambda p_, z_: dec.apply(p_, z_), p, z)
print(f"{'real decoder (6 planes)':28s} {t:7.1f} ms")


# ---- groupnorm variants at the hot shape --------------------------------
def flax_gn(x, scale, bias):
    return nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=DT).apply(
        {"params": {"scale": scale, "bias": bias}}, x)

def hand_gn_bf16(x, scale, bias):
    B, H, W, C = x.shape
    g = x.reshape(B, H * W, 32, C // 32)
    mean = g.mean(axis=(1, 3), keepdims=True)
    var = ((g - mean) ** 2).mean(axis=(1, 3), keepdims=True)
    out = (g - mean) * jax.lax.rsqrt(var + 1e-6)
    return out.reshape(B, H, W, C) * scale + bias

def hand_gn_f32stats(x, scale, bias):
    B, H, W, C = x.shape
    xf = x.astype(jnp.float32).reshape(B, H * W, 32, C // 32)
    mean = xf.mean(axis=(1, 3), keepdims=True)
    var = ((xf - mean) ** 2).mean(axis=(1, 3), keepdims=True)
    out = ((xf - mean) * jax.lax.rsqrt(var + 1e-6)).astype(DT)
    return out.reshape(B, H, W, C) * scale + bias

x = jax.random.normal(key, (6, 256, 256, 128), DT)
sc = jnp.ones((128,), DT); bi = jnp.zeros((128,), DT)
print("gn flax      :", f"{timeit(flax_gn, x, sc, bi):6.1f} ms")
print("gn bf16 hand :", f"{timeit(hand_gn_bf16, x, sc, bi):6.1f} ms")
print("gn f32 stats :", f"{timeit(hand_gn_f32stats, x, sc, bi):6.1f} ms")
print("gn+silu bf16 :", f"{timeit(lambda x_, s_, b_: nn.silu(hand_gn_bf16(x_, s_, b_)), x, sc, bi):6.1f} ms")
# floor reference: single elementwise pass
print("1 pass floor :", f"{timeit(lambda x_: x_ * 1.0001, x):6.1f} ms")


# ---- robust timings: repeat op inside one jit to amortize transfer floor ---
def timeit_rep(op, x0, n_rep=16, n=3):
    def f(x):
        def body(i, x_):
            return op(x_) * 0.999 + 0.001  # prevent loop-invariant hoisting
        return jnp.sum(jax.lax.fori_loop(0, n_rep, body, x).astype(jnp.float32))
    fj = jax.jit(f)
    float(fj(x0))
    ts = []
    for _ in range(n):
        t0 = time.time(); float(fj(x0)); ts.append(time.time() - t0)
    return min(ts) * 1e3 / n_rep

x = jax.random.normal(key, (6, 256, 256, 128), DT)
sc = jnp.ones((128,), DT); bi = jnp.zeros((128,), DT)
print("REP elementwise pass :", f"{timeit_rep(lambda v: v * 1.0001, x):7.2f} ms/op")
print("REP flax groupnorm   :", f"{timeit_rep(lambda v: flax_gn(v, sc, bi), x):7.2f} ms/op")
print("REP gn+silu flax     :", f"{timeit_rep(lambda v: nn.silu(flax_gn(v, sc, bi)), x):7.2f} ms/op")

m1 = ConvStack(ch=128, n=1)
p1 = m1.init(key, x)
print("REP conv3x3 256x128  :", f"{timeit_rep(lambda v: m1.apply(p1, v), x):7.2f} ms/op")
mr = ResStack(ch=128, n=1)
pr = mr.init(key, x)
print("REP resblock 256x128 :", f"{timeit_rep(lambda v: mr.apply(pr, v), x):7.2f} ms/op")

x64 = jax.random.normal(key, (6, 64, 64, 512), DT)
mr64 = ResStack(ch=512, n=1)
pr64 = mr64.init(key, x64)
print("REP resblock 64x512  :", f"{timeit_rep(lambda v: mr64.apply(pr64, v), x64):7.2f} ms/op")
x128 = jax.random.normal(key, (6, 128, 128, 256), DT)
mr128 = ResStack(ch=256, n=1)
pr128 = mr128.init(key, x128)
print("REP resblock 128x256 :", f"{timeit_rep(lambda v: mr128.apply(pr128, v), x128):7.2f} ms/op")
