"""Before/after timing of marching_tets + full extract stage on TPU."""
import os, time
import jax, jax.numpy as jnp

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from triplaneturbo_tpu.ops.isosurface import marching_cubes, marching_tets

R = 160
lin = jnp.linspace(-1, 1, R)
g = jnp.stack(jnp.meshgrid(lin, lin, lin, indexing="ij"), -1)
sdf = (jnp.linalg.norm(g, axis=-1) - 0.6).astype(jnp.float32)
deform = 0.1 * jnp.sin(7 * g)

f = jax.jit(lambda s, d: marching_cubes(s, d, max_verts=196608, max_faces=393216))
m = f(sdf, deform)
# force: sum everything to a scalar and pull to host
force = jax.jit(lambda s, d: (lambda mm: mm.verts.sum() + mm.faces.sum() + mm.face_mask.sum() + mm.vert_mask.sum())(marching_cubes(s, d, max_verts=196608, max_faces=393216)))
float(force(sdf, deform))
ts = []
for _ in range(7):
    t0 = time.time(); float(force(sdf, deform)); ts.append(time.time() - t0)
print(f"marching_cubes 160^3 (forced): {min(ts)*1e3:.1f} ms")
print("n_verts", int(m.n_verts), "n_faces", int(m.n_faces))
