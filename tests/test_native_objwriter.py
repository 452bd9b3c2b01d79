"""Native C++ OBJ writer: parity with the Python writer + big-mesh speed."""

import os
import time

import numpy as np
import pytest

from triplaneturbo_tpu.utils.native import native_available, write_obj_native


def _mesh(n=1000, f=2000, seed=0, masked=True):
    rng = np.random.RandomState(seed)
    verts = rng.randn(n, 3).astype(np.float32)
    colors = rng.rand(n, 3).astype(np.float32)
    faces = rng.randint(0, n, (f, 3)).astype(np.int32)
    vm = (rng.rand(n) > 0.3) if masked else None
    if vm is not None:
        # keep faces valid: only faces whose verts are all valid are masked in
        fm = vm[faces].all(axis=1)
    else:
        fm = None
    return verts, colors, faces, vm, fm


@pytest.mark.skipif(not native_available(), reason="no C++ toolchain")
def test_native_matches_python_writer(tmp_path):
    from triplaneturbo_tpu.utils.saving import save_obj

    verts, colors, faces, vm, fm = _mesh()
    p_native = str(tmp_path / "native.obj")
    assert write_obj_native(p_native, verts, faces, colors, vm, fm)

    # python reference (force the fallback by passing normals=None via direct
    # construction of lines): reuse save_obj on a copy path with native off
    import triplaneturbo_tpu.utils.native as native_mod

    orig = native_mod.write_obj_native
    native_mod.write_obj_native = lambda *a, **k: False
    try:
        p_py = save_obj(str(tmp_path / "python.obj"), verts, faces, v_rgb=colors, v_mask=vm, t_mask=fm)
    finally:
        native_mod.write_obj_native = orig

    def parse(path):
        vs, fs = [], []
        for line in open(path):
            t = line.split()
            if not t:
                continue
            if t[0] == "v":
                vs.append([float(x) for x in t[1:]])
            elif t[0] == "f":
                fs.append([int(x) for x in t[1:]])
        return np.asarray(vs), np.asarray(fs)

    v1, f1 = parse(p_native)
    v2, f2 = parse(p_py)
    assert v1.shape == v2.shape
    np.testing.assert_allclose(v1, v2, atol=2e-4)
    np.testing.assert_array_equal(f1, f2)


@pytest.mark.skipif(not native_available(), reason="no C++ toolchain")
def test_native_writer_speed(tmp_path):
    verts, colors, faces, vm, fm = _mesh(n=200_000, f=400_000, masked=False)
    t0 = time.time()
    assert write_obj_native(str(tmp_path / "big.obj"), verts, faces, colors)
    dt = time.time() - t0
    # generous bound: the suite often runs alongside TPU compile jobs, and
    # this is a contention-sensitive wall-clock guard, not a benchmark
    assert dt < 15.0, f"native writer too slow: {dt:.1f}s"
    assert os.path.getsize(tmp_path / "big.obj") > 10_000_000
