import math

import pytest

import triplaneturbo_tpu as ttt
from triplaneturbo_tpu.utils import C, C_max, DotDict, load_config, parse_structured
from triplaneturbo_tpu.utils.config import apply_dotlist, resolve_interpolations


def test_registry_register_find():
    @ttt.register("unit-test-dummy")
    class Dummy:
        pass

    assert ttt.find("unit-test-dummy") is Dummy


def test_registry_mixin_syntax():
    @ttt.register("unit-test-a")
    class A:
        x = 1

    @ttt.register("unit-test-b")
    class B:
        y = 2

    cls = ttt.find("unit-test-a:unit-test-b")
    assert issubclass(cls, A) and issubclass(cls, B)


def test_schedule_constant_and_linear():
    assert C(0.5) == 0.5
    # [start_val, end_val, end_step] -> starts at step 0
    assert C([1.0, 0.0, 10], global_step=5) == pytest.approx(0.5)
    # 4-form with offset start
    assert C([10, 1.0, 0.0, 20], global_step=10) == pytest.approx(1.0)
    assert C([10, 1.0, 0.0, 20], global_step=15) == pytest.approx(0.5)
    assert C([10, 1.0, 0.0, 20], global_step=100) == pytest.approx(0.0)


def test_schedule_exp_and_milestones():
    v = C([0, 1.0, 0.01, 100], global_step=50, interpolation="exp")
    assert v == pytest.approx(math.exp(0.5 * math.log(0.01)))
    # milestone form: value 1->0 over [0,10], then 0->5 over [10,20]
    spec = [0, 1.0, 0.0, 10, 5.0, 20]
    assert C(spec, global_step=5) == pytest.approx(0.5)
    assert C(spec, global_step=15) == pytest.approx(2.5)
    assert C_max(spec) == 5.0


def test_config_dotlist_and_interp(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text(
        "name: exp\n"
        "tag: ${rmspace:hello world,-}\n"
        "system:\n  lr: 0.1\n  lr2: ${system.lr}\n"
    )
    cfg = load_config(str(p), cli_args=["system.lr=0.2", "system.new.deep=3"])
    assert cfg.system.lr == 0.2
    assert cfg.system.lr2 == 0.2
    assert cfg.tag == "hello-world"
    assert cfg.system.new.deep == 3
    assert isinstance(cfg.system, DotDict)


def test_parse_structured():
    from dataclasses import dataclass

    @dataclass
    class Cfg:
        a: int = 1
        b: float = 2.0

    c = parse_structured(Cfg, {"a": 5, "unknown": 1})
    assert c.a == 5 and c.b == 2.0
    with pytest.raises(ValueError):
        parse_structured(Cfg, {"unknown": 1}, strict=True)


def test_resolver_arith():
    cfg = {"a": 4, "b": "${idiv:a,2}", "c": "${mul:a,3}"}
    out = resolve_interpolations(cfg)
    assert out["b"] == 2
    assert out["c"] == 12.0


def test_apply_dotlist_parses_types():
    cfg = apply_dotlist({}, ["x=true", "y=[1,2,3]", "z=null", "s=hello"])
    assert cfg["x"] is True
    assert cfg["y"] == [1, 2, 3]
    assert cfg["z"] is None
    assert cfg["s"] == "hello"


def test_eight_virtual_devices():
    import jax

    assert jax.device_count() >= 8


def test_callbacks_snapshots(tmp_path):
    from triplaneturbo_tpu.utils.callbacks import MetricsLogger, snapshot_code, snapshot_config

    trial = str(tmp_path / "trial")
    d = snapshot_config(trial, {"a": 1, "b": {"c": 2}})
    import os
    assert os.path.exists(os.path.join(d, "parsed.yaml"))
    code_dir = snapshot_code(trial, repo_root="/root/repo")
    assert code_dir is None or os.path.exists(os.path.join(code_dir, "bench.py"))
    ml = MetricsLogger(trial)
    ml.log(0, {"loss": 1.5, "skip": "str"})
    ml.progress(0, 100, "warmup")
    assert os.path.exists(ml.path) and os.path.exists(ml.progress_path)
