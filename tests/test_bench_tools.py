"""Unit tests for the measurement tooling: the scaling-efficiency
acceptance gate (BASELINE.md >=85%) and the serving bucket selection."""

import importlib.util
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_scaling_bench():
    spec = importlib.util.spec_from_file_location(
        "scaling_bench", os.path.join(ROOT, "scripts", "scaling_bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_scaling_gate():
    sb = _load_scaling_bench()
    good = [
        {"devices": 1, "eff": 1.0},
        {"devices": 2, "eff": 0.93},
        {"devices": 4, "eff": 0.87},
    ]
    bad = good + [{"devices": 8, "eff": 0.60}]
    # no --check: always pass
    assert sb._gate(bad, "tpu", check=False) == 0
    # --check on a real slice enforces the bar
    assert sb._gate(good, "tpu", check=True) == 0
    assert sb._gate(bad, "tpu", check=True) == 1
    # --check on CPU virtual meshes is informational
    assert sb._gate(bad, "cpu", check=True) == 0
    # single device is never gated
    assert sb._gate([{"devices": 1, "eff": 1.0}], "tpu", check=True) == 0


def test_crosshost_bucket_selection():
    from f8net_tpu.engine.serve import CrossHostServingEngine
    from f8net_tpu.parallel import make_mesh

    mesh = make_mesh(data=8, model=1)
    srv = CrossHostServingEngine(
        lambda x: x, mesh, buckets=(8, 16, 32), image_shape=(2, 2, 3)
    )
    # smallest bucket holding the global demand
    assert srv._pick_bucket(1, 1, nproc=1) == 8
    assert srv._pick_bucket(9, 9, nproc=1) == 16
    assert srv._pick_bucket(0, 0, nproc=1) == 8  # idle ticks run small
    # per-host shard capacity binds too: total fits 8 but one host holds 5
    assert srv._pick_bucket(5, 5, nproc=2) == 16
    # beyond the ladder: clamp to the largest
    assert srv._pick_bucket(100, 50, nproc=2) == 32
