"""Benchmark harness: protocol, parity hard-fail, CLI plumbing."""

import json
import subprocess
import sys

import numpy as np
import pytest

from winograd_tpu.bench.cli import run_case
from winograd_tpu.utils.checker import ParityError
from winograd_tpu.utils.timing import bench_loop


def test_run_case_pointwise_quick():
    r = run_case(2, iterations=4, warmup=1)
    assert r["parity_ok"]
    assert r["pallas_mean_us"] > 0 and r["xla_mean_us"] > 0
    assert r["iterations"] == 3  # 4 - 1 warmup


def test_run_case_winograd_quick():
    r = run_case(0, iterations=3, warmup=1)
    assert r["parity_ok"]
    assert r["max_error_pallas"] < 1e-4


def test_run_case_stem_quick():
    """Mode 22: the isolated fused stem — full parity surface (fused, XLA
    emitter, the s2d alternate in the 'direct' slot, both tiers)."""
    r = run_case(22, iterations=3, warmup=1)
    assert r["parity_ok"]
    assert r["max_error_pallas"] < 1e-4
    assert r["max_error_direct"] < 1e-4
    assert r["int8_rel_error"] is not None and r["bf16w_rel_error"] is not None


def test_bench_loop_protocol():
    import jax.numpy as jnp

    calls = []

    def fn():
        calls.append(1)
        return jnp.zeros(8)

    r = bench_loop("x", fn, iterations=10, warmup=2, chain_depth=5)
    assert r.iterations == 8
    assert len(r.per_iteration_us) == 10
    assert len(calls) == 10 + 5
    assert r.mean_us == pytest.approx(float(np.mean(r.per_iteration_us[2:])))


def test_parity_hard_fail(monkeypatch):
    """Corrupt the golden model — run_case must raise (the reference's
    checker can't fail; ours must, SURVEY.md §4)."""
    import winograd_tpu.bench.cli as cli

    real_make_case = cli.make_case

    def corrupted(mode, seed=0):
        case = real_make_case(mode, seed)
        case["golden"] = case["golden"] + 1.0
        return case

    monkeypatch.setattr(cli, "make_case", corrupted)
    with pytest.raises(ParityError):
        run_case(2, iterations=2, warmup=1)


def test_cli_json_output():
    proc = subprocess.run(
        [sys.executable, "-m", "winograd_tpu.bench", "3", "--iterations", "3",
         "--warmup", "1", "--json", "--platform", "cpu"],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr
    results = json.loads(proc.stdout)
    assert results[0]["mode"] == 3 and results[0]["parity_ok"]


def test_run_case_train_quick():
    """The train-mode branch of run_case (modes 17/19/25's machinery) on a
    tiny injected config: grad-agreement gate, the round-5 bf16w train
    tier (step timed into bf16w_device_us; forward golden-checked), and
    the forward-parity fields."""
    import dataclasses

    from winograd_tpu.config import CASES, BasicTrainConfig

    @dataclasses.dataclass(frozen=True)
    class _TinyT(BasicTrainConfig):
        stages = ((16, 8, 2),)
        img: int = 32
        stem_c: int = 16
        num_classes: int = 16

    CASES[990] = _TinyT("tiny_trainstep_bench")
    try:
        r = run_case(990, iterations=3, warmup=1)
    finally:
        del CASES[990]
    assert r["parity_ok"]
    assert r["train_grad_rel_error"] < 1e-3
    assert r["train_bf16w_grad_rel_error"] < 2e-2
    assert r["bf16w_device_us"] is not None
    assert r["bf16w_rel_error"] is not None and r["bf16w_rel_error"] < 5e-3
