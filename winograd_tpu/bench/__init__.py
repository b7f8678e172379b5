"""Benchmark harness / CLI — L3 of the reference (Test.c), rebuilt."""

from winograd_tpu.bench.cli import run_case, main

__all__ = ["run_case", "main"]
