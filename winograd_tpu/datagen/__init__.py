"""Offline data/parameter generation (L0 of the reference, SURVEY.md §1)."""

from winograd_tpu.datagen.generate import (
    make_winograd_case,
    make_pointwise_case,
    make_block_case,
    generate_all,
)

__all__ = [
    "make_winograd_case",
    "make_pointwise_case",
    "make_block_case",
    "generate_all",
]
