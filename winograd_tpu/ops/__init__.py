"""Pure reference operators: numpy golden models and jnp mirrors.

These are the correctness oracle for the whole framework — a *stronger*
oracle than the reference's cuDNN-vs-custom differential check (which would
pass if both implementations shared a bug; see SURVEY.md section 4).
"""

from winograd_tpu.ops import reference, jnp_ops  # noqa: F401
