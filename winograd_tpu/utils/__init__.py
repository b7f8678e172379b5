"""Host utility layer: blob IO, timing, differential checking.

TPU-native rebuild of the reference's C utility layer
(/root/reference/util.c, util.h): `get_parameter`, `transpose`,
`getTimeMicroseconds64`, `output_checker` — backed by a native C++ library
(winograd_tpu/native) via ctypes, with a pure-numpy fallback.
"""

from winograd_tpu.utils.io import get_parameter, save_parameter, transpose
from winograd_tpu.utils.timing import get_time_microseconds64, Timer, bench_loop
from winograd_tpu.utils.checker import output_checker, CheckResult, ParityError

__all__ = [
    "get_parameter",
    "save_parameter",
    "transpose",
    "get_time_microseconds64",
    "Timer",
    "bench_loop",
    "output_checker",
    "CheckResult",
    "ParityError",
]
