from svtyper_tpu.utils.formatting import (  # noqa: F401
    fmt_f2,
    fmt_g2,
    fmt_gl,
    trunc_int,
)
