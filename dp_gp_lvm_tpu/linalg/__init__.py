from dp_gp_lvm_tpu.linalg.chol import (  # noqa: F401
    safe_cholesky,
    safe_cholesky_spec,
    tri_solve,
    cho_solve,
    logdet_from_chol,
)
