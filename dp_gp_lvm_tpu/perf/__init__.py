from dp_gp_lvm_tpu.perf.flops import (  # noqa: F401
    V5E_PEAKS,
    dp_step_costs,
    mfu,
)
