from dp_gp_lvm_tpu.models import (  # noqa: F401
    bound,
    bgplvm,
    dp_gp_lvm,
    gp_regression,
    mrd,
    prediction,
    serving,
    sparse_gp,
)
