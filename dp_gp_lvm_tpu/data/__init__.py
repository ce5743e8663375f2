from dp_gp_lvm_tpu.data import synthetic  # noqa: F401
