from dp_gp_lvm_tpu.train import init, loop  # noqa: F401
