from dp_gp_lvm_tpu.kernels import ard_rbf  # noqa: F401
