from dp_gp_lvm_tpu.distributions import gaussian, stick_breaking  # noqa: F401
