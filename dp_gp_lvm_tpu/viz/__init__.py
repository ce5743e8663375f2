from dp_gp_lvm_tpu.viz.plots import (  # noqa: F401
    plot_ard_weights,
    plot_latent_scatter,
    plot_stick_weights,
    plot_assignment_matrix,
    plot_elbo_trace,
    plot_skeleton,
)
