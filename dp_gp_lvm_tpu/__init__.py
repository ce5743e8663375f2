"""dp_gp_lvm_tpu — TPU-native JAX framework for GP-LVM model families.

A from-scratch rebuild of the capability set of the reference
``AndrewRLawrence/dp_gp_lvm`` (Python + TensorFlow 1.x, single-process CPU),
redesigned TPU-first:

- every ELBO + gradient step is a single jit-compiled XLA program;
- the ARD-RBF Gram matrix and the Bayesian-GP-LVM psi statistics
  (Psi0/Psi1/Psi2 expectations under Gaussian q(X)) are formulated as
  matmuls for the MXU, with fused Pallas kernels for the hot path;
- Cholesky factorizations / triangular solves inside the sparse variational
  free energy are batched (vmapped over DP truncation atoms) on the MXU;
- data-parallel scaling shards N over a `jax.sharding.Mesh` and psums
  psi-statistic partial sums over ICI (`parallel/`).

Model families (BASELINE.json configs 1-5):
  1. Bayesian GP-LVM (ARD-RBF)                        -> models/bgplvm.py
  2. Sparse variational GP-LVM, inducing points       -> models/bgplvm.py + sparse_gp.py
  3. MRD shared/private latent views                  -> models/mrd.py
  4. DP-GP-LVM, stick-breaking truncation over dims   -> models/dp_gp_lvm.py
  5. Missing-data prediction / imputation             -> models/prediction.py

The reference repo contains no native (C++/CUDA) code of its own (see
SURVEY.md section 2); its native layer was TensorFlow's prebuilt runtime.
Here that role is played by XLA plus custom Pallas kernels in ops/pallas/.
"""

__version__ = "0.1.0"
