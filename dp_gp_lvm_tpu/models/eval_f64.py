r"""Float64 host evaluation of the uncollapsed SVI bound (numpy/scipy).

Why this exists (round-4, verdict item 1): the committed round-3 c8
artifact reported a full-N ELBO of +4.56e8 — mathematically impossible
(the noise floor caps the bound at ~+1.2e7 on that data) — because the
final full-data evaluation ran as ONE f32 XLA reduction over N=131072
rows on a diverged parameter state: differences of beta-scale ~1e9
terms in f32. Metrics that gate a run must not inherit the training
path's precision.

This module re-evaluates `svi_gplvm.elbo` entirely on the host in
float64 (numpy + scipy.linalg), chunked over rows, independent of JAX's
x64 flag (TPU sessions leave it off). It deliberately re-derives the
ARD-RBF psi statistics and the whitened Hensman bound from the math
(Titsias & Lawrence 2010 psi expectations; Hensman et al. 2013 bound —
kernels/ard_rbf.py and models/svi_gplvm.py docstrings) rather than
calling the JAX code, so it doubles as an independent oracle: tested
against `svi_gplvm.elbo` on the f64 CPU path (tests/test_svi.py).

ard_rbf kernel only (the big-N configs' kernel); raises otherwise.
"""
from __future__ import annotations

import numpy as np
import scipy.linalg


def _softplus(x):
    return np.logaddexp(x, 0.0)


def _positive(raw, floor=0.0):
    return _softplus(np.asarray(raw, np.float64)) + floor


def _constrain(params, config):
    from dp_gp_lvm_tpu.core.transforms import (
        MIN_NOISE,
        MIN_VARIATIONAL_VAR,
    )

    p = {k: np.asarray(v, np.float64) for k, v in params.items()}
    floor = max(config.noise_floor, MIN_NOISE) if config.noise_floor \
        else MIN_NOISE
    raw = p["raw_u_scale"]
    ls = np.tril(raw, -1) + np.diag(_positive(np.diagonal(raw)))
    c = {
        "z": p["z"],
        "variance": _positive(p["raw_variance"]),
        "ard": _positive(p["raw_ard"]),
        "noise": _positive(p["raw_noise"], floor),
        "u_mean": p["u_mean"],
        "u_scale": ls,
    }
    if "qx_mean" in p:
        c["qx_mean"] = p["qx_mean"]
        c["qx_var"] = _positive(p["raw_qx_var"], MIN_VARIATIONAL_VAR)
    for k in p:
        if k.startswith("enc_"):
            c[k] = p[k]
    return c


def _encode(c, y, var_floor):
    from dp_gp_lvm_tpu.core.transforms import MIN_VARIATIONAL_VAR

    yc = y - c["enc_mean"][None, :]
    mu = yc @ c["enc_wlin"] + c["enc_bm"][None, :]
    raw_s = np.broadcast_to(c["enc_bs"][None, :], mu.shape).copy()
    if "enc_w1" in c:
        h = np.tanh(yc @ c["enc_w1"] + c["enc_b1"][None, :])
        mu = mu + h @ c["enc_wm"]
        raw_s = raw_s + h @ c["enc_ws"]
    s = _positive(raw_s, MIN_VARIATIONAL_VAR) + var_floor
    return mu, s


def _gram(variance, ard, z):
    zs = z * np.sqrt(ard)[None, :]
    n2 = np.sum(zs * zs, axis=-1)
    d2 = np.maximum(n2[:, None] - 2.0 * zs @ zs.T + n2[None, :], 0.0)
    return variance * np.exp(-0.5 * d2)


def _psi_chunk(variance, ard, mu, s, z, log_e):
    """(psi1 (B, M), psi2 (M, M)) for one row chunk, f64."""
    denom1 = ard[None, :] * s + 1.0
    a = ard[None, :] / denom1
    log_norm1 = -0.5 * np.sum(np.log(denom1), axis=-1)
    row = np.sum(a * mu * mu, axis=-1)
    quad = row[:, None] - 2.0 * (a * mu) @ z.T + a @ (z * z).T
    psi1 = variance * np.exp(log_norm1[:, None] - 0.5 * quad)

    denom2 = 2.0 * ard[None, :] * s + 1.0
    b = ard[None, :] / denom2
    log_norm2 = -0.5 * np.sum(np.log(denom2), axis=-1)
    sterm = np.sum(b * mu * mu, axis=-1)
    t = (b * mu) @ z.T
    pq = b @ (z * z).T
    cz = np.einsum("bq,mq,lq->bml", b, z, z)
    expo = (
        log_e[None, :, :]
        + (log_norm2 - sterm)[:, None, None]
        + (t - 0.25 * pq)[:, :, None]
        + (t - 0.25 * pq)[:, None, :]
        - 0.5 * cz
    )
    psi2 = (variance ** 2) * np.sum(np.exp(expo), axis=0)
    return psi1, psi2


def elbo_f64(params, Y, config, chunk: int = 8192) -> float:
    """Full-batch whitened Hensman bound in host float64.

    Mirrors svi_gplvm.elbo term for term (same constrain transforms,
    same jitter-free chol on K_uu + initial jitter policy is NOT
    replicated — f64 at these scales needs none beyond a 1e-12 ridge).
    """
    if config.kernel != "ard_rbf":
        raise NotImplementedError(
            f"elbo_f64 supports ard_rbf only, got {config.kernel!r}"
        )
    c = _constrain(params, config)
    Y = np.asarray(Y, np.float64)
    n, d = Y.shape
    z = c["z"]
    m = z.shape[0]
    variance, ard, noise = c["variance"], c["ard"], c["noise"]
    beta = 1.0 / noise

    # log_e[m, m'] = -alpha/4 * (z_m - z_m')^2 summed over q
    zz = z[:, None, :] - z[None, :, :]
    log_e = -0.25 * np.sum(ard[None, None, :] * zz * zz, axis=-1)

    var_floor = getattr(config, "qx_var_floor", 0.0) \
        if getattr(config, "amortized", False) else 0.0

    psi0 = variance * n
    psi1T_y = np.zeros((m, d))
    psi2 = np.zeros((m, m))
    yty = np.zeros((d,))
    kl_x = 0.0
    for lo in range(0, n, chunk):
        y_b = Y[lo:lo + chunk]
        if "qx_mean" in c:
            mu_b = c["qx_mean"][lo:lo + chunk]
            s_b = c["qx_var"][lo:lo + chunk]
        else:
            mu_b, s_b = _encode(c, y_b, var_floor)
        p1, p2 = _psi_chunk(variance, ard, mu_b, s_b, z, log_e)
        psi1T_y += p1.T @ y_b
        psi2 += p2
        yty += np.sum(y_b * y_b, axis=0)
        kl_x += 0.5 * np.sum(mu_b * mu_b + s_b - np.log(s_b) - 1.0)

    kuu = _gram(variance, ard, z) + 1e-12 * np.eye(m)
    L = np.linalg.cholesky(kuu)
    a = scipy.linalg.solve_triangular(L, psi1T_y, lower=True)
    half = scipy.linalg.solve_triangular(L, psi2, lower=True)
    A2 = scipy.linalg.solve_triangular(L, half.T, lower=True)
    A2 = 0.5 * (A2 + A2.T)

    mu_u, ls = c["u_mean"], c["u_scale"]
    tr_sa2 = np.sum((A2 @ ls) * ls)
    quad = np.sum(mu_u * (A2 @ mu_u), axis=0)
    log2pi = np.log(2.0 * np.pi)
    shared = (
        -0.5 * n * (log2pi + np.log(noise))
        - 0.5 * beta * (tr_sa2 + psi0 - np.trace(A2))
    )
    per_dim = shared - 0.5 * beta * (
        yty - 2.0 * np.sum(mu_u * a, axis=0) + quad
    )
    s_diag = np.diagonal(ls)
    kl_u = (
        0.5 * np.sum(mu_u * mu_u)
        + 0.5 * d * (np.sum(ls * ls) - m - 2.0 * np.sum(np.log(s_diag)))
    )
    return float(np.sum(per_dim) - kl_u - kl_x)
