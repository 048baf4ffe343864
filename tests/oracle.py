"""Pure-NumPy oracle implementing the reference algorithm semantics.

Independent re-statement of nmf.cu:118-176 used to validate the JAX ops.
"""

import numpy as np

EPS = np.float32(2.2204e-16)


def clamp(a, eps=EPS):
    return np.maximum(a, np.asarray(eps, a.dtype))


def np_update_h(w, h, x, eps=EPS):
    z = x / clamp(w @ h, eps)
    sum_w = clamp(w.sum(axis=0), eps)
    return h * (w.T @ z) / sum_w[:, None]


def np_update_w(w, h, x, eps=EPS):
    z = x / clamp(w @ h, eps)
    sum_h = clamp(h.sum(axis=1), eps)
    return w * (z @ h.T) / sum_h[None, :]


def np_mu_step(w, h, x, eps=EPS):
    h = np_update_h(w, h, x, eps)
    w = np_update_w(w, h, x, eps)
    return w, h


def np_kl(x, w, h, eps=EPS):
    y = clamp(w @ h, eps)
    return float(np.sum(x * (np.log(x) - np.log(y)) - x + y))


def np_solve(x, w, h, n_iter, eps=EPS):
    x, w, h = clamp(x, eps), clamp(w, eps), clamp(h, eps)
    for _ in range(n_iter):
        w, h = np_mu_step(w, h, x, eps)
    return w, h
