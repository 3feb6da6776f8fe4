"""Parity tests of the core math ops against reference golden data."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfart_tpu.ops import (
    embedder,
    rays as ray_ops,
    sampling,
    volsdf_math,
    neus_math,
    compositing,
)


def test_embed_dim():
    assert embedder.embed_dim(3, 6) == 3 + 3 * 2 * 6
    assert embedder.embed_dim(3, -1) == 3
    assert embedder.embed_dim(4, 10) == 4 + 4 * 2 * 10


def test_fourier_embed_ordering():
    x = jnp.array([[0.3, -1.2, 0.7]])
    out = np.asarray(embedder.fourier_embed(x, 3))
    xn = np.asarray(x)
    expect = [xn]
    for f in [1.0, 2.0, 4.0]:
        expect.append(np.sin(xn * f))
        expect.append(np.cos(xn * f))
    expect = np.concatenate(expect, axis=-1)
    np.testing.assert_allclose(out, expect, rtol=1e-6)


def test_get_rays_full_image(golden):
    g = golden("get_rays")
    rays_o, rays_d, sel = ray_ops.get_rays(
        jnp.asarray(g["c2w"])[None], jnp.asarray(g["intr"])[None],
        int(g["H"]), int(g["W"]), N_rays=-1)
    np.testing.assert_allclose(rays_o, g["rays_o"], atol=1e-5)
    np.testing.assert_allclose(rays_d, g["rays_d"], atol=1e-4)
    np.testing.assert_array_equal(np.asarray(sel), g["select_inds"])


def test_get_rays_subsample_shapes():
    key = jax.random.PRNGKey(0)
    c2w = jnp.eye(4)[None]
    intr = jnp.eye(4)[None]
    ro, rd, sel = ray_ops.get_rays(c2w, intr, 16, 24, N_rays=100, key=key)
    assert ro.shape == (1, 100, 3) and rd.shape == (1, 100, 3)
    assert sel.shape == (1, 100)
    assert int(sel.max()) < 16 * 24


def test_sphere_math(golden):
    g = golden("sphere_math")
    ro, rd = jnp.asarray(g["rays_o"]), jnp.asarray(g["rays_d"])
    near, far = ray_ops.near_far_from_sphere(ro, rd, r=3.0)
    np.testing.assert_allclose(near, g["near"], atol=1e-5)
    np.testing.assert_allclose(far, g["far"], atol=1e-5)
    n2, f2, mask = ray_ops.get_sphere_intersection(ro, rd, r=3.0)
    np.testing.assert_allclose(n2, g["inear"], atol=1e-5)
    np.testing.assert_allclose(f2, g["ifar"], atol=1e-5)
    np.testing.assert_array_equal(np.asarray(mask), g["imask"])
    dv = ray_ops.get_dvals_from_radius(ro, rd, jnp.asarray(g["rs"]))
    np.testing.assert_allclose(dv, g["dvals_radius"], atol=1e-4)


def test_sampling(golden):
    g = golden("sampling")
    sp = sampling.sample_pdf(jnp.asarray(g["bins"]), jnp.asarray(g["weights"]),
                             33, det=True)
    # a u value landing exactly on a cdf knot flips the searchsorted bin by
    # one ulp across platforms; allow isolated bin-jumps (<1% of samples)
    mism = ~np.isclose(np.asarray(sp), g["sp"], atol=1e-5)
    assert mism.mean() < 0.01, f"{mism.sum()} mismatches"

    sc = sampling.sample_cdf(jnp.asarray(g["bins"]), jnp.asarray(g["cdf"]),
                             21, det=True)
    np.testing.assert_allclose(sc, g["sc"], atol=1e-5)


def test_sample_pdf_stochastic_in_support():
    key = jax.random.PRNGKey(3)
    bins = jnp.sort(jax.random.uniform(key, (4, 9)) * 5.0, axis=-1)
    w = jax.random.uniform(jax.random.PRNGKey(4), (4, 8))
    s = sampling.sample_pdf(bins, w, 16, det=False, key=key)
    assert bool((s >= bins[..., :1]).all() and (s <= bins[..., -1:]).all())


def test_volsdf_sigma_and_bound(golden):
    g = golden("volsdf_math")
    sig = volsdf_math.sdf_to_sigma(jnp.asarray(g["sdf"]), 10.0, 0.1)
    np.testing.assert_allclose(sig, g["sigma"], rtol=1e-5, atol=1e-6)
    eb = volsdf_math.error_bound(jnp.asarray(g["d_vals"]), jnp.asarray(g["sdf"]),
                                 10.0, 0.1)
    ref = g["bounds"]
    finite = np.isfinite(ref)
    np.testing.assert_allclose(np.asarray(eb)[finite], ref[finite],
                               rtol=1e-4, atol=1e-5)
    assert bool(np.all(~np.isfinite(np.asarray(eb)[~finite])))


def test_fine_sample_parity(golden):
    g = golden("fine_sample")

    def sphere_sdf(pts):
        return jnp.linalg.norm(pts, axis=-1) - 1.5

    fine_d, beta, usage = volsdf_math.fine_sample(
        sphere_sdf, jnp.asarray(g["init_d"]), jnp.asarray(g["rays_o"]),
        jnp.asarray(g["rays_d"]),
        alpha_net=10.0, beta_net=0.1, far=8.0,
        eps=0.1, max_iter=3, max_bisection=5,
        final_N_importance=16, N_up=64, perturb=False)
    np.testing.assert_array_equal(np.asarray(usage), g["usage"])
    conv = g["usage"] >= 0
    # converged rays: tight parity (small f32 drift through cumsums)
    np.testing.assert_allclose(np.asarray(fine_d)[conv], g["fine_d"][conv],
                               atol=5e-3)
    np.testing.assert_allclose(np.asarray(beta)[conv], g["beta"][conv],
                               atol=1e-5)
    # never-converged rays sit exactly at the eps decision boundary, where a
    # one-ulp difference flips a bisection branch (chaotic, also true between
    # two torch runs with different op orders). Check loose agreement only.
    np.testing.assert_allclose(np.asarray(fine_d)[~conv], g["fine_d"][~conv],
                               atol=0.5)
    np.testing.assert_allclose(np.asarray(beta)[~conv], g["beta"][~conv],
                               atol=0.1)


def test_fine_sample_jittable(golden):
    g = golden("fine_sample")

    def sphere_sdf(pts):
        return jnp.linalg.norm(pts, axis=-1) - 1.5

    f = jax.jit(lambda d, o, rd: volsdf_math.fine_sample(
        sphere_sdf, d, o, rd, alpha_net=10.0, beta_net=0.1, far=8.0,
        eps=0.1, max_iter=3, max_bisection=5,
        final_N_importance=16, N_up=64, perturb=False))
    fine_d, beta, usage = f(jnp.asarray(g["init_d"]), jnp.asarray(g["rays_o"]),
                            jnp.asarray(g["rays_d"]))
    conv = g["usage"] >= 0
    np.testing.assert_allclose(np.asarray(fine_d)[conv], g["fine_d"][conv],
                               atol=5e-3)


def test_neus_math(golden):
    g = golden("neus_math")
    cdf, alpha = neus_math.sdf_to_alpha(jnp.asarray(g["sdf"]), float(g["s"]))
    np.testing.assert_allclose(cdf, g["cdf"], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(alpha, g["alpha"], rtol=1e-4, atol=1e-6)
    _, _, w = neus_math.sdf_to_w(jnp.asarray(g["sdf"]), float(g["s"]))
    np.testing.assert_allclose(w, g["w"], rtol=1e-4, atol=1e-6)


def test_compositing_weights_sum():
    # weights must sum to < 1 and match alpha_to_w identity
    alpha = jnp.array([[0.1, 0.5, 0.9, 0.2]])
    w = compositing.alpha_to_w(alpha)
    manual = [0.1, 0.5 * (1 - 0.1 + 1e-10)]
    np.testing.assert_allclose(w[0, 0], manual[0], rtol=1e-6)
    np.testing.assert_allclose(w[0, 1], manual[1], rtol=1e-6)
    assert float(w.sum()) <= 1.0 + 1e-5


def test_schedules(golden):
    g = golden("schedules")
    from nerfart_tpu.models.base import (
        cosine_warmup_schedule_factor, exponential_schedule_factor)
    cos = np.array([cosine_warmup_schedule_factor(int(s), 1000, 100, 0.1)
                    for s in g["steps"]])
    exp = np.array([exponential_schedule_factor(int(s), 1000, 0.1)
                    for s in g["steps"]])
    # f32 (jnp) vs f64 (reference numpy) — loss factors only need ~1e-4
    np.testing.assert_allclose(cos, g["cos"], rtol=1e-4)
    np.testing.assert_allclose(exp, g["exp"], rtol=1e-4)
