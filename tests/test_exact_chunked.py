"""Ray-axis microbatching of the checkpointed-exact path (VERDICT r4 #1).

Round 4 kept an (nseg, N, 7) checkpoint stack resident for the whole batch;
above ~1 GB of checkpoint+replay state the TPU worker reproducibly crashed
(ROADMAP r4 finding).  The chunked path maps the forward over
ANRT_EXACT_CHUNK-ray chunks and recomputes each chunk's checkpoints inside
the backward, bounding memory at ANY batch size — the property the
reference's AD tape had up to GPU memory (core/tracer.py:16-66).

These tests pin chunked == unchunked at machine precision for every
variant, including chunk sizes that do not divide N, plus the ADVICE r4
exactness fixes: never-exit rays' vt cotangent is zeroed (true autodiff
behavior) and (3,)/(1,3) per-ray vector args work under jax.grad.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adjointnonlinearraytracing_tpu import tracer
from tests.test_tracer import bump_field, entry_rays


def _compare(monkeypatch, fwd, loss, rif, chunk="8"):
    """Forward outputs and gradient with chunking off vs on."""
    monkeypatch.setenv("ANRT_EXACT_CHUNK", "0")
    a = fwd(rif)
    g0 = jax.grad(loss)(rif)
    monkeypatch.setenv("ANRT_EXACT_CHUNK", chunk)
    b = fwd(rif)
    g1 = jax.grad(loss)(rif)
    for ai, bi in zip(a, b):
        np.testing.assert_allclose(ai, bi, atol=1e-14)
    scale = jnp.maximum(jnp.abs(g0).max(), 1e-30)
    np.testing.assert_allclose(g1 / scale, g0 / scale, atol=1e-13)


class TestChunkedVolume:
    def test_plain(self, monkeypatch):
        rif = bump_field(9, 1.0, amp=0.25)
        x, v = entry_rays(30, 9, 1.0, seed=11)  # 30 rays, chunk 8: padded

        def loss(r):
            xt, vt = tracer.trace_exact(r, x, v, 1.0, 0.5, 8)
            return jnp.sum(xt ** 2 + xt * vt)

        _compare(monkeypatch,
                 lambda r: tracer.trace_exact(r, x, v, 1.0, 0.5, 8),
                 loss, rif)

    def test_plane(self, monkeypatch):
        rif = bump_field(9, 1.0, amp=0.2)
        x, v = entry_rays(30, 9, 1.0, seed=13)
        po = jnp.tile(jnp.array([[0.0, 4.0, 0.0]]), (30, 1))
        pd = jnp.tile(jnp.array([[0.0, 1.0, 0.0]]), (30, 1))

        def loss(r):
            xt, vt, miss = tracer.trace_plane_exact(r, x, v, po, pd,
                                                    1.0, 0.25, 8)
            live = (~miss).astype(r.dtype)[:, None]
            return jnp.sum(live * (xt ** 2 + xt * vt))

        _compare(monkeypatch,
                 lambda r: tracer.trace_plane_exact(r, x, v, po, pd,
                                                    1.0, 0.25, 8)[:2],
                 loss, rif)

    def test_target(self, monkeypatch):
        rif = bump_field(9, 1.0, amp=0.25)
        x, v = entry_rays(30, 9, 1.0, seed=5)
        target = jnp.tile(jnp.array([[4.0, 9.0, 4.0]]), (30, 1))

        def loss(r):
            xt, vt, _ = tracer.trace_target_exact(r, x, v, target,
                                                  1.0, 0.25, 8)
            return jnp.sum(xt ** 2 + xt * vt)

        _compare(monkeypatch,
                 lambda r: tracer.trace_target_exact(r, x, v, target,
                                                     1.0, 0.25, 8)[:2],
                 loss, rif)

    def test_sdf(self, monkeypatch):
        res, h = 9, 1.0
        rif = bump_field(res, h, amp=0.25)
        idx = jnp.arange(res, dtype=jnp.float64) * h
        z, y, xg = jnp.meshgrid(idx, idx, idx, indexing="ij")
        c = (res - 1) * h / 2
        sdf = jnp.sqrt((xg - c) ** 2 + (y - c) ** 2 + (z - c) ** 2) - 3.0
        x, v = entry_rays(30, res, h, seed=7)
        x = x.at[:, 1].set(c)  # start inside the sphere interior
        x = x.at[:, 0].set(jnp.clip(x[:, 0], c - 2.0, c + 2.0))
        x = x.at[:, 2].set(jnp.clip(x[:, 2], c - 2.0, c + 2.0))

        def loss(r):
            xt, vt = tracer.trace_sdf_exact(r, sdf, x, v, h, 0.25, 8)
            return jnp.sum(xt ** 2 + xt * vt)

        _compare(monkeypatch,
                 lambda r: tracer.trace_sdf_exact(r, sdf, x, v, h, 0.25, 8),
                 loss, rif)

    def test_cable(self, monkeypatch):
        prof = 1.0 + 0.1 * jnp.linspace(1.0, 0.0, 9) ** 2
        n = 10
        key = jax.random.PRNGKey(2)
        xy = 0.3 * jax.random.normal(key, (n, 2))
        xc = jnp.stack([1.0 + xy[:, 0], jnp.full((n,), 0.01),
                        1.0 + xy[:, 1]], axis=-1)
        vc = jnp.tile(jnp.array([[0.0, 1.0, 0.0]]), (n, 1))
        tg = jnp.tile(jnp.array([[1.0, 3.5, 1.0]]), (n, 1))

        def loss(r):
            xt, vt, _ = tracer.trace_cable_exact(r, 1.0, 4.0, xc, vc, tg,
                                                 0.02, 16)
            return jnp.sum(xt ** 2 + xt * vt)

        _compare(monkeypatch,
                 lambda r: tracer.trace_cable_exact(r, 1.0, 4.0, xc, vc, tg,
                                                    0.02, 16)[:2],
                 loss, prof, chunk="4")


class TestNeverExitVtGrad:
    """ADVICE r4: never-exit rays return the untouched initial v0, so their
    vt cotangent must be zeroed — matching jax.grad through the unrolled
    forward (the reference's Back*TracerC propagates it; the exact variants
    deliberately do not inherit that approximation)."""

    def _trapped_case(self):
        rif = bump_field(9, 1.0, amp=0.25)
        x, v = entry_rays(6, 9, 1.0, seed=23)
        # two trapped rays: inside the volume with ~zero velocity, they
        # never exit within max_steps
        xt = jnp.array([[4.0, 4.0, 4.0], [4.2, 3.9, 4.1]])
        vt = jnp.array([[0.0, 1e-9, 0.0], [1e-9, 0.0, 0.0]])
        return rif, jnp.concatenate([x, xt]), jnp.concatenate([v, vt])

    def test_plain_vt_grad_matches_autodiff(self):
        rif, x, v = self._trapped_case()

        g1 = jax.grad(lambda r: jnp.sum(
            tracer.trace_exact(r, x, v, 1.0, 0.5, 8)[1] ** 2))(rif)
        g2 = jax.grad(lambda r: jnp.sum(
            tracer.trace_ad(r, x, v, 1.0, 0.5)[1] ** 2))(rif)
        scale = jnp.maximum(jnp.abs(g2).max(), 1e-30)
        np.testing.assert_allclose(g1 / scale, g2 / scale, atol=1e-13)

    def test_plane_vt_grad_matches_autodiff(self):
        rif, x, v = self._trapped_case()
        po = jnp.tile(jnp.array([[0.0, 9.0, 0.0]]), (x.shape[0], 1))
        pd = jnp.tile(jnp.array([[0.0, 1.0, 0.0]]), (x.shape[0], 1))

        g1 = jax.grad(lambda r: jnp.sum(
            tracer.trace_plane_exact(r, x, v, po, pd, 1.0, 0.5, 8)[1] ** 2
        ))(rif)
        g2 = jax.grad(lambda r: jnp.sum(
            tracer.trace_plane_ad(r, x, v, po, pd, 1.0, 0.5)[1] ** 2))(rif)
        scale = jnp.maximum(jnp.abs(g2).max(), 1e-30)
        np.testing.assert_allclose(g1 / scale, g2 / scale, atol=1e-13)


class TestPerRayBroadcast:
    """ADVICE r4: the documented (3,) / (1,3) per-ray vector shapes must
    actually work — in the forward AND under jax.grad (the bwd rules return
    zero cotangents shaped like the original arg)."""

    def test_plane_broadcast_shapes(self):
        rif = bump_field(9, 1.0, amp=0.2)
        x, v = entry_rays(6, 9, 1.0, seed=3)
        po3 = jnp.array([0.0, 4.0, 0.0])
        pd3 = jnp.array([0.0, 1.0, 0.0])
        ref = tracer.trace_plane(rif, x, v, jnp.broadcast_to(po3, x.shape),
                                 jnp.broadcast_to(pd3, x.shape), 1.0, 0.5)
        for po, pd in ((po3, pd3), (po3[None], pd3[None])):
            out = tracer.trace_plane(rif, x, v, po, pd, 1.0, 0.5)
            np.testing.assert_allclose(out[0], ref[0], atol=0)
            g = jax.grad(lambda r: jnp.sum(
                tracer.trace_plane(r, x, v, po, pd, 1.0, 0.5)[0] ** 2))(rif)
            assert bool(jnp.isfinite(g).all())
            # zero cotangent matches the ORIGINAL arg shape
            gp = jax.grad(lambda p: jnp.sum(
                tracer.trace_plane(rif, x, v, p, pd, 1.0, 0.5)[0] ** 2))(po)
            assert gp.shape == po.shape
            np.testing.assert_allclose(gp, 0.0, atol=0)

    def test_target_and_cable_broadcast(self):
        rif = bump_field(9, 1.0, amp=0.2)
        x, v = entry_rays(6, 9, 1.0, seed=5)
        t3 = jnp.array([4.0, 9.0, 4.0])
        ref = tracer.trace_target(rif, x, v, jnp.broadcast_to(t3, x.shape),
                                  1.0, 0.5)
        for tgt in (t3, t3[None]):
            out = tracer.trace_target(rif, x, v, tgt, 1.0, 0.5)
            np.testing.assert_allclose(out[0], ref[0], atol=0)
            g = jax.grad(lambda r: jnp.sum(
                tracer.trace_target(r, x, v, tgt, 1.0, 0.5)[0] ** 2))(rif)
            assert bool(jnp.isfinite(g).all())

        prof = 1.0 + 0.1 * jnp.linspace(1.0, 0.0, 9) ** 2
        xc = jnp.array([[1.3, 0.01, 1.0], [0.8, 0.01, 1.2]])
        vc = jnp.tile(jnp.array([[0.0, 1.0, 0.0]]), (2, 1))
        tg3 = jnp.array([1.0, 3.5, 1.0])
        ref = tracer.trace_cable(prof, 1.0, 4.0, xc, vc,
                                 jnp.broadcast_to(tg3, xc.shape), 0.02)
        for tg in (tg3, tg3[None]):
            out = tracer.trace_cable(prof, 1.0, 4.0, xc, vc, tg, 0.02)
            np.testing.assert_allclose(out[0], ref[0], atol=0)
            g = jax.grad(lambda r: jnp.sum(
                tracer.trace_cable(r, 1.0, 4.0, xc, vc, tg, 0.02)[0] ** 2
            ))(prof)
            assert bool(jnp.isfinite(g).all())

    def test_exact_variants_broadcast(self):
        rif = bump_field(9, 1.0, amp=0.2)
        x, v = entry_rays(6, 9, 1.0, seed=7)
        po3 = jnp.array([0.0, 4.0, 0.0])
        pd3 = jnp.array([0.0, 1.0, 0.0])
        g = jax.grad(lambda r: jnp.sum(tracer.trace_plane_exact(
            r, x, v, po3, pd3, 1.0, 0.5, 8)[0] ** 2))(rif)
        assert bool(jnp.isfinite(g).all())
        t3 = jnp.array([4.0, 9.0, 4.0])
        g = jax.grad(lambda r: jnp.sum(tracer.trace_target_exact(
            r, x, v, t3, 1.0, 0.5, 8)[0] ** 2))(rif)
        assert bool(jnp.isfinite(g).all())
