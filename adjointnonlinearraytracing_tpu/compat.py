"""Reference-style API compatibility layer.

Users coming from the reference torch code (core/grid.py's ``Grid``,
core/cable.py's ``Cable``, core/tracer.py's ``*TracerC.apply``) can use these
thin object wrappers over the functional JAX core.  They carry state
immutably (methods that mutate in torch return ``self`` with updated arrays
here, and also update the held reference for drop-in ergonomics).

The tracer aliases map the reference's autograd classes onto the API:

=====================  ==========================================
reference              this framework
=====================  ==========================================
BackTracerC.apply      tracer.trace            (adjoint gradient)
ADTracerC.apply        tracer.trace_ad         (autodiff gradient)
BackPlaneTracerC       tracer.trace_plane
BackTargetTracerC      tracer.trace_target
BackSDFTracerC         tracer.trace_sdf
BackCableTracerC       tracer.trace_cable
=====================  ==========================================
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .fields import cylinder as C
from .fields import rbf
from .tracer import (trace, trace_ad, trace_cable, trace_cable_ad,  # noqa: F401
                     trace_plane, trace_plane_ad, trace_sdf, trace_sdf_ad,
                     trace_target)

# reference-class-name aliases (apply-style call signatures)
ADTracerC = trace_ad
ADPlaneTracerC = trace_plane_ad
ADSDFTracerC = trace_sdf_ad
ADCableTracerC = trace_cable_ad
BackTracerC = trace
BackPlaneTracerC = trace_plane
BackTargetTracerC = trace_target
BackSDFTracerC = trace_sdf
BackCableTracerC = trace_cable


class Grid:
    """Object wrapper over fields.rbf (reference core/grid.py ``Grid``)."""

    def __init__(self, scene, h, hinv=None):
        self._g = rbf.RbfGrid(jnp.asarray(scene),
                              jnp.zeros_like(jnp.asarray(scene)), h)
        self.h = h
        self.hinv = hinv

    # -- state views ------------------------------------------------------
    @property
    def scene(self):
        return self._g.scene

    @property
    def weights(self):
        return self._g.weights

    @property
    def res(self):
        return self._g.scene.shape

    def render(self):
        return self._g.render()

    def RenderGradient(self, linear=False):
        return rbf.render_gradient(self._g, linear=linear)

    # -- queries ----------------------------------------------------------
    def Get(self, x, sigmoid=False, cubic=False):
        return rbf.get(self._g, x, sigmoid=sigmoid, cubic=cubic)

    def GetLinear(self, x):
        return rbf.get_linear(self._g, x)

    def GetSpline(self, x):
        return rbf.get_spline(self._g, x)

    def GetHessian(self, x):
        return rbf.get_hessian(self._g, x)

    # -- splats (mutate the held grid, like the torch original) ----------
    def Splat(self, x, f, average=True, mask=None):
        self._g = rbf.splat(self._g, x, f, average=average, mask=mask)
        return self

    def SplatGrad(self, x, f, fx):
        self._g = rbf.splat_grad(self._g, x, f, fx)
        return self

    def SplatLinear(self, x, f, fx, mask=None):
        self._g = rbf.splat_linear(self._g, x, f, fx, mask=mask)
        return self

    def SolveGrad(self, x, f, fx):
        self._g = rbf.solve_grad(self._g, x, f, fx)
        return self


class Cable:
    """Object wrapper over fields.cylinder (reference core/cable.py)."""

    def __init__(self, rif, radius, length=None):
        if length is None:
            length = radius
        self._f = C.CylinderField(jnp.asarray(rif), radius, length)

    @property
    def rif(self):
        return self._f.data

    @property
    def radius(self):
        return self._f.radius

    @property
    def length(self):
        return self._f.length

    @property
    def h(self):
        return self._f.h

    def GetLinear(self, x):
        return C.cyl_eval_grad(self._f, x)

    def render(self, res):
        return C.cyl_render(self._f, res)

    def render2(self, res):
        return C.cyl_render2(self._f, res)

    def RenderGradient(self):
        axes = [self._f.h * jnp.arange(self._f.data.shape[0])]
        z = jnp.stack([axes[0]], axis=-1)
        # radial positions along +x from the axis
        pos = jnp.stack([self._f.radius + z[:, 0],
                         jnp.zeros_like(z[:, 0]),
                         jnp.full_like(z[:, 0], self._f.radius)], axis=-1)
        _, fx = C.cyl_eval_grad(self._f, pos)
        return fx


def upres_volume(n, new_res):
    from .fields.grid import upres_volume as _up

    return _up(n, new_res)
