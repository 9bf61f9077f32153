"""adjointnonlinearraytracing_tpu — TPU-native differentiable nonlinear ray tracing.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
ArjunTeh/AdjointNonlinearRayTracing reference (differentiable eikonal ray
tracing through refractive-index fields, constant-memory adjoint gradients,
sensor splatting, multi-resolution inverse-design optimization), re-designed
for TPU hardware: batched SPMD ray tracing over device meshes and
XLA-compiled steppers in a gather-cost-aware cell-table formulation
(pallas/README.md documents why the hot paths are pure XLA on current
Mosaic and what would unlock fused kernels).

Layout (see SURVEY.md for the reference layer map this covers):
  fields/      voxel + cylinder refractive-index fields (eval/grad/hess/splat)
  tracer/      eikonal integrator variants + constant-memory adjoint (custom_vjp)
  sources/     ray-bundle generators (plane/point/cone/area, multi-view rigs)
  sensors/     plane propagation + splatting sensors (near/far/plenoptic)
  opt/         multires Adam loop with optimizer-state upsampling, checkpoints
  parallel/    mesh construction, ray-sharded trace/grad via shard_map + psum
  experiments/ the five inverse-design drivers + YAML config loader
  pathmatrix/  classical linear-tomography baseline (scipy)
  pallas/      TPU kernel notes / future fused kernels (see its README)
"""

__version__ = "0.1.0"

from . import fields, tracer  # noqa: F401
