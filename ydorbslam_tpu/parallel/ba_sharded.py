"""Observation-sharded optimization steps over a device mesh.

The reference has NO distributed backend — its concurrency is 4-5 POSIX
threads over a mutex-guarded shared map (SURVEY.md §2c).  This module is
the TPU-native replacement: observations (the dominant axis of BA work)
are sharded over a ``jax.sharding.Mesh`` axis, each device accumulates
its block of the normal equations, and the reduced system is
``psum``-combined over ICI and solved replicated.  The same pattern
scales the Schur-complement local/global BA (optim/schur.py) to
multi-host meshes: camera blocks replicate, landmark blocks stay
device-local, only the (small) reduced camera system crosses the
interconnect.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..geometry.camera import CameraIntrinsics
from ..geometry.se3 import se3_exp
from ..optim.residuals import batched_residual_and_jacobians, observation_weights


def sharded_pose_step(
    mesh: Mesh,
    cam: CameraIntrinsics,
    T_cw: jax.Array,
    p_w: jax.Array,
    obs_uvr: jax.Array,
    inv_sigma2: jax.Array,
    valid: jax.Array,
) -> jax.Array:
    """One Gauss-Newton pose step with observations sharded over 'obs'.

    Each device computes J/r for its observation shard and the 6x6
    H = sum J^T W J, b = sum J^T W r partial sums; psum over the mesh
    axis reduces them; the solve is replicated (6x6 — cheaper to
    recompute everywhere than to broadcast).
    """
    axis = mesh.axis_names[0]

    def step(T, p, o, s2, v):
        r, J, _, depth = batched_residual_and_jacobians(cam, T, p, o)
        w = observation_weights(o[:, 2] > -1e8, s2)  # all rows stereo-capable
        m = (v & (depth > 1e-3)).astype(jnp.float32)[:, None]
        H = jax.lax.psum(jnp.einsum("nci,nc,ncj->ij", J, w * m, J), axis)
        b = jax.lax.psum(jnp.einsum("nci,nc,nc->i", J, w * m, r), axis)
        dx = -jnp.linalg.solve(H + 1e-6 * jnp.eye(6), b)
        return se3_exp(dx) @ T

    shard = P(axis)
    repl = P()
    fn = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(repl, shard, shard, shard, shard),
        out_specs=repl,
    )
    return jax.jit(fn)(T_cw, p_w, obs_uvr, inv_sigma2, valid)
