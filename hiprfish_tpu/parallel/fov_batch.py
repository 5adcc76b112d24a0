"""FOV-batch data parallelism: the sharded replacement for Snakemake fan-out.

A batch of FOVs is stacked on a leading axis, sharded over the mesh's 'fov'
axis, and the fused per-FOV pipeline (pipeline/fused.fov_step) is vmapped
inside jit — one compiled program processes B FOVs across all chips; the
classifier reference matrix is replicated.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from hiprfish_tpu.config import SegmentationConfig
from hiprfish_tpu.pipeline import fused


def batched_fov_step(mesh, cfg: SegmentationConfig, max_cells: int,
                     clf_static, denoise: bool = True):
    """Compiled batched pipeline: stacks (B, H, W, C_l) per laser, sharded
    over 'fov'. Returns a function (stack_tuple, clf_arrays) -> FovResult
    with leading batch dims."""

    @functools.partial(jax.jit, static_argnums=())
    def run(stack, clf_arrays):
        step = lambda st: fused.fov_step(st, clf_arrays, cfg, max_cells,
                                         clf_static, denoise)
        return jax.vmap(step)(stack)

    def call(stack, clf_arrays):
        sharding = NamedSharding(mesh, P("fov"))
        stack = tuple(jax.device_put(s, sharding) for s in stack)
        clf_arrays = jax.device_put(
            clf_arrays, NamedSharding(mesh, P()))
        return run(stack, clf_arrays)

    return call


def train_check_heads_dp(mesh, x, y, init_params, steps: int, lr: float):
    """Data-parallel check-head training step: batch sharded over 'fov',
    gradients psum-reduced across the mesh — the framework's 'full training
    step' under real data parallelism."""
    import optax
    from jax.experimental.shard_map import shard_map
    from hiprfish_tpu.models.classifier import _mlp_logit

    tx = optax.adam(lr)

    def local_step(params, opt_state, xb, yb):
        def loss_fn(p):
            logit = _mlp_logit(p, xb)
            return jnp.mean(
                optax.sigmoid_binary_cross_entropy(logit, yb))

        g = jax.grad(loss_fn)(params)
        g = jax.lax.pmean(g, "fov")
        updates, opt_state = tx.update(g, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    sharded_step = shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P(), P("fov"), P("fov")),
        out_specs=(P(), P()),
        check_rep=False,
    )

    @jax.jit
    def train(params, x, y):
        opt_state = tx.init(params)

        def body(carry, _):
            p, s = carry
            p, s = sharded_step(p, s, x, y)
            return (p, s), None

        (params_out, _), _ = jax.lax.scan(body, (params, opt_state), None,
                                          length=steps)
        return params_out

    return train(init_params, jnp.asarray(x), jnp.asarray(y))
