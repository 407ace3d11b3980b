"""Ahead-of-time model export for serving (`jax.export` / StableHLO).

The reference has no deployment story beyond "load the torch checkpoint
into the Python class" (models/utils/common.py, evaluate.py). For a
production TPU serving path we export the jitted eval-mode forward as a
portable, versioned StableHLO artifact:

- `export_forward` serializes `model.apply({"params", "batch_stats"},
  points, train=False)` as a function of (variables, points) — weights
  are NOT baked in, so the artifact is a few hundred KB and pairs with
  any checkpoint of the same architecture (shape-checked at call time
  by jax.export).
- `load_forward` deserializes it into a callable that runs under jit on
  whatever backend executes it, with no pointseg (or flax) import
  needed at serving time — only jax.

Notes:
- The traced compute path is frozen at export time, including the
  Pallas-vs-oracle dispatch (pointseg.ops.dispatch): export on a TPU
  host (or with POINTSEG_PALLAS=1) to bake the TPU kernels; the oracle
  path exports everywhere and runs on any platform.
- Static shapes only, matching the framework's eval contract (bucketed
  pads); export one artifact per serving bucket.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import export as jax_export


def _shape_structs(tree):
    return jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)), tree
    )


def export_forward(
    model,
    variables,
    example_points: jax.Array,
    platforms: tuple[str, ...] | None = None,
) -> bytes:
    """Serialize the eval-mode forward to portable StableHLO bytes.

    Args:
        model: a pointseg flax model (raw-logits contract, (B,N,F) in →
            (B,N,C) out).
        variables: {"params": ..., "batch_stats": ...} matching the
            model — used only for shapes/dtypes; weights are runtime
            arguments of the exported function.
        example_points: array or ShapeDtypeStruct fixing the serving
            shape (B, N, F).
        platforms: lowering platforms, e.g. ("tpu",) or ("cpu", "tpu").
            None = the current default backend only.
    """
    def fwd(variables, points):
        return model.apply(variables, points, train=False)

    fn = jax.jit(fwd)
    args = (_shape_structs(variables),
            jax.ShapeDtypeStruct(jnp.shape(example_points),
                                 jnp.result_type(example_points)))
    if platforms is None:
        exported = jax_export.export(fn)(*args)
    else:
        exported = jax_export.export(fn, platforms=list(platforms))(*args)
    return exported.serialize()


def load_forward(blob: bytes):
    """Deserialize `export_forward` bytes into `f(variables, points) ->
    logits`. Serving-time dependencies: jax only."""
    exported = jax_export.deserialize(blob)
    return exported.call
