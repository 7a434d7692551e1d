"""Multi-chip sharding over the virtual 8-device CPU mesh.

Reference parity note (SURVEY.md §2.3): the reference is single-device; the
TPU-native extension is jax.sharding over a Mesh with XLA collectives. These
tests validate that the dp x tp sharded training step compiles + executes and
that parameters stay sharded (the driver's dryrun_multichip covers the same
path from the outside)."""

import jax
import numpy as np
import pytest

from runmat_tpu.parallel.mesh import (make_mesh, mlp_shardings, shard_params,
                                      sharded_train_step)
from runmat_tpu.dl.mlp import adam_init, init_mlp, mlp_forward


needs8 = pytest.mark.skipif(len(jax.devices()) < 8,
                            reason="needs 8 virtual devices")


@needs8
def test_mesh_factorization():
    mesh = make_mesh(8)
    assert mesh.devices.shape == (2, 4)
    assert mesh.axis_names == ("data", "model")
    mesh2 = make_mesh(8, dp=4, tp=2)
    assert mesh2.devices.shape == (4, 2)


@needs8
def test_sharded_train_step_runs_and_updates():
    mesh = make_mesh(8)
    tp = mesh.devices.shape[1]
    sizes = [16, 32 * tp, 32 * tp, 8]
    n_layers = len(sizes) - 1
    step_fn, param_sh, batch_sh = sharded_train_step(mesh, n_layers)
    params = shard_params(init_mlp(0, sizes), param_sh)
    m, v = adam_init(params)
    rng = np.random.default_rng(0)
    x = jax.device_put(rng.standard_normal((8, sizes[0]), dtype=np.float32),
                       batch_sh)
    y = jax.device_put(rng.standard_normal((8, sizes[-1]), dtype=np.float32),
                       batch_sh)
    import jax.numpy as jnp
    w_before = np.asarray(params[0][0])
    new_params, _opt, _step = step_fn(params, (m, v), x, y,
                                      jnp.zeros((), jnp.int32))
    jax.block_until_ready(new_params)
    w_after = np.asarray(new_params[0][0])
    assert not np.allclose(w_before, w_after)      # params moved
    # first-layer weight stays sharded on 'model': tp distinct column blocks
    # (replicated over dp, so every device holds a shard)
    col_starts = {s.index[1].start or 0
                  for s in new_params[0][0].addressable_shards}
    assert len(col_starts) == tp


@needs8
def test_sharded_forward_matches_single_device():
    mesh = make_mesh(8)
    tp = mesh.devices.shape[1]
    sizes = [8, 16 * tp, 4]
    params = init_mlp(1, sizes)
    x = np.random.default_rng(1).standard_normal((4, sizes[0]),
                                                 dtype=np.float32)
    ref = np.asarray(mlp_forward(params, x))
    param_sh, batch_sh = mlp_shardings(mesh, len(sizes) - 1)
    sharded = shard_params(params, param_sh)
    xs = jax.device_put(x, batch_sh)
    out = np.asarray(jax.jit(mlp_forward)(sharded, xs))
    assert np.allclose(out, ref, atol=1e-5)
