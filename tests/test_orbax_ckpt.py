"""Orbax checkpoint backend: async sharded save/restore round-trip on the
virtual 8-device CPU mesh (multi-host analog of reference torch.save ckpts)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from yolov6_tpu.utils.orbax_ckpt import (
    OrbaxCheckpointer,
    abstract_target_like,
    is_orbax_checkpoint,
)


@pytest.fixture
def state():
    return {
        "params": {"w": jnp.arange(16, dtype=jnp.float32).reshape(4, 4),
                   "b": jnp.ones((8,), jnp.bfloat16)},
        "step": jnp.int32(7),
    }


def test_roundtrip_async(tmp_path, state):
    ck = OrbaxCheckpointer(str(tmp_path / "ckpts"), async_save=True)
    ck.save(0, state, metrics={"ap": 0.1})
    ck.save(1, state, metrics={"ap": 0.3})
    ck.wait_until_finished()
    assert ck.latest_step() == 1
    assert ck.best_step() == 1
    out = ck.restore()
    np.testing.assert_array_equal(out["params"]["w"], np.asarray(state["params"]["w"]))
    assert out["params"]["b"].dtype == jnp.bfloat16
    assert int(out["step"]) == 7
    ck.close()
    assert is_orbax_checkpoint(str(tmp_path / "ckpts"))
    assert not is_orbax_checkpoint(str(tmp_path))


def test_sharded_roundtrip(tmp_path, state):
    devs = jax.devices()
    mesh = Mesh(np.array(devs), ("data",))
    sharded = jax.device_put(
        jnp.arange(64, dtype=jnp.float32).reshape(8, 8),
        NamedSharding(mesh, PartitionSpec("data", None)),
    )
    tree = dict(state, sharded=sharded)
    ck = OrbaxCheckpointer(str(tmp_path / "ckpts"), async_save=True)
    ck.save(0, tree, metrics={"ap": 0.5})
    ck.wait_until_finished()

    # restore with sharding-annotated abstract target: arrays come back
    # placed on the mesh, not as host numpy
    target = abstract_target_like(tree, mesh=None)
    target["sharded"] = jax.ShapeDtypeStruct(
        (8, 8), jnp.float32, sharding=NamedSharding(mesh, PartitionSpec("data", None))
    )
    out = ck.restore(0, target=target)
    assert out["sharded"].sharding == NamedSharding(mesh, PartitionSpec("data", None))
    np.testing.assert_array_equal(np.asarray(out["sharded"]), np.asarray(sharded))
    ck.close()


def test_max_to_keep_prunes_but_keeps_best(tmp_path, state):
    ck = OrbaxCheckpointer(str(tmp_path / "c"), max_to_keep=2, async_save=False)
    for i, ap in enumerate([0.9, 0.2, 0.3, 0.4]):
        ck.save(i, state, metrics={"ap": ap})
    ck.wait_until_finished()
    steps = set(ck.manager.all_steps())
    assert ck.best_step() == 0
    assert 0 in steps  # best survives pruning
    assert 3 in steps  # latest survives
    ck.close()
