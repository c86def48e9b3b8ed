"""utils/fetch.device_get_tree: packed device->host fetch correctness.

The packing must round-trip arbitrary pytrees exactly (mixed dtypes,
shapes, scalars, bools) — a mistake in the group/offset bookkeeping would
silently scramble training results fetched through it (train/cv.py and
train/fold_parallel.py fetch everything through this path since r3).
"""
import jax
import jax.numpy as jnp
import numpy as np

from iggcn_tpu.utils.fetch import device_get_tree


def test_packed_fetch_round_trips_mixed_tree():
    rng = np.random.default_rng(0)
    tree = {
        "f32": jnp.asarray(rng.normal(size=(3, 5)).astype(np.float32)),
        "nested": {
            "i32": jnp.asarray(rng.integers(-9, 9, (7,)).astype(np.int32)),
            "more_f32": jnp.asarray(rng.normal(size=(2, 2, 2))
                                    .astype(np.float32)),
        },
        "scalar": jnp.float32(3.25),
        "bools": jnp.asarray(np.array([True, False, True])),
        "tuple": (jnp.arange(4, dtype=jnp.int32),
                  jnp.asarray(rng.normal(size=(1,)).astype(np.float32))),
    }
    expected = jax.device_get(tree)
    got = device_get_tree(tree)
    flat_e, td_e = jax.tree_util.tree_flatten(expected)
    flat_g, td_g = jax.tree_util.tree_flatten(got)
    assert td_e == td_g
    for e, g in zip(flat_e, flat_g):
        assert e.dtype == g.dtype
        assert e.shape == np.shape(g)
        np.testing.assert_array_equal(e, g)


def test_packed_fetch_cache_reuse_and_distinct_structures():
    from iggcn_tpu.utils import fetch as F

    t1 = {"a": jnp.ones((4,)), "b": jnp.zeros((2, 3))}
    t2 = {"a": jnp.ones((5,)), "b": jnp.zeros((2, 3))}  # different shapes
    before = len(F._PACK_CACHE)
    _ = device_get_tree(t1)
    _ = device_get_tree(t1)           # same structure: cache hit
    _ = device_get_tree(t2)           # new shapes: new entry
    assert len(F._PACK_CACHE) == before + 2
    np.testing.assert_array_equal(device_get_tree(t2)["a"], np.ones((5,)))


def test_mixed_host_tree_falls_back():
    tree = {"host": np.arange(3), "dev": jnp.arange(3)}
    out = device_get_tree(tree)
    np.testing.assert_array_equal(out["host"], np.arange(3))
    np.testing.assert_array_equal(out["dev"], np.arange(3))
    assert device_get_tree({}) == {}


def test_packed_fetch_of_mesh_sharded_leaves():
    """fold_parallel fetches results whose leaves are sharded over the
    (fold, data) mesh; the packing jit must gather them without a mesh
    context and round-trip exactly (incl. a bf16 leaf, the serving dtype)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from iggcn_tpu.train.fold_parallel import fold_mesh

    mesh = fold_mesh(4)
    rng = np.random.default_rng(1)
    host = {
        "fold_metrics": rng.normal(size=(4, 6, 5)).astype(np.float32),
        "fold_ints": rng.integers(0, 9, (4, 16)).astype(np.int32),
        "bf16": jnp.asarray(rng.normal(size=(4, 8)), jnp.bfloat16),
    }
    spec = NamedSharding(mesh, P(mesh.axis_names[0]))
    tree = {k: jax.device_put(jnp.asarray(v), spec) for k, v in host.items()}
    got = device_get_tree(tree)
    for k in host:
        np.testing.assert_array_equal(np.asarray(got[k]),
                                      np.asarray(jax.device_get(tree[k])))


