"""The const-free AOT adapter (utils/aot.py) — regression tests for this
JAX build's closure-constant dispatch bug."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pointcloud_render_tpu.utils import aot


def test_interleaved_similar_programs_keep_their_constants():
    # The failure mode: two structurally identical programs with different
    # constants, executed alternately — the buggy paths lose or mix the
    # constant buffers ("Execution supplied N buffers...").
    def make(c):
        const = np.full((512,), c, np.float32)
        return aot.compile_const_free(
            lambda x: (x * jnp.asarray(const)).sum(), jnp.ones((512,)))

    f1, f2 = make(1.0), make(2.0)
    x = jnp.ones((512,), jnp.float32)
    for _ in range(3):
        assert float(f1(x)) == 512.0
        assert float(f2(x)) == 1024.0


def test_pytree_args_and_outputs():
    def fn(d):
        return {"sum": d["a"] + d["b"], "prod": d["a"] * d["b"]}

    args = ({"a": jnp.ones((4,)), "b": jnp.full((4,), 3.0)},)
    c = aot.compile_const_free(fn, *args)
    out = c(*args)
    np.testing.assert_allclose(np.asarray(out["sum"]), 4.0)
    np.testing.assert_allclose(np.asarray(out["prod"]), 3.0)


def test_structure_mismatch_raises():
    c = aot.compile_const_free(lambda x, y: x + y, jnp.ones((2,)),
                               jnp.ones((2,)))
    with pytest.raises(TypeError):
        c(jnp.ones((2,)))
