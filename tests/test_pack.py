"""Packed single-buffer D2H wire (ops/pack.py): bitcast round-trip must be
exact for every dtype the engine ships."""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from omnilingual_asr_tpu.ops.pack import layout_of, pack_tree, unpack_buffer


def _tree():
    rng = np.random.default_rng(0)
    return {
        "ctc_ids": jnp.asarray(rng.integers(0, 512, (2, 8)), jnp.int16),
        "lid_conf": jnp.asarray(rng.random((2, 8)), jnp.float16),
        "speaker_frames_q": jnp.asarray(
            rng.integers(-127, 128, (2, 8, 4)), jnp.int8),
        "mask": jnp.asarray(rng.random((2, 8)) > 0.5),
        "logp": jnp.asarray(rng.standard_normal((2, 8, 3)), jnp.float32),
    }


def test_round_trip_exact():
    tree = _tree()
    buf = np.asarray(pack_tree(tree))
    assert buf.dtype == np.uint8
    spec = jax.eval_shape(lambda: tree)
    out = unpack_buffer(buf, layout_of(spec))
    assert set(out) == set(tree)
    for k in tree:
        np.testing.assert_array_equal(out[k], np.asarray(tree[k]))
        assert out[k].dtype == np.asarray(tree[k]).dtype


def test_layout_matches_pack_order_and_sizes():
    tree = _tree()
    layout = layout_of(jax.eval_shape(lambda: tree))
    assert [name for name, *_ in layout] == sorted(tree)
    total = sum(nb for *_, nb in layout)
    assert total == int(np.asarray(pack_tree(tree)).size)
    # offsets are contiguous
    off = 0
    for _, _, _, o, nb in layout:
        assert o == off
        off += nb


def test_pack_inside_jit():
    tree = _tree()
    packed = jax.jit(pack_tree)(tree)
    out = unpack_buffer(np.asarray(packed),
                        layout_of(jax.eval_shape(lambda: tree)))
    np.testing.assert_array_equal(out["logp"], np.asarray(tree["logp"]))
