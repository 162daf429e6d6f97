"""Pipeline parallelism vs sequential block application."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from omnilingual_asr_tpu.config import tiny_config
from omnilingual_asr_tpu.models.conformer import conformer_block_init
from omnilingual_asr_tpu.models.layers import rope_angles
from omnilingual_asr_tpu.parallel.pipeline import (
    apply_stacked_blocks,
    pipeline_forward,
    stack_blocks,
)


def setup(n_layers=4, B=2, T=64):
    cfg = tiny_config()
    enc = cfg.encoder
    key = jax.random.PRNGKey(0)
    blocks = [conformer_block_init(jax.random.fold_in(key, i), enc)
              for i in range(n_layers)]
    stacked = stack_blocks(blocks)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, enc.d_model)), jnp.float32)
    mask = jnp.ones((B, T), bool)
    cos, sin = rope_angles(T, enc.head_dim)
    return cfg, stacked, x, mask, cos, sin


def stage_mesh(n):
    return Mesh(np.asarray(jax.devices()[:n]), ("stage",))


class TestPipelineParallel:
    @pytest.mark.parametrize("S,M", [(2, 4), (4, 4), (4, 2)])
    def test_matches_sequential(self, S, M):
        cfg, stacked, x, mask, cos, sin = setup()
        dtype = jnp.dtype(cfg.encoder.dtype)
        want = np.asarray(apply_stacked_blocks(
            stacked, x, mask, cos, sin, cfg, dtype))

        x_mb = jnp.stack([x] * M)  # identical microbatches -> identical outs
        mesh = stage_mesh(S)
        got = np.asarray(pipeline_forward(stacked, x_mb, mask, cos, sin,
                                          cfg, mesh))
        for m in range(M):
            np.testing.assert_allclose(got[m], want, atol=2e-2, rtol=2e-2)

    def test_distinct_microbatches(self):
        cfg, stacked, x, mask, cos, sin = setup(B=1, T=64)
        dtype = jnp.dtype(cfg.encoder.dtype)
        rng = np.random.default_rng(1)
        M = 3
        x_mb = jnp.asarray(rng.standard_normal(
            (M, 1, 64, cfg.encoder.d_model)), jnp.float32)
        mesh = stage_mesh(2)
        got = np.asarray(pipeline_forward(stacked, x_mb, mask, cos, sin,
                                          cfg, mesh))
        for m in range(M):
            want = np.asarray(apply_stacked_blocks(
                stacked, x_mb[m], mask, cos, sin, cfg, dtype))
            np.testing.assert_allclose(got[m], want, atol=2e-2, rtol=2e-2)

    def test_single_stage_noop_axis(self):
        """S=1: the pipeline axis degenerates to sequential execution."""
        cfg, stacked, x, mask, cos, sin = setup(n_layers=2)
        dtype = jnp.dtype(cfg.encoder.dtype)
        want = np.asarray(apply_stacked_blocks(
            stacked, x, mask, cos, sin, cfg, dtype))
        mesh = stage_mesh(1)
        got = np.asarray(pipeline_forward(stacked, x[None], mask, cos, sin,
                                          cfg, mesh))[0]
        np.testing.assert_allclose(got, want, atol=1e-5)
