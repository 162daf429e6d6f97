"""Sequence-parallel conformer forward vs the dense single-device forward."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from omnilingual_asr_tpu.config import tiny_config
from omnilingual_asr_tpu.models.conformer import asr_forward, asr_init
from omnilingual_asr_tpu.parallel.sequence import sp_conformer_forward


def seq_mesh(n):
    return Mesh(np.asarray(jax.devices()[:n]), ("data",))


def setup(T=512):
    cfg = tiny_config()
    # f32 compute so the SP path compares exactly against the dense one
    cfg = cfg.replace(encoder=dataclasses.replace(cfg.encoder,
                                                  dtype="float32"))
    params = asr_init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((T, cfg.frontend.n_mels)),
                      jnp.float32)
    mask = jnp.ones((T,), bool)
    return cfg, params, mel, mask


class TestSequenceParallel:
    def test_matches_dense_forward(self):
        cfg, params, mel, mask = setup()
        want = np.asarray(asr_forward(params, mel[None], mask[None],
                                      cfg)["ctc_logits"][0])
        for n in (2, 4):
            mesh = seq_mesh(n)
            got = np.asarray(sp_conformer_forward(params, mel, mask, cfg,
                                                  mesh)["ctc_logits"])
            np.testing.assert_allclose(got, want, atol=5e-3, rtol=5e-3), n

    def test_eight_way(self):
        cfg, params, mel, mask = setup(T=1024)
        want = np.asarray(asr_forward(params, mel[None], mask[None],
                                      cfg)["ctc_logits"][0])
        mesh = seq_mesh(8)
        got = np.asarray(sp_conformer_forward(params, mel, mask, cfg,
                                              mesh)["ctc_logits"])
        np.testing.assert_allclose(got, want, atol=5e-3, rtol=5e-3)

    def test_ragged_tail(self):
        """Trailing padding frames (mask False) must not disturb valid
        outputs across shard boundaries."""
        cfg, params, mel, mask = setup(T=512)
        m = np.array(mask)
        m[400:] = False
        m = jnp.asarray(m)
        want = np.asarray(asr_forward(params, mel[None], m[None],
                                      cfg)["ctc_logits"][0])
        got = np.asarray(sp_conformer_forward(params, mel, m, cfg,
                                              seq_mesh(4))["ctc_logits"])
        nvalid = 400 // cfg.encoder.subsample_factor
        np.testing.assert_allclose(got[:nvalid], want[:nvalid],
                                   atol=5e-3, rtol=5e-3)
